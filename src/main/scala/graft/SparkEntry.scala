package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{RegistryCore, RegistryExtra, RegistryGold, RegistryIngest, RegistryLlm, RegistryMaint, RegistryMaintDml, RegistryMaintSchema, RegistryMaintStream, RegistryTx}
import graft.sources.Tables
import graft.models.RealEstate

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator family from SURVEY §2 (plus the LLM-pipeline
  * extensions) is a named entry in [[queries]]; every entry with
  * engine-portable semantics has a DuckDB oracle in [[oracleSql]]
  * with IDENTICAL column names (the driver hash-compares after
  * sorting columns by name). Entries without an oracle get the
  * driver's weaker rows-only check, by design — only where the output
  * is an engine-private hash DuckDB cannot recompute:
  * f5_hash_mod_key (Murmur3/xxhash64 keys are the point of the query)
  * and a5_approx_distinct (HLL++ sketch estimates).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The SURVEY §7.3 end-to-end slice: raw synthesis → silver
    * cleaning → outlier filters → dedup → star joins → fact. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val silver = RealEstate.silver(RealEstate.rawListings(
      Tables.load(spark, dir, "orders"), Tables.load(spark, dir, "customer"),
      Tables.load(spark, dir, "nation"), Tables.load(spark, dir, "region")))
    RealEstate.fctProperties(silver,
      RealEstate.dimLocations(silver), RealEstate.dimLegalStatus(silver))
  }

  /** Idempotent one-time ETL setup (durable medallion warehouse +
    * bucketed join tables). Benchmarks call this in warm-up so query
    * timings measure queries, not setup writes; every query is still
    * self-sufficient and ensures what it needs on first touch. */
  def prepare(spark: SparkSession, sfDir: String): Unit = {
    graft.sources.Medallion.ensureMaterialized(spark, sfDir)
    RegistryCore.prepareBucketed(spark, sfDir)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RegistryCore.defs ++ RegistryIngest.defs ++ RegistryGold.defs ++
      RegistryLlm.defs ++ RegistryExtra.defs ++ RegistryMaint.defs ++
      RegistryMaintDml.defs ++ RegistryMaintSchema.defs ++
      RegistryMaintStream.defs ++ RegistryTx.allDefs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RegistryCore.oracles ++ RegistryIngest.oracles ++ RegistryGold.oracles ++
      RegistryLlm.oracles ++ RegistryExtra.oracles ++ RegistryMaint.oracles ++
      RegistryMaintDml.oracles ++ RegistryMaintSchema.oracles ++
      RegistryMaintStream.oracles ++ RegistryTx.oracles
}
