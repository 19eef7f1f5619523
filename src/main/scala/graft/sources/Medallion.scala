package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.util.concurrent.ConcurrentHashMap
import graft.models.RealEstate

/** Durable bronze/silver/gold medallion catalog (SURVEY §2.8).
  *
  * The reference routes every dbt model into a named database —
  * `bronze`/`silver`/`gold` — via the schema-routing macro
  * (dbt/dbt_project.yml:20-23, dbt/macros/generate_schema_name.sql:11-18)
  * and registers bronze loads as catalog tables over an explicit
  * warehouse location (scripts/load_bronze_to_table.py:99-108,
  * scripts/normalize_bronze_columns.py:156-169 `CREATE TABLE IF NOT
  * EXISTS … LOCATION`). This object is that surface Spark-first:
  *
  *   - [[ensureMaterialized]] builds the model chain ONCE per
  *     (session, scale factor) and writes each layer as an EXTERNAL
  *     parquet table under a per-SF warehouse root, so
  *     `spark.table("gold.fct_properties")` works for any reader.
  *   - [[register]] re-attaches the catalog entries of an existing
  *     warehouse in a fresh session WITHOUT recomputing — the durable
  *     half (the reference's CREATE TABLE IF NOT EXISTS … LOCATION).
  *
  * Scale shape: gold.fct_properties is PARTITIONED BY date_key — the
  * 100 TB layout (readers of one day prune everything else); dims are
  * single-digit-MB even at scale and stay unpartitioned. Each layer is
  * read back from its table for the next layer's build, so the
  * expression-dense silver transform runs exactly once per
  * materialization, not once per downstream model.
  *
  * CATALOG-DURABILITY SCOPE (differs from the reference): the
  * reference's catalog is a SHARED Hive metastore service
  * (docker-compose.yml `hive-metastore` + Postgres backing DB), so
  * table entries are visible to every engine and survive every
  * process. Here the metastore is Spark's default embedded Derby —
  * PER-PROCESS and in-session only. What IS durable is the data plus
  * layout: every table is EXTERNAL parquet under [[warehouseRoot]],
  * and a fresh session recovers the full catalog with [[register]]
  * (the `CREATE TABLE IF NOT EXISTS … LOCATION` replay) without
  * recomputing anything. Pointing multiple concurrent processes or
  * non-Spark engines at one live catalog requires a real shared
  * metastore (Hive behind `spark.sql.catalogImplementation=hive`) —
  * deliberately out of scope for this library's single-process
  * harness; do not mistake the in-session catalog for one.
  */
object Medallion {

  val databases: Seq[String] = Seq("bronze", "silver", "gold")

  /** External-table warehouse root, per scale factor. */
  def warehouseRoot(sfDir: String): String =
    "/tmp/graft_warehouse/" + sfDir.replaceAll("[^A-Za-z0-9.]+", "_")

  private def loc(sfDir: String, db: String, table: String): String =
    s"${warehouseRoot(sfDir)}/$db.db/$table"

  /** (db, table, partitioned-by-date_key) in build order. */
  val tables: Seq[(String, String, Boolean)] = Seq(
    ("bronze", "raw_listings", false),
    ("silver", "stg_properties", false),
    ("gold", "dim_locations", false),
    ("gold", "dim_legal_status", false),
    ("gold", "dim_properties", false),
    ("gold", "fct_properties", true),
    ("gold", "fct_daily_summary", false),
    ("gold", "fct_data_quality_report", false))

  // One materialized SF per session; switching SF re-materializes
  // (table names are global in the session catalog).
  private val materializedSf = new ConcurrentHashMap[String, String]()

  /** Build + register the whole chain once per (session, sfDir).
    * Subsequent calls are a map lookup. */
  def ensureMaterialized(spark: SparkSession, sfDir: String): Unit = {
    val appId = spark.sparkContext.applicationId
    if (materializedSf.get(appId) == sfDir) return
    synchronized {
      if (materializedSf.get(appId) == sfDir) return
      databases.foreach(db => spark.sql(s"CREATE DATABASE IF NOT EXISTS $db"))

      def write(db: String, table: String, df: DataFrame,
                partitionCols: Seq[String] = Nil): Unit = {
        // Overwriting an external table whose catalog entry survived a
        // prior run with a different SF would keep the OLD location;
        // drop first so `path` always wins (data files are untouched by
        // DROP on external tables, then rewritten by the save).
        spark.sql(s"DROP TABLE IF EXISTS $db.$table")
        // Cluster rows by partition key before a partitioned write:
        // otherwise EVERY write task emits a file into EVERY partition
        // directory (tasks × partitions tiny files — 19k files at
        // sf0.1). After the repartition each date lands wholly in one
        // task → one file per partition, the compact 100 TB layout.
        val clustered =
          if (partitionCols.nonEmpty) df.repartition(partitionCols.map(col): _*) else df
        val w = clustered.write.mode("overwrite").format("parquet")
          .option("path", loc(sfDir, db, table))
        (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
          .saveAsTable(s"$db.$table")
      }

      write("bronze", "raw_listings", RealEstate.rawListings(
        Tables.load(spark, sfDir, "orders"), Tables.load(spark, sfDir, "customer"),
        Tables.load(spark, sfDir, "nation"), Tables.load(spark, sfDir, "region")))

      write("silver", "stg_properties",
        RealEstate.silver(Tables.scaled(spark.table("bronze.raw_listings"))))

      val silver = spark.table("silver.stg_properties")
      write("gold", "dim_locations", RealEstate.dimLocations(silver))
      write("gold", "dim_legal_status", RealEstate.dimLegalStatus(silver))
      write("gold", "dim_properties", RealEstate.dimProperties(silver))
      write("gold", "fct_properties",
        RealEstate.fctProperties(silver,
          spark.table("gold.dim_locations"), spark.table("gold.dim_legal_status")),
        partitionCols = Seq("date_key"))
      write("gold", "fct_daily_summary",
        RealEstate.fctDailySummary(spark.table("gold.fct_properties")))
      write("gold", "fct_data_quality_report",
        RealEstate.dataQualityReport(silver))

      materializedSf.put(appId, sfDir)
    }
  }

  /** Re-attach an existing warehouse's tables in a (possibly fresh)
    * session without recomputing anything — the reference's
    * `CREATE TABLE IF NOT EXISTS … USING … LOCATION` re-registration
    * (normalize_bronze_columns.py:156-169). Partitioned tables get
    * their partitions recovered from the directory layout. */
  def register(spark: SparkSession, sfDir: String): Unit = {
    databases.foreach(db => spark.sql(s"CREATE DATABASE IF NOT EXISTS $db"))
    tables.foreach { case (db, table, partitioned) =>
      val expected = loc(sfDir, db, table)
      // CREATE TABLE IF NOT EXISTS silently keeps a pre-existing
      // entry's location — if the session's catalog already points at
      // ANOTHER SF's warehouse, it would serve wrong-SF data with no
      // error. Compare locations and drop/recreate on mismatch
      // (external DROP never touches data files). (ADVICE r3)
      if (spark.catalog.tableExists(s"$db.$table")) {
        val current = scala.util.Try {
          spark.sessionState.catalog
            .getTableMetadata(
              org.apache.spark.sql.catalyst.TableIdentifier(table, Some(db)))
            .location.getPath
        }.getOrElse("")
        val same = current.nonEmpty &&
          new org.apache.hadoop.fs.Path(current).toString ==
            new org.apache.hadoop.fs.Path(expected).toString
        if (!same) spark.sql(s"DROP TABLE IF EXISTS $db.$table")
      }
      spark.sql(s"""CREATE TABLE IF NOT EXISTS $db.$table
                    USING PARQUET LOCATION '$expected'""")
      if (partitioned) spark.sql(s"MSCK REPAIR TABLE $db.$table")
      spark.sql(s"REFRESH TABLE $db.$table")
    }
  }
}
