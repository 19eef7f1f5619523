package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Layout, TextAnalysis}
import graft.sources.{Ingest, Tables}

/** Lakehouse maintenance & data-management verbs: Z-order layout
  * rewrite, partition-pruned targeted delete (the GDPR erasure path),
  * runtime bloom-filter join pruning, and deterministic stratified
  * corpus sampling. These are the operations that keep a 100 TB table
  * healthy over years — the reference delegates them to Delta
  * (SURVEY §2.11); here they are first-class on plain parquet.
  */
object RegistryMaint {
  private type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Box predicate shared by the z-order query and its oracle — inside
    * every SF's key range (sf0.001 tops out at orderkey 1499 / partkey
    * 199) and a vanishing fraction of the plane at sf0.1, which is
    * what makes the file-skipping evidence non-vacuous. */
  private val (okLo, okHi, pkLo, pkHi) = (100L, 900L, 20L, 160L)

  val defs: Map[String, Q] = Map(
    // Z-order layout rewrite (Delta OPTIMIZE ZORDER analog): cluster
    // lineitem by the interleaved bits of (l_orderkey, l_partkey),
    // then answer a 2-D box query from the rewritten files. After the
    // rewrite each file holds one tile of the key plane, so the box
    // prunes most files on BOTH dimensions via parquet min-max stats —
    // a single-column sort can only serve one. LayoutSpec asserts the
    // tiles are genuinely narrow on both keys.
    "s15_zorder_layout" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
      val outDir = Ingest.fixtureDir(dir) + "/zorder_lineitem"
      Layout.zorderWrite(li, "l_orderkey", "l_partkey", outDir, 16)
      s.read.parquet(outDir)
        .where(col("l_orderkey").between(okLo, okHi) &&
          col("l_partkey").between(pkLo, pkHi))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,6)")).cast("double")
            .as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // Targeted delete (the GDPR right-to-erasure path): rebuild the
    // user-bucket-partitioned events table, copy-on-write delete three
    // users, read the table back. Only the partitions the deleted
    // users hash to are rewritten (LayoutSpec pins untouched-partition
    // file mtimes); survivors are selected by broadcast anti-join so
    // the deletion set can be millions of keys, not an In-list.
    // The rebuild runs every invocation so the query is idempotent.
    "s14_targeted_delete" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/gdpr_events"
      val staging = Ingest.fixtureDir(dir) + "/gdpr_staging"
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), pmod(col("user_id"), lit(8)).cast("int").as("u_bucket"))
        .write.mode("overwrite").partitionBy("u_bucket").parquet(base)
      import s.implicits._
      val keys = Seq(7L, 23L, 98L).toDF("user_id")
      Layout.targetedDelete(s, base, "u_bucket", "user_id", keys, 8, staging)
      s.read.parquet(base)
        .groupBy("u_bucket")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("u_bucket")
    }),

    // Runtime bloom-filter join pruning: a selective dim filter
    // (p_size = 1 keeps 38 of 2000 parts at sf0.01) injects a bloom
    // filter of the surviving build keys into the fact scan, so most
    // lineitem rows die at the scan instead of riding the shuffle to
    // the join. The thresholds are session defaults tuned for 10 GB+
    // scans, so they are lowered for the local fixture and planning is
    // forced while they hold (plans are otherwise lazy); results are
    // identical either way — the filter only prunes. PlanShapeSpec
    // asserts the might_contain probe under these confs.
    "j13_bloom_pruned_join" -> ((s, dir) => {
      val df = bloomPlanned(s) {
        t(s, dir, "lineitem")
          .join(t(s, dir, "part").where(col("p_size") === 1),
            col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,6)")).cast("double")
              .as("sum_qty"))
          .orderBy("p_brand")
      }
      df
    }),

    // Deterministic stratified downsampling: cap the dominant stratum
    // (en → 10%) while keeping the rest at 50% — corpus rebalancing
    // before LLM training. Membership is the shared md5 bucket, so the
    // sample is growth-stable (new docs never flip old ones), rerun-
    // identical with no seed plumbing, and engine-reproducible — none
    // of which holds for rand()-based sample()/sampleBy().
    "p11_stratified_sample" -> ((s, dir) =>
      t(s, dir, "documents")
        .where(TextAnalysis.stableBucket(col("doc_id")) <
          when(col("lang") === "en", 100).otherwise(500))
        .select("doc_id", "lang")
        .orderBy("doc_id")))

  /** Run `build` with runtime bloom-filter injection armed and force
    * the plan while the confs hold; restore afterwards so no other
    * registry query plans under fixture-tuned thresholds.
    *
    * Auto-broadcast is disabled during planning because Spark only
    * injects the bloom filter into SHUFFLE joins — which is the honest
    * 100 TB framing: when the dim side exceeds the broadcast
    * threshold, the bloom probe is what still prunes the fact scan.
    * AQE is free to re-convert to broadcast at runtime under the
    * restored confs; the injected might_contain probe survives. */
  private def bloomPlanned(s: SparkSession)(build: => DataFrame): DataFrame = {
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> s.conf.getOption(k)).toMap
    s.conf.set(keys(0), "true")
    s.conf.set(keys(1), "0")
    s.conf.set(keys(2), "-1")
    try {
      val df = build
      df.queryExecution.executedPlan // pin the bloom-armed plan
      df
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  val oracles: Map[String, String] = Map(
    "s15_zorder_layout" ->
      s"""SELECT l_returnflag, count(*) AS n,
                cast(sum(cast(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
         FROM lineitem
         WHERE l_orderkey BETWEEN $okLo AND $okHi
           AND l_partkey BETWEEN $pkLo AND $pkHi
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "s14_targeted_delete" ->
      """SELECT cast(user_id % 8 AS INTEGER) AS u_bucket,
                count(*) AS n_events,
                count(DISTINCT user_id) AS n_users
         FROM events WHERE user_id NOT IN (7, 23, 98)
         GROUP BY 1 ORDER BY u_bucket""",
    "j13_bloom_pruned_join" ->
      """SELECT p_brand, count(*) AS n,
                cast(sum(cast(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_size = 1
         GROUP BY p_brand ORDER BY p_brand""",
    "p11_stratified_sample" ->
      """SELECT doc_id, lang FROM (
           SELECT doc_id, lang,
                  ('0x' || substring(md5(cast(doc_id AS VARCHAR)), 1, 8))::BIGINT
                    % 1000 AS b
           FROM documents)
         WHERE b < CASE WHEN lang = 'en' THEN 100 ELSE 500 END
         ORDER BY doc_id""")
}
