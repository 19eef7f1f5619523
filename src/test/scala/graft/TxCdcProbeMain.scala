package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{TxLog, Upsert}

/** Measures the CDC replica-apply loop at 20M rows / 32 files: one
  * batch of 100k deletes + 100k upserts applied
  *   (a) via TxLog.applyChanges — masks + append, zero rewrites;
  *   (b) via a full-table transact rebuild (the naive replica).
  * Run: sbt -batch "Test/runMain graft.TxCdcProbeMain"
  * Numbers go to BENCH_NOTES.md. */
object TxCdcProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nRows = if (args.nonEmpty) args(0).toLong else 20_000_000L
    def table = spark.range(0, nRows)
      .select(col("id").as("k"),
        (col("id") % 97).cast("double").as("v"),
        md5(col("id").cast("string")).as("payload"))
      .repartitionByRange(32, col("k"))
    // the CDC batch, in change-feed form (an UPDATE arrives as its
    // delete marker + new image): 50k pure deletes, 50k updated keys
    // (in BOTH lists), 50k fresh inserts — 100k delete keys, 100k
    // insert rows
    val step = nRows / 50_000
    val pureDel = spark.range(0, nRows, step).select(col("id").as("k"))
    val updKeys = spark.range(1, nRows, step).select(col("id").as("k"))
    val delKeys = pureDel.unionByName(updKeys)
    val upserts = updKeys
      .unionByName(spark.range(nRows, nRows + 50_000).select(col("id").as("k")))
      .select(col("k"), lit(-1.0).as("v"),
        md5(col("k").cast("string")).as("payload"))

    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def dirBytes(base: String): Long = {
      val p = new org.apache.hadoop.fs.Path(base)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getContentSummary(p).getLength
    }

    val mor = "/tmp/graft_txcdc_probe/mor"
    val full = "/tmp/graft_txcdc_probe/full"
    TxLog.drop(spark, mor); TxLog.drop(spark, full)
    timed("seed mor (20M, 32 files)") {
      TxLog.commit(table, mor, None, Some("k")) }
    timed("seed full (20M, 32 files)") {
      TxLog.commit(table, full, None, Some("k")) }
    // each route's delta against ITS OWN seed size — the two seeds
    // can differ slightly in on-disk bytes
    val morBefore = dirBytes(mor)
    val fullBefore = dirBytes(full)

    timed("applyChanges (mask 100k keys + append 100k rows)") {
      TxLog.applyChanges(spark, mor, delKeys, upserts,
        Seq("k"), "k", appId = "probe", batchId = 0L)
    }
    val morDelta = dirBytes(mor) - morBefore
    timed("full transact rebuild (same batch)") {
      TxLog.transact(spark, full) { snap =>
        Upsert.merge(
          snap.get.join(delKeys, Seq("k"), "left_anti"), upserts, Seq("k"))
      }
    }
    val fullDelta = dirBytes(full) - fullBefore
    println(f"bytes written: applyChanges=${morDelta / 1e6}%.1f MB " +
      f"rebuild=${fullDelta / 1e6}%.1f MB " +
      f"(${fullDelta.toDouble / morDelta}%.1fx)")

    // both routes must agree row-for-row (updated keys are in both
    // lists: masked by the delete half, re-added by the insert half)
    def check(base: String) = TxLog.read(spark, base)
      .agg(count(lit(1)), sum(col("v")).cast("decimal(20,2)")).head()
    val (a, b) = (check(mor), check(full))
    println(s"checksums identical=${a == b} ($a)")

    TxLog.drop(spark, mor); TxLog.drop(spark, full)
    spark.stop()
  }
}
