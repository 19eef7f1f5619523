package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{TxLog, Upsert}

/** Measures what the v2 manifest's COW merge actually buys over the
  * full-snapshot transact MERGE at a scale where the difference is
  * visible: a range-clustered table with a narrow CDC batch. Run:
  *   sbt -batch "Test/runMain graft.TxLogCowProbeMain"
  * Prints per-variant wall times + the carried-file count; numbers go
  * to BENCH_NOTES.md. */
object TxLogCowProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nRows = if (args.nonEmpty) args(0).toLong else 20_000_000L
    val nFiles = 64
    val batch = 100_000L // 0.5% of the table, one band's worth

    def table = spark.range(0, nRows)
      .select(col("id").as("k"),
        (col("id") % 97).cast("double").as("v"),
        md5(col("id").cast("string")).as("payload"))

    def source = spark.range(nRows / 2, nRows / 2 + batch)
      .select(col("id").as("k"),
        lit(-1.0).as("v"),
        lit("updated").as("payload"))

    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // -- full-snapshot transact merge (rewrites the whole table)
    val baseFull = "/tmp/graft_txcow_probe/full"
    TxLog.drop(spark, baseFull)
    timed("seed commit (full store)") {
      TxLog.commit(table.repartitionByRange(nFiles, col("k")), baseFull, None)
    }
    timed("transact full merge") {
      TxLog.transact(spark, baseFull) { snap =>
        Upsert.merge(snap.get, source, Seq("k"))
      }
    }

    // -- COW merge (rewrites only the overlapping band files)
    val baseCow = "/tmp/graft_txcow_probe/cow"
    TxLog.drop(spark, baseCow)
    timed("seed commit (cow store)") {
      TxLog.commit(table.repartitionByRange(nFiles, col("k")),
        baseCow, None, Some("k"))
    }
    timed("mergeCow narrow batch") {
      TxLog.mergeCow(spark, baseCow, source, Seq("k"), "k")
    }
    val before = TxLog.manifestFiles(spark, baseCow, 1L).toSet
    val after = TxLog.manifestFiles(spark, baseCow, 2L).toSet
    println(s"carried ${before.intersect(after).size} of ${before.size} files")

    // -- equivalence checksum
    def sum(base: String) = TxLog.read(spark, base)
      .agg(org.apache.spark.sql.functions.sum(col("v")).cast("decimal(20,2)"),
        count(lit(1))).head()
    val (a, b) = (sum(baseFull), sum(baseCow))
    println(s"checksums: full=$a cow=$b identical=${a == b}")

    TxLog.drop(spark, baseFull)
    TxLog.drop(spark, baseCow)
    spark.stop()
  }
}
