package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TxLog

/** Measures merge-on-read vs copy-on-write DML at 20M rows / 32
  * range-clustered files, the round-10 deletion-vector claim:
  *   (a) COW deleteRange of a band — rewrites every touched file;
  *   (b) MOR deleteRangeMor of the same band — lands only positions;
  *   (c) snapshot read cost on the masked table (anti-join price);
  *   (d) purge, then the clean-read cost for reference.
  * Run: sbt -batch "Test/runMain graft.TxMorProbeMain"
  * Numbers go to BENCH_NOTES.md. */
object TxMorProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nRows = if (args.nonEmpty) args(0).toLong else 20_000_000L
    // the band touches 2 of 32 files, deleting half their rows —
    // the GDPR-erasure shape: narrow, predicate-selective
    val (bandLo, bandHi) = (nRows / 32, nRows / 32 * 3)
    def table = spark.range(0, nRows)
      .select(col("id").as("k"),
        (col("id") % 97).cast("double").as("v"),
        md5(col("id").cast("string")).as("payload"))
      .repartitionByRange(32, col("k"))

    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def dirBytes(base: String): Long = {
      val p = new org.apache.hadoop.fs.Path(base)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(p).getLength
    }

    val cow = "/tmp/graft_txmor_probe/cow"
    val mor = "/tmp/graft_txmor_probe/mor"
    TxLog.drop(spark, cow); TxLog.drop(spark, mor)
    timed("seed cow (20M, 32 files)") {
      TxLog.commit(table, cow, None, Some("k")) }
    timed("seed mor (20M, 32 files)") {
      TxLog.commit(table, mor, None, Some("k")) }
    val bytesBefore = dirBytes(cow)

    val residual = pmod(col("k"), lit(2)) === 0
    timed("COW deleteRange (band rewrite)") {
      TxLog.deleteRange(spark, cow, "k", bandLo, bandHi, residual) }
    val cowDelta = dirBytes(cow) - bytesBefore
    timed("MOR deleteRangeMor (positions only)") {
      TxLog.deleteRangeMor(spark, mor, "k", bandLo, bandHi, residual) }
    val morDelta = dirBytes(mor) - bytesBefore
    println(f"bytes written by delete: cow=${cowDelta / 1e6}%.1f MB " +
      f"mor=${morDelta / 1e6}%.1f MB (${cowDelta.toDouble / morDelta}%.1fx)")

    def check(base: String) = TxLog.read(spark, base)
      .agg(count(lit(1)), sum(col("v")).cast("decimal(20,2)")).head()
    val rCow = timed("read masked-equivalent (cow, clean)") { check(cow) }
    val rMor = timed("read masked (mor, anti-join)") { check(mor) }
    println(s"checksums identical=${rCow == rMor} ($rCow)")

    timed("purgeDeletes (rewrite 2 masked files)") {
      TxLog.purgeDeletes(spark, mor) }
    val rPurged = timed("read after purge (mor, clean)") { check(mor) }
    println(s"post-purge identical=${rPurged == rCow}")

    TxLog.drop(spark, cow); TxLog.drop(spark, mor)
    spark.stop()
  }
}
