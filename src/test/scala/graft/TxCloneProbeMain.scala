package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TxLog

/** Measures the two clone shapes at 20M rows / 32 files:
  *   (a) SHALLOW — one metadata commit referencing the source;
  *   (b) DEEP — the executor-side distributed file copy (the number
  *       that matters at 100 TB: the copy must scale with executors,
  *       not serialize through the driver);
  *   (c) a driver-side sequential copy of the same files, the naive
  *       alternative (b) exists to avoid.
  * Also proves both clones read identically post-clone.
  * Run: sbt -batch "Test/runMain graft.TxCloneProbeMain"
  * Numbers go to BENCH_NOTES.md. */
object TxCloneProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nRows = if (args.nonEmpty) args(0).toLong else 20_000_000L
    val src = "/tmp/graft_cloneprobe/src"
    val shallow = "/tmp/graft_cloneprobe/shallow"
    val deep = "/tmp/graft_cloneprobe/deep"
    val naive = "/tmp/graft_cloneprobe/naive"

    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label%-46s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def dirBytes(base: String): Long = {
      val p = new org.apache.hadoop.fs.Path(base)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true)
      var total = 0L
      while (it.hasNext) total += it.next().getLen
      total
    }

    Seq(src, shallow, deep, naive).foreach(TxLog.drop(spark, _))
    timed(s"seed $nRows rows / 32 files") {
      TxLog.commit(spark.range(0, nRows)
        .select(col("id").as("k"),
          (col("id") % 97).cast("double").as("v"),
          md5(col("id").cast("string")).as("payload"))
        .repartitionByRange(32, col("k")), src, None, Some("k"))
    }
    val srcBytes = dirBytes(src)
    println(f"source size ${srcBytes / 1e6}%.1f MB")

    timed("(a) SHALLOW clone (metadata only)") {
      TxLog.cloneShallow(spark, src, shallow)
    }
    timed(f"(b) DEEP clone (distributed copy)") {
      TxLog.cloneDeep(spark, src, deep)
    }
    // (c) the naive driver loop over the same byte volume
    timed("(c) driver-side sequential copy of same files") {
      val conf = spark.sparkContext.hadoopConfiguration
      val entries = TxLog.manifest(spark, src,
        TxLog.latestVersion(spark, src).get)._1
      entries.foreach { e =>
        val sp = new org.apache.hadoop.fs.Path(TxLog.resolve(src, e.path))
        val dp = new org.apache.hadoop.fs.Path(s"$naive/${e.path}")
        org.apache.hadoop.fs.FileUtil.copy(
          sp.getFileSystem(conf), sp, dp.getFileSystem(conf), dp,
          false, true, conf)
      }
    }

    val a = timed("read source (sum v)") {
      TxLog.read(spark, src).agg(sum("v")).head.getDouble(0) }
    val b = timed("read deep clone (sum v)") {
      TxLog.read(spark, deep).agg(sum("v")).head.getDouble(0) }
    require(a == b, s"clone must read identically: $a vs $b")
    println(f"deep clone size ${dirBytes(deep) / 1e6}%.1f MB " +
      f"(source ${srcBytes / 1e6}%.1f MB)")
    spark.stop()
  }
}
