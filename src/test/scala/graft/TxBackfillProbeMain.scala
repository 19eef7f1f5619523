package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.TxLog

/** Measures what file-granular admission control buys a stream that
  * starts from scratch on a big table: a 20M-row / 64-file snapshot
  * drained (a) in ONE unbounded micro-batch (the only pre-r11 option)
  * vs (b) under maxFilesPerTrigger=8 (8 bounded batches). Wall totals
  * are similar — the point is the UNIT OF PROGRESS: (b) checkpoints
  * every 8 files, so a failure loses one slice, the sink commits
  * bounded versions, and peak per-batch state is 1/8th; at 100 TB
  * "version 1" IS the table and (a) is one multi-hour all-or-nothing
  * batch. Run: sbt -batch "Test/runMain graft.TxBackfillProbeMain" */
object TxBackfillProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nRows = if (args.nonEmpty) args(0).toLong else 20_000_000L

    val base = "/tmp/graft_backfill_probe/src"
    TxLog.drop(spark, base)
    val t0 = System.nanoTime()
    TxLog.commit(spark.range(0, nRows)
      .select(col("id"), md5(col("id").cast("string")).as("payload"))
      .repartition(64), base, None)
    println(f"seed 64 files: ${(System.nanoTime() - t0) / 1e9}%.1f s")

    def drain(tag: String, opts: Map[String, String]): Unit = {
      val out = s"/tmp/graft_backfill_probe/out_$tag"
      val ckpt = s"/tmp/graft_backfill_probe/ckpt_$tag"
      TxLog.drop(spark, out); TxLog.drop(spark, ckpt)
      val t = System.nanoTime()
      val q = opts.foldLeft(
          spark.readStream.format("graft.sources.TxLogSource")) {
          case (r, (k, v)) => r.option(k, v)
        }.load(base)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val batches = new java.io.File(s"$ckpt/offsets").listFiles()
        .count(!_.getName.startsWith("."))
      val rows = spark.read.parquet(out).count()
      require(rows == nRows, s"$tag lost rows: $rows")
      println(f"$tag%-28s ${(System.nanoTime() - t) / 1e9}%6.1f s  " +
        f"batches=$batches%3d  rows=$rows")
    }

    drain("unbounded (pre-r11)", Map.empty)
    drain("maxFilesPerTrigger=8", Map("maxFilesPerTrigger" -> "8"))
    spark.stop()
  }
}
