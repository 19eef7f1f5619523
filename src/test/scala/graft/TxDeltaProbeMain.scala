package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TxLog

/** Measures the O(change) commit protocol (VERDICT r10 #1): manifest
  * bytes WRITTEN per 1-file append as the table grows from 10^1 to
  * 10^4 files, and latest-version resolution cost with/without the
  * `_last_checkpoint` pointer. Under the r10 full-snapshot protocol
  * the per-append manifest was O(table files) — linear in the first
  * column below; the delta protocol writes a flat few hundred bytes
  * regardless of table size (checkpoints amortize at 1/interval).
  * Run: sbt -batch "Test/runMain graft.TxDeltaProbeMain"
  * Numbers go to BENCH_NOTES.md. */
object TxDeltaProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = "/tmp/graft_txdelta_probe/t"
    TxLog.drop(spark, base)
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)

    def commitBytes(v: Long): Long =
      fs.getFileStatus(new Path(f"$base/_log/v$v%020d.txt")).getLen

    // seed sizes: grow the table by bulk commits, then measure what ONE
    // 1-file append writes to the log at each size
    println(f"${"table files"}%12s ${"append delta B"}%16s ${"ckpt B (amortized /10)"}%24s")
    var seeded = 0
    Seq(10, 100, 1000, 10000).foreach { target =>
      val add = target - seeded
      // bulk-grow in ≤256-file chunks to keep memory flat
      var remaining = add
      while (remaining > 0) {
        val chunk = math.min(remaining, 256)
        TxLog.append(
          spark.range(chunk).select((col("id") + seeded).cast("int").as("k"),
            concat(lit("x"), col("id")).as("s")).repartition(chunk), base)
        seeded += chunk
        remaining -= chunk
      }
      val v = TxLog.append(Seq(seeded -> "probe").toDF("k", "s").coalesce(1),
        base)
      seeded += 1
      // the most recent checkpoint's size, for the amortized cost story
      val ckpts = fs.listStatus(new Path(s"$base/_log")).toSeq
        .filter(_.getPath.getName.endsWith(".ckpt.txt"))
      val ckptB = ckpts.map(_.getLen).maxOption.getOrElse(0L)
      println(f"$seeded%12d ${commitBytes(v)}%16d ${ckptB / 10}%24d")
    }

    // latest-version resolution: pointer probe vs forced full listing
    def timeMs(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
    }
    val reps = 200
    val withPtr = timeMs((1 to reps).foreach(_ =>
      TxLog.latestVersion(spark, base))) / reps
    fs.delete(new Path(s"$base/_log/_last_checkpoint"), false)
    val noPtr = timeMs((1 to reps).foreach(_ =>
      TxLog.latestVersion(spark, base))) / reps
    println(f"latestVersion: pointer-probe $withPtr%.2f ms vs full-listing " +
      f"$noPtr%.2f ms per call (log has ~${seeded / 256 + 8} commits)")

    val n = TxLog.read(spark, base).count()
    println(s"final table rows=$n files=$seeded")
    spark.stop()
  }
}
