package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Layout, TxLog}

/** Measures what 2-D manifest stats buy a Z-ordered log table at a
  * scale where the skip is visible: a 20M-row table in 64 Z-tiles and
  * a box predicate covering ~1% of the key plane, answered three ways:
  *   (a) full snapshot read + WHERE (parquet row-group stats only),
  *   (b) TxLog.readRanges (manifest-level 2-D pruning),
  *   (c) the DSv2 source with the WHERE pushed down (same pruning,
  *       planned inside Spark SQL).
  * Run: sbt -batch "Test/runMain graft.TxZorderProbeMain"
  * Prints per-variant wall times + kept-file counts; numbers go to
  * BENCH_NOTES.md. */
object TxZorderProbeMain {
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
    // keys: a = row / 4096 (0..~4882), b = bit-reversed-ish spread so
    // the two dimensions are independent
    def table = spark.range(0, nRows)
      .select((col("id") / 4096).cast("long").as("a"),
        ((col("id") * 2654435761L) % 10000).as("b"),
        md5(col("id").cast("string")).as("payload"))

    val base = "/tmp/graft_txzorder_probe/store"
    TxLog.drop(spark, base)

    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    timed("seed: zorder cluster + commitMulti") {
      TxLog.commitMulti(Layout.zorderCluster(table, "a", "b", nFiles),
        base, None, Seq("a", "b"))
    }

    // ~10% of each dimension → ~1% of the plane
    val preds = Seq[(String, Any, Any)](("a", 1000L, 1500L), ("b", 2000L, 3000L))
    val (kept, all) = TxLog.pruneRanges(spark, base, preds)
    println(s"manifest prune: kept ${kept.size} of ${all.size} files")

    def agg(df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)), sum(length(col("payload")))).head()

    // warm the FS cache ordering fairly: run each variant 3×, report each
    (1 to 3).foreach { rep =>
      val full = timed(s"rep$rep full read + WHERE") {
        agg(TxLog.read(spark, base)
          .where(col("a").between(1000, 1500) && col("b").between(2000, 3000)))
      }
      val ranged = timed(s"rep$rep readRanges (manifest skip)") {
        agg(TxLog.readRanges(spark, base, preds))
      }
      val pushed = timed(s"rep$rep DSv2 source pushdown") {
        agg(spark.read.format("graft.sources.TxLogSource").load(base)
          .where(col("a").between(1000, 1500) && col("b").between(2000, 3000)))
      }
      println(s"rep$rep checksums identical=" +
        s"${full == ranged && ranged == pushed} ($full)")
    }

    // metadata-only aggregate (DSv2 complete pushdown): the same
    // COUNT/MIN/MAX answered from the manifest vs scanning the data
    (1 to 3).foreach { rep =>
      val meta = timed(s"rep$rep count/min/max via manifest") {
        spark.read.format("graft.sources.TxLogSource").load(base)
          .agg(count(lit(1)), min(col("a")), max(col("b"))).head()
      }
      val full = timed(s"rep$rep count/min/max via data scan") {
        TxLog.read(spark, base)
          .agg(count(lit(1)), min(col("a")), max(col("b"))).head()
      }
      println(s"rep$rep agg identical=${meta == full} ($meta)")
    }

    TxLog.drop(spark, base)
    spark.stop()
  }
}
