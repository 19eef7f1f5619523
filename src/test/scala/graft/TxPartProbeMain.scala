package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TxLog

/** Measures what declared partitioning buys (and costs) on the log at
  * a scale where it is visible: 20M rows, a 16-value partition column
  * (the "event type / ingest day" shape), equality queries answered
  * three ways:
  *   (a) an UNPARTITIONED table (random row placement — every file
  *       holds every value; parquet row-group stats can't help),
  *   (b) the PARTITIONED table via TxLog.readRange (manifest-level
  *       exact pruning: 1 of 16+ files),
  *   (c) the partitioned table through the DSv2 source with the
  *       WHERE pushed down (same pruning, planned inside Spark SQL).
  * Also measures the write-side tax: the one extra hash shuffle a
  * partitioned commit pays to land one file per tuple.
  * Run: sbt -batch "Test/runMain graft.TxPartProbeMain"
  * Numbers go to BENCH_NOTES.md. */
object TxPartProbeMain {
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
      .select(col("id"),
        concat(lit("type-"), (col("id") % 16).cast("string")).as("etype"),
        md5(col("id").cast("string")).as("payload"))

    val flat = "/tmp/graft_txpart_probe/flat"
    val part = "/tmp/graft_txpart_probe/part"
    TxLog.drop(spark, flat); TxLog.drop(spark, part)

    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label%-44s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    timed("seed flat: plain 32-file commit") {
      TxLog.commit(table.repartition(32), flat, None)
    }
    // realistic partitioned shape: 8 sequential ingest batches (the
    // daily-append lifecycle), so each tuple owns 8 files and a
    // partition query parallelizes across them — a table seeded in
    // ONE commit would leave each tuple a single file, a local-only
    // artifact (at 100 TB every partition spans many commits)
    timed("seed part: 8 partitioned appends") {
      val step = nRows / 8
      (0 until 8).foreach { i =>
        val slice = table.where(col("id") >= i * step &&
          col("id") < (i + 1) * step)
        if (i == 0) TxLog.commitPartitioned(slice, part, Seq("etype"))
        else TxLog.append(slice, part)
      }
    }

    val fs = new org.apache.hadoop.fs.Path(flat)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def bytesOf(base: String, es: Seq[TxLog.Entry]): Long =
      es.map(e => fs.getFileStatus(
        new org.apache.hadoop.fs.Path(TxLog.resolve(base, e.path))).getLen).sum
    val flatEs = TxLog.manifest(spark, flat,
      TxLog.latestVersion(spark, flat).get)._1
    val (keptP, allP) = TxLog.pruneRanges(spark, part,
      Seq(("etype", "type-7", "type-7")))
    println(s"files: flat=${flatEs.size} (all scanned), " +
      s"part kept=${keptP.size}/${allP.size}")
    println(f"bytes touched: flat=${bytesOf(flat, flatEs) / 1e6}%.0f MB, " +
      f"part=${bytesOf(part, keptP) / 1e6}%.0f MB " +
      f"(${bytesOf(flat, flatEs).toDouble / bytesOf(part, keptP)}%.1fx less IO)")

    def agg(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(count(lit(1)), sum(length(col("payload")))).head.getLong(0)

    // warm-up JIT/classloading once on each path
    agg(TxLog.read(spark, flat).where(col("etype") === "type-3"))
    agg(TxLog.readRange(spark, part, "etype", "type-3", "type-3"))

    (1 to 3).foreach { rep =>
      timed(s"rep$rep (a) flat: full scan + WHERE") {
        val n = agg(TxLog.read(spark, flat)
          .where(col("etype") === "type-7"))
        require(n == nRows / 16, s"got $n")
      }
      timed(s"rep$rep (b) part: readRange equality") {
        val n = agg(TxLog.readRange(spark, part, "etype",
          "type-7", "type-7"))
        require(n == nRows / 16, s"got $n")
      }
      timed(s"rep$rep (c) part: DSv2 pushed WHERE") {
        val n = agg(spark.read.format("graft.sources.TxLogSource")
          .load(part).where(col("etype") === "type-7"))
        require(n == nRows / 16, s"got $n")
      }
    }

    // append tax: the same daily batch into both shapes
    def batch = spark.range(nRows, nRows + 1_000_000L)
      .select(col("id"),
        concat(lit("type-"), (col("id") % 16).cast("string")).as("etype"),
        md5(col("id").cast("string")).as("payload"))
    timed("append 1M rows: flat") { TxLog.append(batch, flat) }
    timed("append 1M rows: partitioned (split tax)") {
      TxLog.append(batch, part)
    }

    spark.stop()
  }
}
