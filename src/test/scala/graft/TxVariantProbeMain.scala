package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TxLog

/** Variant-path stats + variant clustering at 20M rows — the
  * semi-structured twin of TxColMapProbeMain's evidence:
  *   (a) the one-shot COLLECT sweep cost over an unclustered 32-file
  *       table (one aggregate scan) and what a typed band read costs
  *       BEFORE any layout work (all files touched — stats exist but
  *       every file spans the key space);
  *   (b) a DECLARED + CLUSTER BY table ingesting the same 20M rows in
  *       4 unsorted appends — the write-time stats tax on ingest, the
  *       tiled band read (files kept should be a handful of 32+), and
  *       the plain-OPTIMIZE fixpoint re-run cost;
  *   (c) the metadata-only surface: declare/cluster registration
  *       commit sizes.
  * Run: sbt -batch "Test/runMain graft.TxVariantProbeMain"
  * Numbers go to BENCH_NOTES.md. */
object TxVariantProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nRows = if (args.nonEmpty) args(0).toLong else 20_000_000L
    // price decorrelates from k (Knuth multiplicative hash mod 1e6),
    // so clustering on the PATH is real work, not a free sort
    def slice(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(col("id").as("k"),
        parse_json(concat(lit("{\"id\": "), col("id"),
          lit(", \"price\": "),
          pmod(col("id") * 2654435761L, lit(1000000L)),
          lit("}"))).as("v"))

    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label%-52s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // ---- (a) unclustered: sweep + band read ------------------------
    val flat = "/tmp/graft_varprobe/flat"
    TxLog.drop(spark, flat)
    timed(s"seed ${nRows / 1000000}M-row variant table (32 files)") {
      TxLog.commit(slice(0, nRows).repartition(32), flat, None, Some("k"))
    }
    timed("COLLECT VARIANT STATS sweep ($.price, one agg scan)") {
      TxLog.collectVariantStats(spark, flat, "v", "$.price", "long")
    }
    val (keptFlat, allFlat) = TxLog.pruneRanges(spark, flat,
      Seq(("v$.price", 500000L, 500999L)))
    println(s"unclustered band files kept: ${keptFlat.size} of ${allFlat.size}")
    val nFlat = timed("unclustered band read count ($.price in 1000-wide)") {
      TxLog.readVariantRange(spark, flat, "v", "$.price", "long",
        500000L, 500999L).count()
    }

    // ---- (b) declared + clustered ingest ---------------------------
    val tiled = "/tmp/graft_varprobe/tiled"
    TxLog.drop(spark, tiled)
    TxLog.commit(slice(0, 1).coalesce(1), tiled, None, Some("k"))
    val mdBytes = timed("declare + CLUSTER BY registration (2 commits)") {
      TxLog.declareVariantStats(spark, tiled, "v", "$.price", "long")
      TxLog.alterClusterBy(spark, tiled, Seq("v$.price"))
      val dir = new org.apache.hadoop.fs.Path(s"$tiled/_log")
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(dir).filter(_.getPath.getName.startsWith("v"))
        .map(_.getLen).sorted.takeRight(2).sum
    }
    println(s"registration manifest bytes (2 newest): $mdBytes")
    val quarter = nRows / 4
    (0 until 4).foreach { i =>
      timed(s"clustered unsorted append ${i + 1}/4 (${quarter / 1000000}M rows)") {
        TxLog.append(slice(i * quarter, (i + 1) * quarter)
          .repartition(8), tiled, Some("k"))
      }
    }
    val (kept, all) = TxLog.pruneRanges(spark, tiled,
      Seq(("v$.price", 500000L, 500999L)))
    println(s"tiled band files kept: ${kept.size} of ${all.size}")
    val nTiled = timed("tiled band read count (same 1000-wide band)") {
      TxLog.readVariantRange(spark, tiled, "v", "$.price", "long",
        500000L, 500999L).count()
    }
    // the 1-row seed (id 0, price 0) sits outside the probe band, so
    // both tables hold identical band contents
    require(nTiled == nFlat,
      s"band contents must agree: flat $nFlat vs tiled $nTiled")
    // thresholds sized to the tile population (625k rows/tile): the
    // first sweep folds only the 1-row seed straggler + the tile it
    // pollutes; the second run is the fixpoint and must cost ~nothing
    val vOpt = timed("OPTIMIZE sweep (fold the seed straggler)") {
      TxLog.compact(spark, tiled, 100000L, 700000L)
    }
    val vFix = timed("OPTIMIZE re-run (fixpoint, no work)") {
      TxLog.compact(spark, tiled, 100000L, 700000L)
    }
    require(vFix == vOpt, s"fixpoint must publish nothing: $vOpt -> $vFix")
    val (kept2, all2) = TxLog.pruneRanges(spark, tiled,
      Seq(("v$.price", 500000L, 500999L)))
    println(s"post-OPTIMIZE band files kept: ${kept2.size} of ${all2.size}")
    println("PROBE OK")
    spark.stop()
  }
}
