package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Evidence for the runtime-adaptivity claims (README "Scale design"):
  * AQE re-plans joins from runtime shuffle statistics and coalesces
  * undersized shuffle partitions — the mechanisms that absorb
  * estimate errors at 100 TB. Plus the physical-layout contract of
  * the s13 compaction rewrite (many small files → few sorted files). */
class AdaptiveLayoutSpec extends AnyFunSuite {
  import SparkTestBase._

  test("AQE converts a statically-planned SMJ to broadcast at runtime") {
    // sf0.1 scans are comfortably above the 10 MB broadcast threshold,
    // so the STATIC plan keeps a shuffle join (the filter's output size
    // is unknowable without CBO stats); at runtime the filtered side's
    // shuffle output is a few KB and AQE swaps in a broadcast join.
    val dir = "/root/testdata/sf0.1"
    val li = graft.sources.Tables.load(spark, dir, "lineitem")
      .where(col("l_orderkey") < 100)
      .select("l_orderkey", "l_quantity")
    val o = graft.sources.Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice")
    val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
    j.collect()
    val s = j.queryExecution.executedPlan.toString
    assert(s.contains("isFinalPlan=true"), s"no adaptive final plan:\n$s")
    assert(s.contains("BroadcastHashJoin"),
      s"expected AQE runtime broadcast conversion; got:\n$s")
  }

  test("AQE coalesces undersized shuffle partitions") {
    val c = graft.sources.Tables.load(spark, sfDir, "customer")
    val g = c.groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    g.collect()
    val s = g.queryExecution.executedPlan.toString
    assert(s.contains("AQEShuffleRead"), s"no AQE shuffle read:\n$s")
    assert(s.contains("coalesced"), s"partitions not coalesced:\n$s")
  }

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    // Two thirds of the fact rows share ONE hot key, so its shuffle
    // partition dwarfs the median; with the skew thresholds scaled to
    // test size, OptimizeSkewedJoin must split that partition (and
    // replicate the matching dim partition) — the runtime half of the
    // skew story whose static half is j19_salted_skew / Skew.saltedJoin.
    val dir = "/root/testdata/sf0.01"
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8192",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8192",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // AQE splits a skewed partition on MAP-OUTPUT boundaries: the
      // fact side must come from many map tasks or the hot partition
      // is one indivisible chunk (sf0.01 events is a single file).
      val ev = graft.sources.Tables.load(spark, dir, "events")
        .repartition(16, col("event_id"))
        .withColumn("k",
          when(col("user_id") % 150 < 100, 0L).otherwise(col("user_id")))
      val dim = spark.range(0, 200).select(col("id").as("k"),
        (col("id") * 7).as("v"))
      val j = ev.join(dim, "k").select("event_id", "k", "v")
      j.collect()
      val s = j.queryExecution.executedPlan.toString
      assert(s.contains("isFinalPlan=true"), s"no adaptive final plan:\n$s")
      assert(s.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$s")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("s13 compaction: 64 small files become <= 4 sorted files, rows intact") {
    val out = SparkEntry.queries("s13_compact_small_files")(spark, sfDir)
    val total = out.agg(sum("n")).head().getLong(0)
    assert(total == graft.sources.Tables.load(spark, sfDir, "events").count())
    def partFiles(p: String) =
      new java.io.File(p).listFiles.count(_.getName.startsWith("part-"))
    val fx = graft.sources.Ingest.fixtureDir(sfDir)
    assert(partFiles(fx + "/compact_src") == 64)
    assert(partFiles(fx + "/compact_out") <= 4)
  }
}
