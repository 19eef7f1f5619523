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
