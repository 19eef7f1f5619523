package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Layout, TxLog}

/** `compactZorder` laws (VERDICT r10 next-round #6 — Delta
  * `OPTIMIZE ... ZORDER BY` on the log): small/straggler files and
  * the tiles their boxes pollute are re-tiled with 2-D stats; healthy
  * disjoint tiles ride by reference; content is bit-identical; the
  * version is `dataChange=false`; and the verb CONVERGES (a tiled
  * layout is a fixpoint). */
class TxLogZorderCompactSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** n rows over the [0,100)×[0,100) key plane. */
  private def grid(n: Int, tag: String) =
    spark.range(n).select(
      (col("id") * 7 % 100).cast("int").as("x"),
      (col("id") * 13 % 100).cast("int").as("y"),
      concat(lit(tag + "-"), col("id")).as("payload"))

  private def checksum(base: String): (Long, Long) = {
    val r = TxLog.read(spark, base)
      .agg(count(lit(1)), bit_xor(xxhash64(col("x"), col("y"), col("payload"))))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  test("small appends and the tiles they pollute fold into fresh " +
    "Z-tiles; clean tiles carry by reference; content identical; " +
    "dataChange=false; fixpoint on re-run") {
    val base = "/tmp/graft_txzc/fold"
    TxLog.drop(spark, base)
    // seed: 16 Z-tiles with stats on BOTH keys
    TxLog.commitMulti(Layout.zorderCluster(grid(40000, "seed"), "x", "y", 16),
      base, None, Seq("x", "y"))
    // stragglers: three small appends confined to a CORNER of the key
    // plane — they pollute the few tiles covering that corner only
    (1 to 3).foreach { i =>
      TxLog.append(spark.range(50).select(
        (col("id") % 10).cast("int").as("x"),
        (col("id") % 10).cast("int").as("y"),
        concat(lit(s"inc$i-"), col("id")).as("payload")).coalesce(1),
        base, Some("x"))
    }
    val before = checksum(base)
    val preEntries = TxLog.manifest(spark, base,
      TxLog.latestVersion(spark, base).get)._1
    assert(preEntries.size == 19)
    val v = TxLog.compactZorder(spark, base, "x", "y",
      smallThresholdRows = 1000L, targetRows = 5000L)
    val entries = TxLog.manifest(spark, base, v)._1
    // clean far-corner tiles survived BY REFERENCE
    val carried = entries.map(_.path).toSet
      .intersect(preEntries.map(_.path).toSet)
    assert(carried.nonEmpty,
      "tiles disjoint from the stragglers must not be rewritten")
    // every rewritten file carries stats on BOTH dimensions
    val rewritten = entries.filterNot(e => carried.contains(e.path))
    assert(rewritten.nonEmpty)
    assert(rewritten.forall(e =>
      e.statsFor("x").isDefined && e.statsFor("y").isDefined),
      "re-tiled files must carry 2-D stats")
    // content identical; maintenance is invisible to change feeds
    assert(checksum(base) == before)
    assert(!TxLog.dataChangeOf(spark, base, v))
    // 2-D skipping is sharp again: a corner box opens few files
    val (kept, all) = TxLog.pruneRanges(spark, base,
      Seq(("x", 0, 9), ("y", 0, 9)))
    assert(all.size == entries.size)
    assert(kept.size < preEntries.size / 2,
      s"corner box should prune most files, kept ${kept.size}/${all.size}")
    // convergence: repeated runs reach a fixpoint within a bounded
    // number of iterations (range-partition skew can leave one
    // undersized tile on a run; it folds in on the next)
    var prev = v
    var iters = 0
    var settled = false
    while (!settled && iters < 3) {
      val next = TxLog.compactZorder(spark, base, "x", "y", 1000L, 5000L)
      settled = next == prev
      prev = next
      iters += 1
    }
    assert(settled, "compactZorder must converge to a fixpoint")
    assert(checksum(base) == before)
  }

  test("box queries stay correct through the re-tiling (readRanges " +
    "before == after)") {
    val base = "/tmp/graft_txzc/box"
    TxLog.drop(spark, base)
    TxLog.commitMulti(Layout.zorderCluster(grid(20000, "a"), "x", "y", 8),
      base, None, Seq("x", "y"))
    TxLog.append(grid(80, "b").coalesce(1), base, Some("x"))
    def box() = TxLog.readRanges(spark, base,
      Seq(("x", 20, 40), ("y", 60, 80)))
      .agg(count(lit(1)), bit_xor(xxhash64(col("payload")))).head()
    val before = box()
    TxLog.compactZorder(spark, base, "x", "y", 1000L, 4000L)
    assert(box() == before)
  }
}
