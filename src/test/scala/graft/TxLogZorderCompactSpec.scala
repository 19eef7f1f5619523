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

  test("k-column ZORDER: a 3-D layout prunes a 3-D box on ALL three " +
    "dimensions (each single-dimension slab keeps more files than the " +
    "box), content identical, fixpoint, and SQL takes the k-ary form") {
    val base = "/tmp/graft_txzc/kd"
    TxLog.drop(spark, base)
    // (day, region, key): the fact-table shape VERDICT r11 names
    val rows = spark.range(60000).select(
      (col("id") * 7 % 30).cast("int").as("day"),
      (col("id") * 13 % 50).cast("int").as("region"),
      (col("id") * 31 % 1000).cast("int").as("key"),
      concat(lit("p-"), col("id")).as("payload"))
    TxLog.commitMulti(
      Layout.zorderClusterK(rows, Seq("day", "region", "key"), 24),
      base, None, Seq("day", "region", "key"))
    // straggler appends so the verb has weak files to fold
    (1 to 2).foreach { i =>
      TxLog.append(spark.range(60).select(
        (col("id") % 3).cast("int").as("day"),
        (col("id") % 5).cast("int").as("region"),
        (col("id") % 50).cast("int").as("key"),
        concat(lit(s"s$i-"), col("id")).as("payload")).coalesce(1),
        base, Some("day"))
    }
    def checksum3() = TxLog.read(spark, base)
      .agg(count(lit(1)),
        bit_xor(xxhash64(col("day"), col("region"), col("key"),
          col("payload")))).head()
    val before = checksum3()
    val v = TxLog.compactZorder(spark, base, Seq("day", "region", "key"),
      smallThresholdRows = 500L, targetRows = 2000L)
    val entries = TxLog.manifest(spark, base, v)._1
    assert(entries.size > 8, s"expected a multi-tile layout, got ${entries.size}")
    assert(entries.forall(e => Seq("day", "region", "key").forall(c =>
      e.statsFor(c).isDefined)), "tiles must carry 3-D stats")
    assert(checksum3() == before)
    assert(!TxLog.dataChangeOf(spark, base, v))
    // skip sharpness: the 3-D box prunes strictly harder than any
    // single-dimension slab — evidence all three dims participate
    val boxPred = Seq(("day", 0, 5), ("region", 0, 9), ("key", 0, 199))
    val (kept3, all) = TxLog.pruneRanges(spark, base, boxPred)
    assert(kept3.size < all.size / 2,
      s"3-D box should prune most tiles, kept ${kept3.size}/${all.size}")
    for (dim <- boxPred) {
      val (kept1, _) = TxLog.pruneRanges(spark, base, Seq(dim))
      assert(kept3.size < kept1.size,
        s"3-D box (${kept3.size}) must out-prune the ${dim._1}-only " +
          s"slab (${kept1.size})")
    }
    // box-query correctness against the raw read
    val expect = TxLog.read(spark, base)
      .where(col("day").between(0, 5) && col("region").between(0, 9) &&
        col("key").between(0, 199))
      .agg(count(lit(1)), bit_xor(xxhash64(col("payload")))).head()
    val got = TxLog.readRanges(spark, base, boxPred)
      .agg(count(lit(1)), bit_xor(xxhash64(col("payload")))).head()
    assert(got == expect)
    // fixpoint within bounded iterations
    var prev = v; var iters = 0; var settled = false
    while (!settled && iters < 3) {
      val next = TxLog.compactZorder(spark, base,
        Seq("day", "region", "key"), 500L, 2000L)
      settled = next == prev; prev = next; iters += 1
    }
    assert(settled, "k-ary compactZorder must converge to a fixpoint")
    // the SQL verb takes k columns now (arity < 2 still fails loudly)
    val s0 = SparkTestBase.spark
    graft.sources.TxLogSqlDml.ensureInjected(s0)
    val s = s0.newSession()
    s.read.format("graft.sources.TxLogSource").load(base)
      .createOrReplaceTempView("txzc_kd")
    val sqlV = s.sql("OPTIMIZE txzc_kd ZORDER BY (day, region, key)")
      .head().getLong(0)
    // SQL defaults use Delta-scale bins (2^20/2^22 rows), so the small
    // test tiles legitimately re-fold — content must stay identical
    // and every output tile must carry 3-D stats
    assert(sqlV >= prev)
    assert(checksum3() == before)
    assert(TxLog.manifest(spark, base, sqlV)._1.forall(e =>
      Seq("day", "region", "key").forall(c => e.statsFor(c).isDefined)))
    val e = intercept[Exception] {
      s.sql("OPTIMIZE txzc_kd ZORDER BY (day)")
    }
    assert(e.getMessage.contains("at least two columns"))
  }

  test("review regression: ZORDER on an EMPTY table (file-less create " +
    "or fully-deleted) no-ops — the type veto's schema resolution " +
    "failure must not masquerade as an error") {
    import org.apache.spark.sql.types._
    val base = "/tmp/graft_txzc/empty"
    TxLog.drop(spark, base)
    TxLog.createTable(spark, base, StructType(Seq(
      StructField("x", IntegerType), StructField("y", IntegerType))))
    assert(TxLog.compactZorder(spark, base, "x", "y", 100L, 1000L) == 1L,
      "an empty table's ZORDER is a no-op at the current version")
  }

  test("review regression r13: a TIMESTAMP zorder key passes the veto " +
    "AND the rewrite — the interleave normalizes through the epoch " +
    "long (ANSI Subtract(timestamp, bigint) does not resolve)") {
    val base = "/tmp/graft_txzc/ts"
    TxLog.drop(spark, base)
    def batch(n: Int, tag: String) = spark.range(n).select(
      timestamp_seconds(lit(1700000000L) + col("id") * 60).as("ts"),
      (col("id") % 100).cast("int").as("x"),
      concat(lit(tag + "-"), col("id")).as("payload"))
    // the direct clustering path accepts the timestamp key
    TxLog.commitMulti(
      Layout.zorderClusterK(batch(4000, "seed"), Seq("ts", "x"), 4),
      base, None, Seq("ts", "x"))
    TxLog.append(batch(50, "inc").coalesce(1), base, Some("ts"))
    def sum0 = {
      val r = TxLog.read(spark, base).agg(count(lit(1)),
        bit_xor(xxhash64(col("ts"), col("x"), col("payload")))).head()
      (r.getLong(0), r.getLong(1))
    }
    val before = sum0
    // the maintenance verb re-tiles on (ts, x) without an
    // AnalysisException mid-rewrite; content is bit-identical
    val v = TxLog.compactZorder(spark, base, Seq("ts", "x"), 1000L, 10000L)
    assert(v == TxLog.latestVersion(spark, base).get)
    assert(sum0 == before)
    // the rewritten files carry usable stats on the timestamp key
    val entries = TxLog.manifest(spark, base, v)._1
    assert(entries.forall(_.statsFor("ts").isDefined),
      "every re-tiled file carries ts stats")
  }
}
