package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TxLog

/** `CLUSTER BY` laws (VERDICT r12 next-round #3 — the Delta liquid-
  * clustering analog): keys register at CREATE (a `#cluster` meta
  * line, writer-gated), every API write tiles its batch by the keys'
  * interleave and stamps their stats, and plain OPTIMIZE is
  * INCREMENTAL — it re-tiles only weak/polluted files, never the
  * healthy tiled history. */
class TxLogClusterBySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def grid(lo: Int, n: Int, tag: String) =
    spark.range(lo, lo + n).select(
      (col("id") * 7 % 100).cast("int").as("x"),
      (col("id") * 13 % 100).cast("int").as("y"),
      concat(lit(tag + "-"), col("id")).as("payload"))

  private def checksum(base: String): (Long, Long) = {
    val r = TxLog.read(spark, base)
      .agg(count(lit(1)),
        bit_xor(xxhash64(col("x"), col("y"), col("payload")))).head()
    (r.getLong(0), r.getLong(1))
  }

  test("writes to a clustered table tile themselves: every landed " +
    "file carries stats on ALL keys and covers a tight box — a 2-D " +
    "box probe prunes most files with ZERO maintenance runs") {
    val base = "/tmp/graft_txcb/tile"
    TxLog.drop(spark, base)
    TxLog.createTable(spark, base, StructType(Seq(
      StructField("x", IntegerType), StructField("y", IntegerType),
      StructField("payload", StringType))),
      clusterBy = Seq("x", "y"))
    // the registration is protocol-visible: writer 6
    val d = TxLog.describeDetail(spark, base).head()
    assert(d.getAs[Int]("min_writer_version") == 6, d.toString)
    // a 16-partition append tiles into 16 box files — WITHOUT the
    // caller asking for stats or layout
    TxLog.append(grid(0, 40000, "b1").repartition(16), base)
    val entries = TxLog.manifest(spark, base,
      TxLog.latestVersion(spark, base).get)._1
    assert(entries.nonEmpty)
    assert(entries.forall(e => e.statsFor("x").isDefined &&
      e.statsFor("y").isDefined),
      "every clustered write stamps stats on every key")
    // box probe: both dimensions prune (a single-dim sort can only
    // serve one)
    val (keptX, all) = TxLog.pruneRanges(spark, base, Seq(("x", 0, 9)))
    val (keptBox, _) = TxLog.pruneRanges(spark, base,
      Seq(("x", 0, 9), ("y", 0, 9)))
    assert(all.size >= 8, s"expected >=8 tiled files, got ${all.size}")
    assert(keptBox.size < all.size / 2,
      s"the box must prune: kept ${keptBox.size} of ${all.size}")
    assert(keptBox.size <= keptX.size)
  }

  test("plain OPTIMIZE on a clustered table is INCREMENTAL: straggler " +
    "appends and the tiles they pollute fold on the REGISTERED keys; " +
    "the healthy tiled majority carries by reference; content " +
    "bit-identical; fixpoint on re-run") {
    val base = "/tmp/graft_txcb/incr"
    TxLog.drop(spark, base)
    TxLog.createTable(spark, base, StructType(Seq(
      StructField("x", IntegerType), StructField("y", IntegerType),
      StructField("payload", StringType))),
      clusterBy = Seq("x", "y"))
    TxLog.append(grid(0, 40000, "seed").repartition(16), base)
    // corner stragglers: tiny appends confined to x,y in [0,10)
    (1 to 3).foreach { i =>
      TxLog.append(spark.range(50).select(
        (col("id") % 10).cast("int").as("x"),
        (col("id") % 10).cast("int").as("y"),
        concat(lit(s"inc$i-"), col("id")).as("payload")).coalesce(1),
        base)
    }
    val before = checksum(base)
    val vPre = TxLog.latestVersion(spark, base).get
    val preEntries = TxLog.manifest(spark, base, vPre)._1
    // healthy = big files whose box avoids the polluted corner
    val healthy = preEntries.filter(e => e.liveRows >= 1000 &&
      Seq("x", "y").exists(c => e.statsFor(c).exists(s =>
        TxLog.cmp(s.dtype, s.min, "10") >= 0))).map(_.path).toSet
    assert(healthy.nonEmpty, "fixture needs clean tiles to carry")
    // PLAIN compact — no keys passed; the registration supplies them
    val v = TxLog.compact(spark, base, 1000L, 10000L)
    assert(v == vPre + 1)
    val post = TxLog.manifest(spark, base, v)._1.map(_.path).toSet
    assert(healthy.subsetOf(post),
      "incremental OPTIMIZE must carry every healthy tile by reference")
    assert(checksum(base) == before, "content is bit-identical")
    assert(!TxLog.dataChangeOf(spark, base, v), "CDF skips the re-tile")
    // fixpoint: a second run publishes nothing
    assert(TxLog.compact(spark, base, 1000L, 10000L) == v,
      "a tiled clustered layout is a fixpoint")
  }

  test("ALTER CLUSTER BY registers/drops keys metadata-only; vetoes " +
    "compose: widen/drop of a key, string keys, partition overlap — " +
    "all loud; CLUSTER BY NONE restores plain compaction") {
    val base = "/tmp/graft_txcb/alter"
    TxLog.drop(spark, base)
    import spark.implicits._
    TxLog.commit((1 to 100).map(i => (i, i * 2, s"p-$i"))
      .toDF("x", "y", "payload").coalesce(1), base, None, Some("x"))
    val v2 = TxLog.alterClusterBy(spark, base, Seq("x", "y"))
    assert(!TxLog.dataChangeOf(spark, base, v2))
    assert(TxLog.clusterByOf(spark, base, v2) == Seq("x", "y"))
    assert(TxLog.operationOf(spark, base, v2).contains("CLUSTER BY"))
    // vetoes
    assert(intercept[IllegalArgumentException] {
      TxLog.alterClusterBy(spark, base, Seq("payload", "x"))
    }.getMessage.contains("interleave"))
    assert(intercept[IllegalArgumentException] {
      TxLog.alterWidenColumn(spark, base, "x", LongType)
    }.getMessage.contains("CLUSTER BY"))
    assert(intercept[IllegalArgumentException] {
      TxLog.createTable(spark, "/tmp/graft_txcb/nope",
        StructType(Seq(StructField("a", IntegerType),
          StructField("b", IntegerType))),
        partitionCols = Seq("a"), clusterBy = Seq("a", "b"))
    }.getMessage.contains("partition"))
    // drop clustering → widen passes, compact is plain again
    TxLog.alterClusterBy(spark, base, Seq.empty)
    assert(TxLog.clusterKeys(spark, base).isEmpty)
    TxLog.alterWidenColumn(spark, base, "x", LongType)
    assert(TxLog.read(spark, base).schema("x").dataType == LongType)
  }

  test("SQL surface: CREATE TABLE ... CLUSTER BY over the DSv2 " +
    "catalog registers the keys; INSERTs tile through the API verbs; " +
    "SQL OPTIMIZE runs the incremental sweep") {
    val s0 = SparkTestBase.spark
    graft.sources.TxLogSqlDml.ensureInjected(s0)
    val s = s0.newSession()
    s.conf.set("spark.sql.catalog.gcb", "graft.sources.TxLogCatalog")
    s.conf.set("spark.sql.catalog.gcb.warehouse", "/tmp/graft_txcb/wh")
    s.sql("CREATE NAMESPACE IF NOT EXISTS gcb.lake")
    s.sql("DROP TABLE IF EXISTS gcb.lake.ev")
    s.sql("CREATE TABLE gcb.lake.ev (x INT, y INT, payload STRING) " +
      "USING graft.sources.TxLogSource CLUSTER BY (x, y)")
    val base = "/tmp/graft_txcb/wh/lake/ev"
    assert(TxLog.clusterKeys(spark, base) == Seq("x", "y"))
    s.sql("INSERT INTO gcb.lake.ev SELECT cast(id * 7 % 100 AS INT), " +
      "cast(id * 13 % 100 AS INT), concat('p-', id) FROM range(20000)")
    assert(s.sql("SELECT count(*) FROM gcb.lake.ev").head.getLong(0)
      == 20000)
    // the DSv2 INSERT declared a clustered distribution + ordering on
    // the keys: landed files are key-banded and auto-stat BOTH keys
    val inserted = TxLog.manifest(spark, base,
      TxLog.latestVersion(spark, base).get)._1
    assert(inserted.nonEmpty && inserted.forall(e =>
      e.statsFor("x").isDefined && e.statsFor("y").isDefined),
      "clustered INSERT must stamp stats on every registered key")
    // a straggler INSERT then SQL OPTIMIZE folds it on the keys
    s.sql("INSERT INTO gcb.lake.ev VALUES (1, 1, 'straggler')")
    s.sql("OPTIMIZE gcb.lake.ev")
    assert(s.sql("SELECT count(*) FROM gcb.lake.ev").head.getLong(0)
      == 20001)
    // native ALTER TABLE ... CLUSTER BY re-registers / drops keys
    s.sql("ALTER TABLE gcb.lake.ev CLUSTER BY (y, x)")
    assert(TxLog.clusterKeys(spark, base) == Seq("y", "x"))
    s.sql("ALTER TABLE gcb.lake.ev CLUSTER BY NONE")
    assert(TxLog.clusterKeys(spark, base).isEmpty)
    // DESCRIBE DETAIL surfaces the registration
    graft.sources.TxLogSqlDml.ensureInjected(s0)
    s.sql("ALTER TABLE gcb.lake.ev CLUSTER BY (x, y)")
    val det = s.sql("DESCRIBE DETAIL gcb.lake.ev").head()
    assert(det.getAs[String]("clustering_columns") == "x,y", det.toString)
    s.sql("DROP TABLE gcb.lake.ev")
  }
}
