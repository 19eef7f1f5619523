package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TxLog

/** Row tracking laws (VERDICT r12 next-round #4 — Delta 4.0 row IDs):
  * stable per-row ids assigned at commit through a `#rowid` high-water
  * and per-file base spans, MATERIALIZED into rewritten files so a
  * row keeps its id across OPTIMIZE / ZORDER / COW UPDATE for its
  * whole life; a tracked COW UPDATE's change feed emits TRUE update
  * images keyed by the stable id. */
class TxLogRowTrackingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def idsByKey(base: String): Map[Int, Long] =
    TxLog.readWithRowIds(spark, base).select("k", "_row_id").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap

  test("enable backfills contiguous spans; ids are unique, stable " +
    "across appends, and the feature is protocol-gated (reader 4, " +
    "writer 7); enabling is idempotent; untracked tables untouched") {
    val base = "/tmp/graft_txrid/core"
    TxLog.drop(spark, base)
    import spark.implicits._
    TxLog.commit((1 to 100).map(i => (i, i * 10)).toDF("k", "v")
      .repartition(4), base, None, Some("k"))
    val v = TxLog.enableRowTracking(spark, base)
    assert(v == 2L && !TxLog.dataChangeOf(spark, base, v))
    assert(TxLog.enableRowTracking(spark, base) == v, "idempotent")
    assert(TxLog.rowIdHighWaterOf(spark, base, v).contains(100L))
    val d = TxLog.describeDetail(spark, base).head()
    assert(d.getAs[Int]("min_reader_version") == 4, d.toString)
    assert(d.getAs[Int]("min_writer_version") == 7, d.toString)
    // every row has a unique id in [0, 100)
    val ids0 = idsByKey(base)
    assert(ids0.size == 100 && ids0.values.toSet == (0L until 100L).toSet)
    // an append takes the NEXT span; old rows keep their ids
    TxLog.append((101 to 120).map(i => (i, i * 10)).toDF("k", "v"),
      base, Some("k"))
    val ids1 = idsByKey(base)
    assert(ids1.size == 120)
    ids0.foreach { case (k, id) => assert(ids1(k) == id) }
    assert(ids1.values.toSet == (0L until 120L).toSet)
    // the id column never leaks into plain reads
    assert(!TxLog.read(spark, base).columns.exists(
      _.equalsIgnoreCase("__row_id")))
    assert(!TxLog.readEvolved(spark, base).columns.exists(
      _.equalsIgnoreCase("__row_id")))
    // the reserved column is rejected at the write verbs
    assert(intercept[IllegalArgumentException] {
      TxLog.append(Seq((1, 1, 5L)).toDF("k", "v", "__row_id"), base)
    }.getMessage.contains("reserved"))
    // an untracked sibling stays protocol (1,1) with no rid groups
    val plain = "/tmp/graft_txrid/plain"
    TxLog.drop(spark, plain)
    TxLog.commit(Seq((1, 1)).toDF("k", "v"), plain, None, Some("k"))
    assert(TxLog.describeDetail(spark, plain).head()
      .getAs[Int]("min_reader_version") == 1)
    assert(!TxLog.describeDetail(spark, plain).head()
      .getAs[Boolean]("row_tracking"))
  }

  test("SQL surface: enabling rides ALTER TABLE SET TBLPROPERTIES " +
    "('graft.rowTracking'='true') through the DSv2 catalog; DESCRIBE " +
    "DETAIL reports it; disabling is refused") {
    val s0 = SparkTestBase.spark
    graft.sources.TxLogSqlDml.ensureInjected(s0)
    val s = s0.newSession()
    s.conf.set("spark.sql.catalog.grt", "graft.sources.TxLogCatalog")
    s.conf.set("spark.sql.catalog.grt.warehouse", "/tmp/graft_txrid/wh")
    s.sql("CREATE NAMESPACE IF NOT EXISTS grt.lake")
    s.sql("DROP TABLE IF EXISTS grt.lake.t")
    s.sql("CREATE TABLE grt.lake.t (k INT, v INT) " +
      "USING graft.sources.TxLogSource")
    s.sql("INSERT INTO grt.lake.t SELECT cast(id AS INT), " +
      "cast(id * 2 AS INT) FROM range(50)")
    s.sql("ALTER TABLE grt.lake.t " +
      "SET TBLPROPERTIES ('graft.rowTracking'='true')")
    val base = "/tmp/graft_txrid/wh/lake/t"
    assert(TxLog.rowTracked(spark, base))
    assert(TxLog.readWithRowIds(spark, base)
      .select("_row_id").distinct().count() == 50)
    val det = s.sql("DESCRIBE DETAIL grt.lake.t").head()
    assert(det.getAs[Boolean]("row_tracking"), det.toString)
    val off = scala.util.Try(s.sql("ALTER TABLE grt.lake.t " +
      "SET TBLPROPERTIES ('graft.rowTracking'='false')"))
    assert(off.isFailure, "disabling row tracking must be refused")
    s.sql("DROP TABLE grt.lake.t")
  }

  test("ids SURVIVE the rewrites: OPTIMIZE bin-pack, ZORDER re-tile " +
    "and COW UPDATE all materialize them — every row keeps its id " +
    "for the table's whole life") {
    val base = "/tmp/graft_txrid/rewrite"
    TxLog.drop(spark, base)
    import spark.implicits._
    // several small files so compaction genuinely folds
    (0 to 3).foreach(b => TxLog.append(
      (1 to 25).map(i => (b * 25 + i, (b * 25 + i) * 10, i % 7))
        .toDF("k", "v", "g").coalesce(1),
      base, Some("k")))
    TxLog.enableRowTracking(spark, base)
    val before = idsByKey(base)
    assert(before.size == 100)
    // OPTIMIZE folds all four files into one
    TxLog.compact(spark, base, 1000L, 100000L)
    assert(idsByKey(base) == before, "ids survive compaction")
    // ZORDER re-tiles everything
    TxLog.compactZorder(spark, base, Seq("k", "v"), 100000L, 200000L)
    assert(idsByKey(base) == before, "ids survive ZORDER")
    // COW UPDATE rewrites the touched band; ids stay put
    TxLog.updateRange(spark, base, "k", 10, 30,
      Map("v" -> (col("v") + lit(100000))))
    assert(idsByKey(base) == before, "ids survive COW UPDATE")
    val snap = TxLog.read(spark, base)
    assert(snap.where(col("k").between(10, 30) &&
      col("v") === col("k") * 10 + 100000).count() == 21)
  }

  test("a tracked COW UPDATE's change feed emits TRUE update images " +
    "keyed by _row_id: exactly the value-changed rows as " +
    "update_preimage/update_postimage pairs — unchanged rows that " +
    "merely moved files are NOT logical changes; replica " +
    "reconstruction by id is bit-identical") {
    val base = "/tmp/graft_txrid/cdf"
    TxLog.drop(spark, base)
    import spark.implicits._
    TxLog.commit((1 to 100).map(i => (i, i * 10)).toDF("k", "v")
      .coalesce(1), base, None, Some("k"))
    TxLog.enableRowTracking(spark, base)
    val vPre = TxLog.latestVersion(spark, base).get
    // the COW update touches the single file (100 rows) but CHANGES
    // only 11 of them
    TxLog.updateRange(spark, base, "k", 40, 50,
      Map("v" -> (col("v") + lit(1))))
    val vUpd = TxLog.latestVersion(spark, base).get
    assert(TxLog.cdfOpOf(spark, base, vUpd).contains("update_cow"))
    val feed = TxLog.changesWithDeletes(spark, base, vPre, vUpd)
    val byType = feed.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("update_preimage" -> 11L,
      "update_postimage" -> 11L),
      s"only the 11 changed rows appear: $byType")
    // pre/post pair by the stable id, values transform as the UPDATE
    val pre = feed.where(col("_change_type") === "update_preimage")
      .select(col("_row_id"), col("k"), col("v").as("v_pre"))
    val post = feed.where(col("_change_type") === "update_postimage")
      .select(col("_row_id"), col("v").as("v_post"))
    val paired = pre.join(post, "_row_id")
    assert(paired.count() == 11)
    assert(paired.where(col("v_post") === col("v_pre") + 1).count() == 11)
    assert(paired.where(col("k").between(40, 50)).count() == 11)
    // replica law: applying the images by id reconstructs the table
    val snapPre = TxLog.readVersionWithRowIds(spark, base, vPre)
    val replica = snapPre.join(
        post.withColumnRenamed("v_post", "v_new"), Seq("_row_id"), "left")
      .select(col("k"),
        coalesce(col("v_new"), col("v")).as("v"))
    val now = TxLog.read(spark, base).select("k", "v")
    assert(replica.exceptAll(now).isEmpty && now.exceptAll(replica).isEmpty,
      "image application by _row_id reconstructs the snapshot")
  }
}
