package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TxLog

/** VACUUM LITE (Delta 3.3's log-driven vacuum): reclaim from the LOG
  * alone — dropped versions' references minus kept liveness — with
  * zero data-tree listing. The laws pin the reclaim set (rewritten
  * files go, live and cloned-in files stay), resolvability after the
  * drop (checkpoint materialization), and the documented orphan
  * tradeoff against the full vacuum. */
class TxLogVacuumLiteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def dataFiles(base: String): Set[String] = {
    val f = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = f.listFiles(new org.apache.hadoop.fs.Path(base), true)
    val out = scala.collection.mutable.Set.empty[String]
    while (it.hasNext) {
      val st = it.next()
      if (st.getPath.getName.endsWith(".parquet")) out += st.getPath.toString
    }
    out.toSet
  }

  test("reclaims exactly the files only dropped versions reference " +
    "(an OPTIMIZE's superseded inputs), keeps the live set, and the " +
    "kept history stays resolvable via the materialized checkpoint") {
    val base = "/tmp/graft_txvlite/basic"
    TxLog.drop(spark, base)
    TxLog.commit((1 to 400).map(i => (i, s"p$i")).toDF("k", "p")
      .repartitionByRange(4, col("k")), base, None, Some("k"))
    (1 to 3).foreach(i => TxLog.append(
      ((400 + i * 10) to (409 + i * 10)).map(j => (j, s"p$j"))
        .toDF("k", "p").coalesce(1), base, Some("k")))
    TxLog.compact(spark, base, 1L << 20, 1L << 22) // supersedes inputs
    val before = dataFiles(base)
    val liveNow = TxLog.manifest(spark, base,
      TxLog.latestVersion(spark, base).get)._1
      .map(e => TxLog.resolve(base, e.path)).toSet
    assert(before.size > liveNow.size,
      "the fixture must hold superseded files to reclaim")
    val (kept, n) = TxLog.vacuumLite(spark, base, keepLast = 1)
    assert(kept.size == 1 && n == (before.size - liveNow.size),
      s"reclaim exactly the superseded set: kept=$kept n=$n " +
        s"expected=${before.size - liveNow.size}")
    assert(dataFiles(base).map(_.stripPrefix("file:")) ==
      liveNow.map(_.stripPrefix("file:")),
      "only the live files survive")
    // content intact, history below the cut gone
    assert(TxLog.read(spark, base).count() == 430)
    intercept[Exception] { TxLog.readVersion(spark, base, 1L).count() }
  }

  test("a shallow clone's ABSOLUTE references are never deleted by the " +
    "clone's own LITE vacuum; orphan txn dirs are the documented " +
    "full-vacuum territory") {
    val src = "/tmp/graft_txvlite/clone_src"
    val dst = "/tmp/graft_txvlite/clone_dst"
    TxLog.drop(spark, src); TxLog.drop(spark, dst)
    TxLog.append((1 to 50).map(i => (i, i * 2)).toDF("k", "v"),
      src, Some("k"))
    TxLog.cloneShallow(spark, src, dst)
    TxLog.append((51 to 60).map(i => (i, i * 2)).toDF("k", "v"),
      dst, Some("k"))
    TxLog.compact(spark, dst, 1L << 20, 1L << 22) // local rewrite
    val (_, n) = TxLog.vacuumLite(spark, dst, keepLast = 1)
    assert(n >= 1, "the clone's own superseded local files reclaim")
    assert(TxLog.read(spark, src).count() == 50,
      "the SOURCE must be untouched by the clone's vacuum")
    assert(TxLog.read(spark, dst).count() == 60)
    // orphan tradeoff: an unreferenced dir survives LITE (no listing)
    val orphan = new org.apache.hadoop.fs.Path(s"$dst/data/orphan-test")
    val f = orphan.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(orphan)
    TxLog.vacuumLite(spark, dst, keepLast = 1)
    assert(f.exists(orphan),
      "LITE never lists the data tree — orphans are full-vacuum work")
    TxLog.vacuum(spark, dst, keepLast = 1, graceMs = 0L)
    assert(!f.exists(orphan), "the full vacuum sweeps orphans")
  }

  test("SQL: VACUUM t LITE RETAIN n VERSIONS routes through the parser " +
    "rung; GRACE/DRY RUN with LITE are rejected with guidance") {
    val base = "/tmp/graft_txvlite/sql"
    TxLog.drop(spark, base)
    TxLog.append((1 to 30).map(i => (i, i)).toDF("k", "v"), base, Some("k"))
    TxLog.append((31 to 60).map(i => (i, i)).toDF("k", "v"), base, Some("k"))
    TxLog.compact(spark, base, 1L << 20, 1L << 22)
    graft.sources.TxLogSqlDml.ensureInjected(spark)
    val s = spark.newSession()
    s.sql("DROP TABLE IF EXISTS txvlite_w")
    s.sql("CREATE TABLE txvlite_w USING graft.sources.TxLogSource " +
      s"OPTIONS (path '$base')")
    try {
      val rows = s.sql("VACUUM txvlite_w LITE RETAIN 1 VERSIONS")
        .collect()
      assert(rows.length == 1 && rows.head.getLong(1) >= 1,
        s"one surviving version with a reclaim count: ${rows.toSeq}")
      assert(TxLog.read(spark, base).count() == 60)
      val bad = intercept[Exception] {
        s.sql("VACUUM txvlite_w LITE RETAIN 1 VERSIONS DRY RUN").collect()
      }
      assert(bad.getMessage.contains("LITE"), bad.getMessage)
    } finally s.sql("DROP TABLE IF EXISTS txvlite_w")
  }
}
