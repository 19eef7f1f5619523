package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TxLog

/** In-commit timestamps (Delta 4.0 ICT): every commit WRITES its own
  * wall-clock stamp as a `#ict` manifest line, clamped strictly above
  * the parent's — so `TIMESTAMP AS OF` resolution is a property of
  * the LOG, robust to anything that rewrites file mtimes (a table
  * copy, a backup restore, a storage migration). Pre-ICT versions
  * fall back to the manifest mtime, Delta's identical mixed-history
  * rule. */
class TxLogIctSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def mk(base: String, n: Int): Seq[Long] = {
    TxLog.drop(spark, base)
    import spark.implicits._
    (1 to n).map { i =>
      TxLog.append(Seq((i, i * 10)).toDF("k", "v"), base, Some("k"))
    }
  }

  test("every commit stamps a strictly increasing in-commit " +
    "timestamp; commitTimestamp serves it; history() reports it") {
    val base = "/tmp/graft_txict/mono"
    val vs = mk(base, 5) // rapid commits: wall-clock millis collide
    val icts = vs.map(v => TxLog.ictOf(spark, base, v)
      .getOrElse(fail(s"version $v must carry #ict")))
    icts.sliding(2).foreach { case Seq(a, b) =>
      assert(a < b, "stamps must STRICTLY increase (parent clamp)") }
    vs.foreach(v => assert(
      TxLog.commitTimestamp(spark, base, v) == TxLog.ictOf(spark, base, v).get))
    val hist = TxLog.history(spark, base)
      .select("version", "timestamp_ms").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    vs.foreach(v => assert(hist(v) == TxLog.ictOf(spark, base, v).get,
      "DESCRIBE HISTORY serves the in-commit stamp"))
  }

  test("TIMESTAMP AS OF resolves by the in-commit stamp: exact stamp " +
    "hits the version, stamp-1 hits its parent, before-first errors") {
    val base = "/tmp/graft_txict/bounds"
    val vs = mk(base, 3)
    val icts = vs.map(TxLog.ictOf(spark, base, _).get)
    vs.zip(icts).foreach { case (v, t) =>
      assert(TxLog.versionAtTimestamp(spark, base, t) == v)
      assert(TxLog.versionAtTimestamp(spark, base, t + 1) == v ||
        icts.contains(t + 1)) // +1 may be the next commit's stamp
    }
    assert(TxLog.versionAtTimestamp(spark, base, icts(1) - 1) == vs(0))
    val e = intercept[IllegalArgumentException](
      TxLog.versionAtTimestamp(spark, base, icts.head - 1))
    assert(e.getMessage.contains("before the earliest"))
  }

  test("THE point of ICT: a table copy rewrites every manifest mtime " +
    "— TIMESTAMP AS OF still resolves identically, because the " +
    "stamps live in the log") {
    val base = "/tmp/graft_txict/orig"
    val copy = "/tmp/graft_txict/copy"
    val vs = mk(base, 3)
    val icts = vs.map(TxLog.ictOf(spark, base, _).get)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(copy))
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(base), new java.io.File(copy))
    // simulate the migration's clock damage explicitly: every copied
    // manifest's mtime moves to one far-future instant
    val far = System.currentTimeMillis() + 86400000L
    Files.list(Paths.get(s"$copy/${TxLog.LogDir}")).forEach(p =>
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(far)))
    TxLog.cachePurge(copy)
    vs.zip(icts).foreach { case (v, t) =>
      assert(TxLog.versionAtTimestamp(spark, copy, t) == v,
        s"the copy must resolve version $v at its original stamp") }
    assert(TxLog.read(spark, copy).count() == 3)
  }

  test("mixed history (pre-ICT versions): stripped #ict lines fall " +
    "back to the manifest mtime, and resolution works across the " +
    "seam; setCommitTime re-stamps BOTH clocks") {
    val base = "/tmp/graft_txict/mixed"
    val vs = mk(base, 3)
    val icts = vs.map(TxLog.ictOf(spark, base, _).get)
    // make v1 and v2 legacy: strip their #ict lines, pin their mtimes
    // at the original stamps (a real pre-ICT history's mtimes are the
    // commit instants)
    vs.take(2).zip(icts).foreach { case (v, t) =>
      import scala.jdk.CollectionConverters._
      val p = Paths.get(f"$base/${TxLog.LogDir}/v$v%020d.txt")
      val kept = Files.readAllLines(p).asScala.toSeq
        .filterNot(_.startsWith("#ict\t"))
      Files.write(p, (kept.mkString("\n") + "\n").getBytes("UTF-8"))
      // drop the checksum sidecar the in-place rewrite invalidated
      Files.deleteIfExists(
        Paths.get(f"$base/${TxLog.LogDir}/.v$v%020d.txt.crc"))
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(t))
    }
    TxLog.cachePurge(base)
    assert(TxLog.ictOf(spark, base, vs(0)).isEmpty)
    assert(TxLog.ictOf(spark, base, vs(2)).isDefined)
    vs.zip(icts).foreach { case (v, t) =>
      assert(TxLog.versionAtTimestamp(spark, base, t) == v,
        s"mixed resolution must still hit version $v") }
    // the administration verb moves the resolution instant of an
    // ICT-stamped version (it rewrites the line, not just the mtime)
    val pinned = icts(2) + 600000L
    TxLog.setCommitTime(spark, base, vs(2), pinned)
    assert(TxLog.ictOf(spark, base, vs(2)).contains(pinned))
    assert(TxLog.versionAtTimestamp(spark, base, pinned) == vs(2))
    assert(TxLog.versionAtTimestamp(spark, base, pinned - 1) == vs(1))
  }

  test("table_changes timestamp bounds: the START is the CEILING " +
    "(first commit >= ts — floor would leak earlier changes), the " +
    "END is the floor, and a start before v1 clamps to everything") {
    val base = "/tmp/graft_txict/tvf_bounds"
    TxLog.drop(spark, base)
    import spark.implicits._
    TxLog.append(Seq((1, 10)).toDF("k", "v"), base, Some("k"))
    TxLog.append(Seq((2, 20)).toDF("k", "v"), base, Some("k"))
    TxLog.append(Seq((3, 30)).toDF("k", "v"), base, Some("k"))
    TxLog.setCommitTime(spark, base, 1L, 1000L)
    TxLog.setCommitTime(spark, base, 2L, 2000L)
    TxLog.setCommitTime(spark, base, 3L, 3000L)
    TxLog.cachePurge(base)
    graft.sources.TxLogSqlDml.ensureInjected(spark)
    val s = spark.newSession()
    org.apache.spark.sql.graftbridge.ColumnBridge.registerTableFunction(
      s, graft.GraftExtensions.tableChangesFunction)
    s.sql("DROP TABLE IF EXISTS txict_tvf_w")
    s.sql("CREATE TABLE txict_tvf_w USING graft.sources.TxLogSource " +
      s"OPTIONS (path '$base')")
    try {
      def n(q: String): Long =
        s.sql(s"SELECT count(*) AS n FROM $q").head.getLong(0)
      // start at 2500 (between v2@2000 and v3@3000): ceiling = v3 —
      // floor semantics would wrongly include v2's change
      assert(n("table_changes('txict_tvf_w', '2500')") == 1L)
      // start exactly AT a stamp includes that commit
      assert(n("table_changes('txict_tvf_w', '2000')") == 2L)
      // start before the first commit serves the whole feed
      assert(n("table_changes('txict_tvf_w', '500')") == 3L)
      // the END bound is the floor: [v1, floor(2500)=v2]
      assert(n("table_changes('txict_tvf_w', 1, '2500')") == 2L)
      // a start INSTANT after the last commit asks for changes none
      // of which exist yet: an EMPTY feed under the full CDF schema
      // — not a misleading 'outside the committed range' error
      assert(n("table_changes('txict_tvf_w', '9999')") == 0L)
      val cols = s.sql("SELECT * FROM table_changes('txict_tvf_w', " +
        "'9999')").columns.toSet
      assert(Set("_change_type", "_commit_version", "_commit_timestamp")
        .subsetOf(cols), s"empty feed keeps the CDF surface, got $cols")
      // the VERSION spelling of the same overshoot stays an error: a
      // version number names a commit that must exist
      val e = intercept[Exception] {
        n("table_changes('txict_tvf_w', 99)") }
      assert(e.getMessage.contains("outside the committed range"))
    } finally s.sql("DROP TABLE IF EXISTS txict_tvf_w")
  }
}
