package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TxLog

/** Law for the footer-harvested stats fast path (optimization r15):
  * whatever path collected them — parquet footer metadata or the
  * scan-back aggregate — a commit's manifest stats must be BYTE-EQUAL
  * to the scan definition `min(cast(col AS castType)).cast(string)` /
  * `max(...)`, per file, for every dtype in the stats matrix and for
  * the shapes that force the fallback (NaN / signed-zero doubles,
  * INT96 timestamps, all-NULL columns). Readers compare these strings
  * (pruning soundness) and witnesses expose them (DESCRIBE DETAIL),
  * so parity is exactness, not just soundness. */
class TxFooterStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def castType(dtype: String): String = dtype match {
    case "long" => "long"; case "double" => "double"; case _ => "string"
  }

  /** Recompute one landed file's stats THE SCAN WAY and compare with
    * the manifest entry. */
  private def assertParity(base: String, statsCols: Seq[(String, String)],
                           v: Long = 1L): Unit = {
    val (entries, _) = TxLog.manifest(spark, base, v)
    assert(entries.nonEmpty)
    entries.foreach { e =>
      val raw = spark.read.parquet(s"$base/${e.path}")
      val aggs = count(lit(1)).as("__rows") +: statsCols.flatMap {
        case (c, t) =>
          Seq(min(col(c).cast(castType(t))).cast("string"),
            max(col(c).cast(castType(t))).cast("string"))
      }
      val r = raw.agg(aggs.head, aggs.tail: _*).collect()(0)
      assert(e.rows == r.getLong(0), s"${e.path}: row count")
      statsCols.zipWithIndex.foreach { case ((c, t), i) =>
        val (mn, mx) = (Option(r.getString(1 + 2 * i)),
          Option(r.getString(2 + 2 * i)))
        val st = e.statsFor(c)
        assert(st.map(_.min) == mn && st.map(_.max) == mx,
          s"${e.path} '$c': manifest ${st.map(s => (s.min, s.max))} " +
            s"vs scan ($mn, $mx)")
        st.foreach(s => assert(s.dtype == t, s"'$c' dtype"))
      }
    }
  }

  test("long stats (negatives, multi-file) match the scan rendering") {
    import spark.implicits._
    val base = "/tmp/graft_fstats/longs"
    TxLog.drop(spark, base)
    val df = Seq(-500L, -1L, 0L, 7L, 123456789L, 42L)
      .toDF("k").repartition(3)
    TxLog.commit(df, base, None, Some("k"))
    assertParity(base, Seq("k" -> "long"))
  }

  test("int/short columns widen to long stats like the scan") {
    import spark.implicits._
    val base = "/tmp/graft_fstats/ints"
    TxLog.drop(spark, base)
    val df = Seq((-3, 1.toShort), (9, 200.toShort)).toDF("i", "s")
    TxLog.commitMulti(df, base, None, Seq("i", "s"))
    assertParity(base, Seq("i" -> "long", "s" -> "long"))
  }

  test("double and float stats render exactly (scientific notation)") {
    import spark.implicits._
    val base = "/tmp/graft_fstats/dbls"
    TxLog.drop(spark, base)
    val df = Seq((1e-4, 1.1f), (-1.5, 2.5f), (123456.789, 0.25f))
      .toDF("d", "f")
    TxLog.commitMulti(df, base, None, Seq("d", "f"))
    assertParity(base, Seq("d" -> "double", "f" -> "double"))
  }

  test("NaN and signed-zero doubles still match (fallback shapes)") {
    import spark.implicits._
    val base = "/tmp/graft_fstats/nan"
    TxLog.drop(spark, base)
    TxLog.commit(Seq(Double.NaN, 1.0, -2.0).toDF("d"), base, None, Some("d"))
    assertParity(base, Seq("d" -> "double"))
    val base2 = "/tmp/graft_fstats/zeros"
    TxLog.drop(spark, base2)
    TxLog.commit(Seq(-0.0d, 0.0d, 3.0d).toDF("d"), base2, None, Some("d"))
    assertParity(base2, Seq("d" -> "double"))
  }

  test("string stats: unicode, empty string, unsigned byte order") {
    import spark.implicits._
    val base = "/tmp/graft_fstats/strs"
    TxLog.drop(spark, base)
    val df = Seq("", "z", "ä", "thỏa thuận", "ZZ", "😀").toDF("s")
    TxLog.commit(df, base, None, Some("s"))
    assertParity(base, Seq("s" -> "string"))
  }

  test("date stats render as the scan's ISO strings") {
    val base = "/tmp/graft_fstats/dates"
    TxLog.drop(spark, base)
    val df = spark.sql(
      "SELECT cast(d AS date) AS d FROM VALUES ('1969-12-01'), " +
        "('2026-08-19'), ('2001-01-01') t(d)")
    TxLog.commit(df, base, None, Some("d"))
    assertParity(base, Seq("d" -> "date"))
  }

  test("timestamp stats (INT96 files) floor to epoch seconds") {
    val base = "/tmp/graft_fstats/ts"
    TxLog.drop(spark, base)
    val df = spark.sql(
      "SELECT cast(t AS timestamp) AS ts FROM VALUES " +
        "('1969-12-31 23:59:59.5'), ('2026-08-19 01:02:03.999999'), " +
        "('2000-01-01 00:00:00') t(t)")
    TxLog.commit(df, base, None, Some("ts"))
    assertParity(base, Seq("ts" -> "long"))
  }

  test("all-NULL column carries no stats; sibling column still does") {
    import spark.implicits._
    val base = "/tmp/graft_fstats/nulls"
    TxLog.drop(spark, base)
    val df = Seq((1L, None: Option[String]), (2L, None))
      .toDF("k", "s")
    TxLog.commitMulti(df, base, None, Seq("k", "s"))
    val (entries, _) = TxLog.manifest(spark, base, 1L)
    entries.foreach { e =>
      assert(e.statsFor("s").isEmpty, "all-NULL column must carry no stats")
      assert(e.statsFor("k").nonEmpty)
    }
    assertParity(base, Seq("k" -> "long"))
  }

  test("nested struct leaf stats match the scan") {
    val base = "/tmp/graft_fstats/nested"
    TxLog.drop(spark, base)
    val df = spark.sql(
      "SELECT named_struct('x', x, 'y', y) AS s, x AS top FROM VALUES " +
        "(-7L, 'a'), (99L, 'b') t(x, y)")
    TxLog.commitMulti(df, base, None, Seq("s.x"))
    assertParity(base, Seq("s.x" -> "long"))
  }
}
