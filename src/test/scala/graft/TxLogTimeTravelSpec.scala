package graft

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TxLog

/** `TIMESTAMP AS OF` time travel (VERDICT r10 next-round #4): the
  * Delta boundary rule — an instant resolves to the LATEST version
  * committed at or before it; an instant before the first commit is
  * an error; one after the last resolves to the latest version.
  * Commit times are the log files' modification times (pinned here
  * with setTimes for determinism). */
class TxLogTimeTravelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def df(rows: Seq[(Int, String)]) = {
    import spark.implicits._
    rows.toDF("k", "s")
  }

  private val T0 = 1700000000000L // fixed epoch anchor

  /** Pin version v's commit time to `ts` — the in-commit `#ict` stamp
    * (what resolution reads) plus the file mtime (the pre-ICT
    * fallback), via the administration verb. */
  private def pin(base: String, v: Long, ts: Long): Unit =
    TxLog.setCommitTime(spark, base, v, ts)

  test("boundary rule: latest version at-or-before the instant; " +
    "error before the first commit; latest after the last") {
    val base = "/tmp/graft_txtravel/basic"
    TxLog.drop(spark, base)
    TxLog.commit(df(Seq(1 -> "v1")), base, None)
    TxLog.append(df(Seq(2 -> "v2")), base)
    TxLog.append(df(Seq(3 -> "v3")), base)
    pin(base, 1L, T0); pin(base, 2L, T0 + 60000); pin(base, 3L, T0 + 120000)

    assert(TxLog.versionAtTimestamp(spark, base, T0) == 1L) // exact hit
    assert(TxLog.versionAtTimestamp(spark, base, T0 + 59999) == 1L)
    assert(TxLog.versionAtTimestamp(spark, base, T0 + 60000) == 2L)
    assert(TxLog.versionAtTimestamp(spark, base, T0 + 10_000_000) == 3L)
    intercept[IllegalArgumentException] {
      TxLog.versionAtTimestamp(spark, base, T0 - 1)
    }
    assert(TxLog.readTimestampAsOf(spark, base, T0 + 61000).count() == 2L)
  }

  test("DSv2 timestampAsOf reads the resolved snapshot and rejects " +
    "combination with versionAsOf") {
    val base = "/tmp/graft_txtravel/dsv2"
    TxLog.drop(spark, base)
    TxLog.commit(df(Seq(1 -> "v1")), base, None)
    TxLog.append(df(Seq(2 -> "v2")), base)
    pin(base, 1L, T0); pin(base, 2L, T0 + 60000)

    val asOf = spark.read.format("graft.sources.TxLogSource")
      .option("timestampAsOf", (T0 + 1000).toString).load(base)
    assert(asOf.collect().map(_.getInt(0)).toSet == Set(1))
    // ISO instant form parses too
    val iso = java.time.Instant.ofEpochMilli(T0 + 61000).toString
    val asOfIso = spark.read.format("graft.sources.TxLogSource")
      .option("timestampAsOf", iso).load(base)
    assert(asOfIso.collect().map(_.getInt(0)).toSet == Set(1, 2))
    intercept[IllegalArgumentException] {
      spark.read.format("graft.sources.TxLogSource")
        .option("timestampAsOf", T0.toString)
        .option("versionAsOf", "1").load(base).collect()
    }
  }
}
