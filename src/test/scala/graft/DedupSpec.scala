package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

class DedupSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  test("latestByKey keeps exactly one deterministic row per key on ties") {
    // Two rows with identical ts: the event_id-desc tiebreaker decides.
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 10L),
      (2L, "2024-01-01 00:00:00", 10L),
      (3L, "2023-12-31 00:00:00", 10L)
    ).toDF("event_id", "ts_s", "user_id")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val out = Dedup.latestByKey(df, Seq("user_id"),
      Seq(col("ts").desc, col("event_id").desc)).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("event_id") == 2L)
  }

  test("skew-safe dedup is row-identical to window dedup on real data") {
    val ev = Tables.load(spark, sfDir, "events")
    val a = Dedup.latestByKey(ev, Seq("user_id"),
      Seq(col("ts").desc, col("event_id").desc))
    val b = Dedup.latestByKeySkewSafe(ev, Seq("user_id"),
      struct(col("ts"), col("event_id")))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("skew-safe dedup keeps NULL-key groups like the window variant") {
    val df = Seq(
      (1L, "2024-01-01 00:00:00", Some(5L)),
      (2L, "2024-01-02 00:00:00", None: Option[Long]),
      (3L, "2024-01-03 00:00:00", None: Option[Long])
    ).toDF("event_id", "ts_s", "user_id")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val a = Dedup.latestByKey(df, Seq("user_id"),
      Seq(col("ts").desc, col("event_id").desc))
    val b = Dedup.latestByKeySkewSafe(df, Seq("user_id"),
      struct(col("ts"), col("event_id")))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(b.count() == 2) // one for user 5, one for the NULL-key group
  }

  test("content fingerprint is NULL-position-preserving (no concat_ws collapse)") {
    val df = Seq(
      (1L, Some("a"), None: Option[String]),
      (2L, None: Option[String], Some("a")),
      (3L, Some("a"), None: Option[String]) // true dup of row 1
    ).toDF("id", "x", "y")
    val out = Dedup.exactByContent(df, "id", Seq("x", "y"))
    // rows 1 and 2 must BOTH survive; row 3 collapses into row 1
    assert(out.count() == 2)
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("content fingerprint is delimiter-unambiguous") {
    val df = Seq((1L, "a b", "c"), (2L, "a", "b c")).toDF("id", "x", "y")
    assert(Dedup.exactByContent(df, "id", Seq("x", "y")).count() == 2)
  }
}
