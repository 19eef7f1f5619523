package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{AsOf, RangeJoin}

class AsOfRangeSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of join: inclusive match, max-id tiebreak, null when nothing precedes") {
    val left = Seq(
      (10L, ts("2024-01-01 10:00:00"), 1L), // equal-ts right rows visible
      (11L, ts("2024-01-01 09:00:00"), 1L), // before all right rows -> NULL
      (12L, ts("2024-01-02 00:00:00"), 1L)  // after everything -> latest right
    ).toDF("event_id", "ts", "user_id")
    val right = Seq(
      (100L, ts("2024-01-01 10:00:00"), 1L), // tie at 10:00 with 101
      (101L, ts("2024-01-01 10:00:00"), 1L),
      (102L, ts("2024-01-01 12:00:00"), 1L),
      (200L, ts("2024-01-01 08:00:00"), 2L)  // other key, never matches
    ).toDF("event_id", "ts", "user_id")
    val out = AsOf.lastBefore(left, right, "user_id", "ts", "event_id", "ts", "event_id")
      .orderBy("event_id")
      .select("event_id", "asof_event_id").collect()
    assert(out(0).getLong(0) == 10L && out(0).getLong(1) == 101L) // inclusive + max id
    assert(out(1).getLong(0) == 11L && out(1).isNullAt(1))
    assert(out(2).getLong(0) == 12L && out(2).getLong(1) == 102L)
  }

  test("range join: boundary inclusive at tol, exclusive beyond, key-scoped") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 7L)).toDF("event_id", "ts", "user_id")
    val right = Seq(
      (20L, ts("2024-01-01 10:10:00"), 7L), // exactly +600s -> in
      (21L, ts("2024-01-01 10:10:01"), 7L), // +601s -> out
      (22L, ts("2024-01-01 09:50:00"), 7L), // exactly -600s -> in
      (23L, ts("2024-01-01 10:05:00"), 8L)  // other key -> out
    ).toDF("event_id", "ts", "user_id")
    val out = RangeJoin.withinTolerance(left, right, "user_id",
        "ts", "event_id", "ts", "event_id", tolSeconds = 600L)
      .select("right_id").as[Long].collect().toSet
    assert(out == Set(20L, 22L))
  }
}
