package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SessionTimers
import graft.streaming.SessionTimers.PendingSession

/** Laws for the event-time-timer sessionization
  * (transformWithState + handleExpiredTimer). The pure merge is
  * property-checked directly; the end-to-end run must agree with the
  * builtin session_window witness — one contract, two
  * implementations. */
class SessionTimersSpec extends AnyFunSuite {
  import SparkTestBase._

  private val gap = 1800000000L // 30 min in micros

  private def merge(existing: Seq[PendingSession], ev: Seq[Long]) =
    SessionTimers.mergeAll(existing, ev, gap)

  test("mergeAll: singleton events become sessions; in-gap events merge; gap boundary splits") {
    val out = merge(Nil, Seq(0L, gap - 1, 3 * gap))
    // 0 and gap-1 merge (diff < gap); 3*gap starts a new session
    assert(out == Seq(PendingSession(0L, gap - 1, 2L),
      PendingSession(3 * gap, 3 * gap, 1L)))
    // an event exactly `gap` after the last does NOT merge — the
    // oracle's `diff >= gap` break rule
    val boundary = merge(Nil, Seq(0L, gap))
    assert(boundary == Seq(PendingSession(0L, 0L, 1L),
      PendingSession(gap, gap, 1L)))
  }

  test("mergeAll: new rows merge with existing pending sessions, counts add") {
    val existing = Seq(PendingSession(0L, 1000L, 5L))
    val out = merge(existing, Seq(1000L + gap - 1, 1000L + 3 * gap))
    assert(out == Seq(PendingSession(0L, 1000L + gap - 1, 6L),
      PendingSession(1000L + 3 * gap, 1000L + 3 * gap, 1L)))
  }

  test("mergeAll: chained events collapse transitively and order-independently") {
    val ev = Seq(5 * gap, 0L, gap / 2, gap, 2 * gap - 1)
    val out = merge(Nil, ev)
    assert(out == Seq(PendingSession(0L, 2 * gap - 1, 4L),
      PendingSession(5 * gap, 5 * gap, 1L)))
    assert(merge(Nil, ev.reverse) == out)
  }

  test("timer sessions agree with the builtin session_window witness") {
    val timer = SparkEntry.queries("stream_timer_sessions")(spark, sfDir)
    val builtin = SparkEntry.queries("stream_session_window")(spark, sfDir)
    val cols = Seq("user_id", "session_start_us", "session_end_us", "n_events")
      .map(col)
    val a = timer.select(cols: _*)
    val b = builtin.select(cols: _*)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.count() > 0)
  }
}
