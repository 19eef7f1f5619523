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

  test("property: any batch split merges to the same sessions as one batch (cross-batch law)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // Event times clustered enough that merges actually happen; the
    // law is what makes cross-micro-batch sessionization correct:
    // folding batches through the state one at a time must equal
    // sessionizing the union (holds unconditionally because no
    // session is finalized between batches in the pure merge).
    val times = Gen.listOf(Gen.chooseNum(0L, 20L).map(_ * (gap / 2)))
    val prop = Prop.forAll(times, Gen.chooseNum(0, 1000)) { (ts, cut) =>
      val (a, b) = ts.splitAt(if (ts.isEmpty) 0 else cut % (ts.length + 1))
      val sequential = merge(merge(Nil, a), b)
      val oneShot = merge(Nil, ts)
      sequential == oneShot
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, s"cross-batch law: $res")
  }

  test("property: sessions partition the events — counts sum, gaps only between sessions") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val times = Gen.nonEmptyListOf(Gen.chooseNum(0L, 50L).map(_ * (gap / 3)))
    val prop = Prop.forAll(times) { ts =>
      val out = merge(Nil, ts)
      val sorted = out.sortBy(_.start_us)
      val countsOk = sorted.map(_.n).sum == ts.length.toLong
      val ordered = sorted.forall(p => p.start_us <= p.last_us)
      val gapped = sorted.sliding(2).forall {
        case Seq(x, y) => y.start_us - x.last_us >= gap
        case _ => true
      }
      countsOk && ordered && gapped
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, s"partition law: $res")
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
