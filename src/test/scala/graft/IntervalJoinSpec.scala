package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{IntervalIndex, IntervalJoinStrategy}

import scala.collection.mutable.ArrayBuffer

/** The custom planner rung (builder brief ladder (c)):
  * IntervalJoinStrategy + BroadcastIntervalJoinExec. The load-bearing
  * laws: the custom plan computes EXACTLY what Spark's default
  * nested-loop plan computes (bit-identical rows), it actually
  * replaces the nested loop in the executed plan, and the interval
  * tree agrees with brute force on adversarial seeded data. */
class IntervalJoinSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  /** Points 0..199 at stride 7, intervals [k*50, k*50+30] — overlap
    * boundaries, nesting, and gaps. */
  private def points: DataFrame =
    (0 until 200).map(i => (i.toLong, i.toLong * 7)).toDF("pid", "p")
  private def intervals: DataFrame =
    (0 until 30).map(k => (k.toLong, k.toLong * 50, k.toLong * 50 + 30))
      .toDF("iid", "lo", "hi")

  private def withDefaultPlanner[A](body: => A): A = {
    val saved = spark.experimental.extraStrategies
    spark.experimental.extraStrategies = Nil
    try body finally spark.experimental.extraStrategies = saved
  }

  private def joined: DataFrame =
    points.join(broadcast(intervals),
        col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").orderBy("pid", "iid")

  test("strategy plans BroadcastIntervalJoin and matches the default planner") {
    IntervalJoinStrategy.install(spark)
    val custom = joined
    val got = custom.collect()
    val plan = custom.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastIntervalJoin"),
      s"custom exec missing from plan:\n$plan")
    val expected = withDefaultPlanner {
      val df = joined
      val rows = df.collect()
      val base = df.queryExecution.executedPlan.toString
      assert(base.contains("BroadcastNestedLoopJoin") &&
        !base.contains("BroadcastIntervalJoin"),
        s"premise broken — default planner no longer nested-loops this:\n$base")
      rows
    }
    assert(got.toSeq == expected.toSeq)
    assert(got.nonEmpty)
  }

  test("strict bounds and residual conjuncts match the default planner") {
    IntervalJoinStrategy.install(spark)
    def q: DataFrame =
      points.join(broadcast(intervals),
          col("p") > col("lo") && col("p") < col("hi") &&
            (col("pid") + col("iid")) % 3 =!= 0)
        .select("pid", "iid").orderBy("pid", "iid")
    val custom = q
    val got = custom.collect()
    assert(custom.queryExecution.executedPlan.toString
      .contains("BroadcastIntervalJoin"))
    val expected = withDefaultPlanner(q.collect())
    assert(got.toSeq == expected.toSeq)
    assert(got.nonEmpty)
  }

  test("null probe points and null bounds produce no matches (inner semantics)") {
    IntervalJoinStrategy.install(spark)
    val p = Seq((1L, Some(10L)), (2L, None), (3L, Some(60L)))
      .toDF("pid", "p")
    val iv = Seq((1L, Some(0L), Some(20L)), (2L, None, Some(100L)),
        (3L, Some(50L), None))
      .toDF("iid", "lo", "hi")
    def q: DataFrame = p.join(broadcast(iv),
        col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").orderBy("pid", "iid")
    val custom = q
    val got = custom.collect()
    assert(custom.queryExecution.executedPlan.toString
      .contains("BroadcastIntervalJoin"))
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 1L)))
    assert(withDefaultPlanner(q.collect()).toSeq == got.toSeq)
  }

  test("build side with no valid intervals yields empty result") {
    IntervalJoinStrategy.install(spark)
    // A statically-empty build side is collapsed by
    // PropagateEmptyRelation before planning (correct — the optimizer
    // should win that one); the exec's own empty-index path needs a
    // NON-empty relation whose every interval is invalid: null bounds
    // are dropped at build time, inverted bounds never match.
    val iv = Seq((1L, None: Option[Long], Some(100L)),
        (2L, Some(50L), None: Option[Long]), (3L, Some(90L), Some(10L)))
      .toDF("iid", "lo", "hi")
    val q = points.join(broadcast(iv),
        col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid")
    assert(q.queryExecution.executedPlan.toString
      .contains("BroadcastIntervalJoin"))
    assert(q.count() == 0)
  }

  test("left outer: matches the default planner, unmatched probes null-pad") {
    IntervalJoinStrategy.install(spark)
    def q: DataFrame =
      points.join(broadcast(intervals),
          col("p") >= col("lo") && col("p") <= col("hi"), "left_outer")
        .select(col("pid"), col("iid")).orderBy("pid", "iid")
    val custom = q
    val got = custom.collect()
    assert(custom.queryExecution.executedPlan.toString
      .contains("BroadcastIntervalJoin"))
    val expected = withDefaultPlanner(q.collect())
    assert(got.toSeq == expected.toSeq)
    // gaps exist by construction (stride-7 points, width-30 intervals
    // every 50): some rows must be null-padded, some matched
    assert(got.exists(_.isNullAt(1)) && got.exists(!_.isNullAt(1)))
  }

  test("left outer: residual is ON-clause — failing residual null-pads instead of dropping") {
    IntervalJoinStrategy.install(spark)
    def q: DataFrame =
      points.join(broadcast(intervals),
          col("p") >= col("lo") && col("p") <= col("hi") &&
            (col("iid") % 2 === 0), "left_outer")
        .select(col("pid"), col("iid")).orderBy("pid", "iid")
    val custom = q
    val got = custom.collect()
    assert(custom.queryExecution.executedPlan.toString
      .contains("BroadcastIntervalJoin"))
    assert(got.toSeq == withDefaultPlanner(q.collect()).toSeq)
    // a point inside ONLY an odd interval survives with null iid —
    // the row count never drops below |points|
    assert(got.length >= 200)
  }

  test("left outer: empty/invalid build side emits every probe row null-padded") {
    IntervalJoinStrategy.install(spark)
    val iv = Seq((1L, None: Option[Long], Some(100L)),
        (2L, Some(90L), Some(10L)))
      .toDF("iid", "lo", "hi")
    val q = points.join(broadcast(iv),
        col("p") >= col("lo") && col("p") <= col("hi"), "left_outer")
      .select("pid", "iid")
    assert(q.queryExecution.executedPlan.toString
      .contains("BroadcastIntervalJoin"))
    assert(q.count() == 200 && q.where(col("iid").isNotNull).count() == 0)
  }

  test("left semi and left anti: match the default planner and partition the probe side") {
    IntervalJoinStrategy.install(spark)
    def semi: DataFrame = points.join(broadcast(intervals),
        col("p") >= col("lo") && col("p") <= col("hi"), "left_semi")
      .orderBy("pid")
    def anti: DataFrame = points.join(broadcast(intervals),
        col("p") >= col("lo") && col("p") <= col("hi"), "left_anti")
      .orderBy("pid")
    val s = semi
    val a = anti
    val sGot = s.collect()
    val aGot = a.collect()
    assert(s.queryExecution.executedPlan.toString.contains("BroadcastIntervalJoin"))
    assert(a.queryExecution.executedPlan.toString.contains("BroadcastIntervalJoin"))
    assert(sGot.toSeq == withDefaultPlanner(semi.collect()).toSeq)
    assert(aGot.toSeq == withDefaultPlanner(anti.collect()).toSeq)
    // semi ∪ anti = all probes, disjoint; both sides non-trivial
    assert(sGot.length + aGot.length == 200)
    assert(sGot.nonEmpty && aGot.nonEmpty)
  }

  test("left anti with null probe points keeps them (null condition = non-match)") {
    IntervalJoinStrategy.install(spark)
    // p=1031 falls in the gap after interval [1000, 1030]
    val p = Seq((1L, Some(10L)), (2L, None), (3L, Some(1031L)))
      .toDF("pid", "p")
    def q(tp: String): DataFrame = p.join(broadcast(intervals),
        col("p") >= col("lo") && col("p") <= col("hi"), tp)
      .select("pid").orderBy("pid")
    val anti = q("left_anti")
    assert(anti.queryExecution.executedPlan.toString
      .contains("BroadcastIntervalJoin"))
    assert(anti.collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
    assert(q("left_semi").collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(withDefaultPlanner(q("left_anti").collect().map(_.getLong(0)).toSeq)
      == Seq(2L, 3L))
  }

  test("timestamp points plan through the interval exec and match the default planner") {
    IntervalJoinStrategy.install(spark)
    // the natural authoring: ts BETWEEN w_start AND w_end on real
    // timestamps — no manual unix_micros cast required
    // events every 10 minutes from 2024-01-01T00:00Z
    val ev = (0 until 300).map(i =>
        (i.toLong, new java.sql.Timestamp(1704067200000L + i * 600000L)))
      .toDF("eid", "ts")
    val win = (0 until 10).map(k =>
        (k.toLong, new java.sql.Timestamp(1704067200000L + k * 18000000L),
          new java.sql.Timestamp(1704067200000L + k * 18000000L + 7200000L)))
      .toDF("wid", "w_start", "w_end")
    def q: DataFrame = ev.join(broadcast(win),
        col("ts") >= col("w_start") && col("ts") <= col("w_end"))
      .select("eid", "wid").orderBy("eid", "wid")
    val custom = q
    val got = custom.collect()
    assert(custom.queryExecution.executedPlan.toString
      .contains("BroadcastIntervalJoin"),
      s"timestamp points missed the strategy:\n${custom.queryExecution.executedPlan}")
    assert(got.toSeq == withDefaultPlanner(q.collect()).toSeq)
    assert(got.nonEmpty)
  }

  test("scope guards: equi-conjunct joins and literal-bound filters are left to Spark") {
    IntervalJoinStrategy.install(spark)
    // equi key + range: the hash join on the key is strictly better —
    // the strategy must not demote it to an interval probe
    val ev = points.withColumn("pk", col("pid") % 5)
    val win = intervals.withColumn("wk", col("iid") % 5)
    val equi = ev.join(broadcast(win),
        col("pk") === col("wk") && col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid")
    val ep = equi.queryExecution.executedPlan.toString
    assert(!ep.contains("BroadcastIntervalJoin"),
      s"equi-join was demoted to interval probing:\n$ep")
    assert(ep.contains("BroadcastHashJoin"), s"expected hash join:\n$ep")
    // literal bounds are a filter, not a join bound — no pattern match
    val litBound = points.join(broadcast(intervals),
        col("p") >= lit(0L) && col("p") <= lit(100L) && col("pid") === col("iid"))
      .select("pid", "iid")
    val lp = litBound.queryExecution.executedPlan.toString
    assert(!lp.contains("BroadcastIntervalJoin"),
      s"literal-bounds join wrongly matched the interval pattern:\n$lp")
    // null-safe equality (<=>) is hash-joinable too — same bail-out
    val nullSafe = ev.join(broadcast(win),
        col("pk") <=> col("wk") && col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid")
    val np = nullSafe.queryExecution.executedPlan.toString
    assert(!np.contains("BroadcastIntervalJoin"),
      s"null-safe equi-join was demoted to interval probing:\n$np")
  }

  test("interval tree law: agrees with brute force on seeded adversarial data") {
    val rnd = new scala.util.Random(42)
    val entries = Array.tabulate(500) { i =>
      val lo = rnd.nextLong() % 10000
      val len = math.abs(rnd.nextLong() % 200)
      IntervalIndex.Entry(lo, lo + len, InternalRow(i))
    }
    val tree = IntervalIndex.build(entries)
    val probes = Array.tabulate(2000)(_ => rnd.nextLong() % 11000) ++
      entries.flatMap(e => Array(e.lo, e.hi, e.lo - 1, e.hi + 1))
    probes.foreach { t =>
      val buf = new ArrayBuffer[InternalRow]()
      tree.query(t, buf)
      val got = buf.map(_.getInt(0)).sorted
      val want = entries.filter(e => e.lo <= t && t <= e.hi)
        .map(_.row.getInt(0)).sorted.toBuffer
      assert(got == want, s"probe $t: tree=$got brute=$want")
    }
  }

  test("j20 registry query runs through the custom operator") {
    val df = SparkEntry.queries("j20_interval_tree_join")(spark, sfDir)
    val n = df.count()
    assert(n > 0)
    assert(df.queryExecution.executedPlan.toString
      .contains("BroadcastIntervalJoin"))
  }
}
