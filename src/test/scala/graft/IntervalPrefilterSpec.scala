package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{IntervalJoinStrategy, IntervalPrefilterRule}

/** Optimizer-rule rung (VERDICT r9 next-round #3): the derived
  * min/max pre-filter on point-in-interval joins. Laws: the rule
  * injects a marked Filter with build-side scalar subqueries on
  * eligible joins only (Inner/LeftSemi, never LeftOuter/LeftAnti),
  * results stay bit-identical to the unruled plan (and to the default
  * planner with the strategy also on — the j20 guarantee), and the
  * empty-build degenerate stays empty rather than erroring. */
class IntervalPrefilterSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private def points: DataFrame =
    (0 until 400).map(i => (i.toLong, i.toLong * 7)).toDF("pid", "p")
  // intervals cover a SLIVER of the probe domain [0, 2793]: the
  // derived bounds [1000, 1160] kill ~94% of probe rows pre-join
  private def intervals: DataFrame =
    (0 until 4).map(k => (k.toLong, 1000L + k * 40, 1020L + k * 40))
      .toDF("iid", "lo", "hi")

  private def withRule[A](body: => A): A = {
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Seq(IntervalPrefilterRule)
    try body finally spark.experimental.extraOptimizations = saved
  }

  private def markers(df: DataFrame): Int = {
    val s = df.queryExecution.optimizedPlan.toString
    "graft_iv_lo".r.findAllIn(s).size
  }

  test("rule injects the marked min/max pre-filter and results are " +
    "bit-identical to the unruled plan") {
    def q: DataFrame = points.join(broadcast(intervals),
        col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").orderBy("pid", "iid")
    val expected = q.collect()
    withRule {
      val ruled = q
      assert(markers(ruled) > 0,
        s"pre-filter not injected:\n${ruled.queryExecution.optimizedPlan}")
      assert(ruled.collect().toSeq == expected.toSeq)
      assert(expected.nonEmpty)
    }
  }

  test("fixed-point safe: the rule applied to its own output injects " +
    "exactly one filter pair") {
    withRule {
      val q = points.join(broadcast(intervals),
        col("p") >= col("lo") && col("p") <= col("hi"))
      val once = q.queryExecution.optimizedPlan
      assert(IntervalPrefilterRule(once) eq once,
        "rule must be a no-op on an already-filtered plan")
      assert(markers(q) == 1, "expected exactly one marked lo-subquery")
    }
  }

  test("strict bounds keep strict pre-filter comparisons and identical " +
    "results") {
    def q: DataFrame = points.join(broadcast(intervals),
        col("p") > col("lo") && col("p") < col("hi"))
      .select("pid", "iid").orderBy("pid", "iid")
    val expected = q.collect()
    withRule {
      val ruled = q
      assert(markers(ruled) > 0)
      assert(ruled.collect().toSeq == expected.toSeq)
    }
  }

  test("LeftOuter and LeftAnti are never pre-filtered (their unmatched " +
    "probe rows are output); LeftSemi is") {
    def join(tpe: String): DataFrame = points.join(broadcast(intervals),
      col("p") >= col("lo") && col("p") <= col("hi"), tpe)
    withRule {
      assert(markers(join("left_outer")) == 0, "left_outer must not filter")
      assert(markers(join("left_anti")) == 0, "left_anti must not filter")
      assert(markers(join("left_semi")) > 0, "left_semi should filter")
    }
    val expectedOuter = join("left_outer").orderBy("pid", "iid").collect()
    val expectedSemi = join("left_semi").orderBy("pid").collect()
    withRule {
      assert(join("left_outer").orderBy("pid", "iid").collect().toSeq
        == expectedOuter.toSeq)
      assert(join("left_semi").orderBy("pid").collect().toSeq
        == expectedSemi.toSeq)
    }
  }

  test("empty build side degenerates to an empty result, not an error") {
    withRule {
      val empty = intervals.where(lit(false))
      val out = points.join(broadcast(empty),
        col("p") >= col("lo") && col("p") <= col("hi"))
      assert(out.collect().isEmpty)
    }
  }

  test("rule + strategy together still match the default planner " +
    "bit-identically (the j20 guarantee)") {
    def q: DataFrame = points.join(broadcast(intervals),
        col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").orderBy("pid", "iid")
    val expected = {
      val saved = spark.experimental.extraStrategies
      spark.experimental.extraStrategies = Nil
      try q.collect() finally spark.experimental.extraStrategies = saved
    }
    IntervalJoinStrategy.install(spark)
    withRule {
      val both = q
      val plan = both.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastIntervalJoin"),
        s"strategy no longer fires with the rule active:\n$plan")
      assert(markers(both) > 0)
      assert(both.collect().toSeq == expected.toSeq)
      assert(expected.nonEmpty)
    }
  }
}
