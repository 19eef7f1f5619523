package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, Expression, GreaterThan, GreaterThanOrEqual, LessThan,
  LessThanOrEqual, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.{Max, Min}
import org.apache.spark.sql.catalyst.optimizer.ColumnPruning
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer-rule rung of the extension ladder (`Rule[LogicalPlan]`
  * via SparkSessionExtensions — the one surface [[graft.GraftExtensions]]
  * didn't exercise beside the expression and planner rungs): derived
  * min/max pre-filtering for point-in-interval joins.
  *
  * A `p BETWEEN lo AND hi` join against a broadcast-small build side
  * streams EVERY probe row into the join operator — nested-loop scan
  * or [[IntervalJoinStrategy]]'s tree descent — even when the build
  * intervals span a sliver of the probe's domain (maintenance windows
  * over a year of events: the windows cover hours, the probe spans the
  * year). This rule injects the implied bounds on the probe side:
  *
  *   Join(probe, build, p BETWEEN lo AND hi)
  *     ==> Join(Filter(p >= min(lo) AND p <= max(hi), probe), build, …)
  *
  * with min/max computed by scalar subqueries over the build side
  * (column-pruned eagerly, mirroring Spark's own InjectRuntimeFilter —
  * the optimizer's subquery batch has already run by the time injected
  * rules fire). The filter is implied by the join condition, so
  * results are bit-identical; the plan now eliminates out-of-range
  * probe rows with one codegen'd long-pair compare at the scan
  * boundary instead of a tree descent (or an O(build) nested-loop
  * pass) in the join — at 100 TB that's most of the probe table dying
  * before the join operator. Bounds land on the BASE domain column
  * whenever `p` is a bare attribute, so parquet row-group min/max
  * skipping applies once the subquery values are known.
  *
  * Scope: Inner and LeftSemi only — for LeftOuter/LeftAnti the
  * unmatched probe rows ARE output, so a probe-side filter would drop
  * rows the join must keep. Null/empty build degenerates safely: the
  * subquery yields null, the comparison is never true, and the
  * Inner/LeftSemi output is empty exactly as the join's would be.
  * Fires only when [[IntervalJoinStrategy.buildable]] holds (hinted
  * or stats-small build side) — the subquery scans the build side
  * once, which must be cheap relative to the probe rows it kills.
  */
object IntervalPrefilterRule extends Rule[LogicalPlan] {

  private val MarkerLo = "graft_iv_lo"
  private val MarkerHi = "graft_iv_hi"

  /** Idempotency within the fixed-point batch: the injected filter is
    * recognizable by its marker aliases. */
  private def isMarked(e: Expression): Boolean = e.exists {
    case s: ScalarSubquery => s.plan match {
      case Aggregate(_, aggs, _, _) =>
        aggs.exists(a => a.name == MarkerLo || a.name == MarkerHi)
      case _ => false
    }
    case _ => false
  }

  private def minMaxSubquery(build: LogicalPlan, expr: Expression,
                             min: Boolean): ScalarSubquery = {
    val agg =
      if (min) Alias(Min(expr).toAggregateExpression(), MarkerLo)()
      else Alias(Max(expr).toAggregateExpression(), MarkerHi)()
    // prune eagerly — no optimizer batch revisits injected subqueries
    ScalarSubquery(ColumnPruning(Aggregate(Nil, Seq(agg), build)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, Inner | LeftSemi, Some(cond), _)
        if !j.isStreaming && IntervalJoinStrategy.buildable(j, r) &&
          !(l match { case Filter(c, _) => isMarked(c); case _ => false }) =>
      IntervalJoinStrategy.extract(cond, l, r) match {
        case Some(p) =>
          val loB = minMaxSubquery(r, p.lo, min = true)
          val hiB = minMaxSubquery(r, p.hi, min = false)
          val loCmp: Expression =
            if (p.loStrict) GreaterThan(p.point, loB)
            else GreaterThanOrEqual(p.point, loB)
          val hiCmp: Expression =
            if (p.hiStrict) LessThan(p.point, hiB)
            else LessThanOrEqual(p.point, hiB)
          j.withNewChildren(Seq(Filter(And(loCmp, hiCmp), l), r))
        case None => j
      }
  }

  /** Idempotently register on a session the engine doesn't own (the
    * [[graft.GraftExtensions]] `injectOptimizerRule` path covers
    * sessions it does). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(IntervalPrefilterRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ IntervalPrefilterRule
}
