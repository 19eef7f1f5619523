package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.DotProduct

/** SparkSessionExtensions hook (SURVEY §4.3 / builder-brief custom
  * operator ladder): registers the engine's native expressions with
  * the SQL function registry, so `spark.sql("... graft_dot(a, b) ...")`
  * plans the codegen'd Catalyst expression. Activate with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotFunction)
    ext.injectFunction(GraftExtensions.topkFunction)
    // Ladder rung (c): whole-operator planner extension. The strategy
    // self-scopes (fires only on broadcast-declared point-in-interval
    // inner joins, returns Nil otherwise) so injecting it session-wide
    // is safe for every other plan shape.
    ext.injectPlannerStrategy(_ => graft.plans.IntervalJoinStrategy)
    // Ladder rung (b'): logical optimizer rule — derived min/max
    // pre-filter on the probe side of point-in-interval joins. Also
    // self-scoping (same pattern match as the strategy, Inner/LeftSemi
    // only, marker-aliased for fixed-point idempotency).
    ext.injectOptimizerRule(_ => graft.plans.IntervalPrefilterRule)
    // SQL UPDATE / MERGE INTO on txlog tables: resolution rule
    // rewriting the two row-level-DML shapes (which plain DSv2 tables
    // cannot serve) into merge-on-read commands. Self-scoping: fires
    // only when the target relation is a TxLogTable. Routed through
    // the guarded injector so TxLogSqlDml.ensureInjected on the same
    // lineage never adds a second copy.
    graft.sources.TxLogSqlDml.injectInto(ext)
  }
}

object GraftExtensions {
  val dotFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_dot(a, b) takes two arguments")
      DotProduct(children.head, children(1))
    })

  /** The bounded-heap top-k typed Aggregator as an injectable SQL
    * function: `graft_topk(value, id[, k])` with k a literal (default
    * 3, matching the session-registry face in RegistryLlm). Injected
    * builders run at resolution per call site, so a literal k can pick
    * the aggregator's heap bound — something `udf.register` (fixed
    * instance) cannot do. */
  val topkFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_topk"),
    new ExpressionInfo(classOf[graft.functions.TopKAggregator].getName, "graft_topk"),
    (children: Seq[Expression]) => {
      require(children.length == 2 || children.length == 3,
        "graft_topk(value, id[, k]) takes two or three arguments")
      val k = children.drop(2) match {
        case Seq(org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _)) => v
        case Seq() => 3
        case other => throw new IllegalArgumentException(
          s"graft_topk k must be an integer literal, got $other")
      }
      // Build the ScalaAggregator expression directly: a Column-API
      // detour (udaf(...).apply) yields an unconverted ColumnNode
      // wrapper that the analyzer rejects when returned from a
      // registry builder.
      val agg = new graft.functions.TopKAggregator(k)
      org.apache.spark.sql.execution.aggregate.ScalaAggregator(
        children.take(2), agg,
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)](),
        agg.bufferEncoder.asInstanceOf[
          org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]])
        .toAggregateExpression()
    })
}
