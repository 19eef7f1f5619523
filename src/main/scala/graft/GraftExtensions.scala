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
}
