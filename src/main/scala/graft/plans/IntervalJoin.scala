package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  And, Attribute, BindReferences, Expression, GreaterThan,
  GreaterThanOrEqual, JoinedRow, LessThan, LessThanOrEqual, Predicate,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftAnti, LeftOuter, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

import scala.collection.mutable.ArrayBuffer

/** Broadcast interval join — the builder brief's custom-operator
  * ladder rung (c): a whole-operator semantic Spark's built-ins
  * cannot express EFFICIENTLY, delivered as a planner
  * [[SparkStrategy]] plus a physical [[BinaryExecNode]].
  *
  * Spark plans a point-in-interval inner join (`p BETWEEN lo AND hi`,
  * no equality conjunct) as BroadcastNestedLoopJoin: every probe row
  * compares against EVERY broadcast interval — O(|left|·|right|)
  * comparisons, the classic range-join cliff (the reference's BI
  * layer hits the same shape for business-htown windows over event
  * sessions, SURVEY §3 E3). This strategy recognizes the pattern and
  * swaps in [[BroadcastIntervalJoinExec]]: the small side is built
  * into a centered interval tree once, and each probe costs
  * O(log n + matches). At 100 TB the probe side streams
  * partition-parallel with NO shuffle and NO per-row full scan of the
  * build side.
  *
  * Scope guard: fires only when the build side is explicitly
  * broadcast-hinted or its stats fit the session's
  * autoBroadcastJoinThreshold, the probe expression is LongType
  * (epoch micros — the engine's canonical event-time wire type), and
  * the join is Inner. Everything else falls through to Spark's
  * planner untouched (returning Nil keeps the strategy composable).
  */
object IntervalJoinStrategy extends SparkStrategy {

  /** A recognized `lo <= p <= hi` join: probe point from the left
    * plan, bounds from the right, remaining conjuncts as a residual
    * evaluated on the joined row. `loStrict`/`hiStrict` carry
    * open-bound variants (`<` / `>`). */
  private[plans] final case class Pattern(
      point: Expression, lo: Expression, hi: Expression,
      loStrict: Boolean, hiStrict: Boolean, residual: Option[Expression])

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    // !isStreaming: the build side is executeCollect'ed once — a
    // micro-batch source must fall through to Spark's streaming-aware
    // planning (extra strategies run FIRST, so the guard is on us).
    // LeftOuter keeps ON-clause semantics: the residual decides
    // matches, an unmatched probe row emits null-padded build columns.
    // LeftSemi/LeftAnti emit each probe row at most once (exists /
    // not-exists a containing interval) — the "events inside/outside
    // any window" filter shapes.
    case j @ Join(l, r, jt @ (Inner | LeftOuter | LeftSemi | LeftAnti),
        Some(cond), hint)
        if !j.isStreaming && buildable(j, r) =>
      extract(cond, l, r) match {
        case Some(p) =>
          BroadcastIntervalJoinExec(planLater(l), planLater(r), jt,
            p.point, p.lo, p.hi, p.loStrict, p.hiStrict, p.residual) :: Nil
        case None => Nil
      }
    case _ => Nil
  }

  /** Right side must be declared-or-estimated small: an explicit
    * broadcast hint wins; otherwise trust stats only under the
    * session broadcast threshold (≤ 0 disables, same as Spark). */
  private[plans] def buildable(j: Join, right: LogicalPlan): Boolean = {
    val hinted = j.hint.rightHint.exists(_.strategy.exists(
      _ == org.apache.spark.sql.catalyst.plans.logical.BROADCAST))
    lazy val threshold = org.apache.spark.sql.internal.SQLConf.get
      .autoBroadcastJoinThreshold
    hinted || (threshold > 0 && right.stats.sizeInBytes <= threshold)
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case x => Seq(x)
  }

  /** Normalize one comparison into (point, bound, isLower, strict)
    * where `point` references only the left plan and `bound` only the
    * right — in either written order. */
  private def bound(e: Expression, l: LogicalPlan, r: LogicalPlan)
      : Option[(Expression, Expression, Boolean, Boolean)] = {
    // the bound must genuinely REFERENCE the build side: a literal
    // bound (`p BETWEEN lit AND lit`) is a pushable filter, not a
    // join bound — treating it as one would degrade whatever real
    // join structure remains (e.g. an equi key) to a residual
    def sides(a: Expression, b: Expression): Option[(Expression, Expression, Boolean)] =
      if (a.references.subsetOf(l.outputSet) && b.references.nonEmpty &&
          b.references.subsetOf(r.outputSet))
        Some((a, b, true))        // point cmp bound
      else if (b.references.subsetOf(l.outputSet) && a.references.nonEmpty &&
          a.references.subsetOf(r.outputSet))
        Some((b, a, false))       // bound cmp point
      else None
    e match {
      case GreaterThanOrEqual(a, b) => sides(a, b).map {
        case (p, bd, ptLeft) => (p, bd, ptLeft, false) }          // p >= lo | hi >= p
      case LessThanOrEqual(a, b) => sides(a, b).map {
        case (p, bd, ptLeft) => (p, bd, !ptLeft, false) }         // p <= hi | lo <= p
      case GreaterThan(a, b) => sides(a, b).map {
        case (p, bd, ptLeft) => (p, bd, ptLeft, true) }
      case LessThan(a, b) => sides(a, b).map {
        case (p, bd, ptLeft) => (p, bd, !ptLeft, true) }
      case _ => None
    }
  }

  private[plans] def extract(cond: Expression, l: LogicalPlan, r: LogicalPlan)
      : Option[Pattern] = {
    val cs = conjuncts(cond)
    // an equi-conjunct between the sides means Spark can hash-join on
    // it — strictly better than probing an interval tree and filtering
    // the equality as a residual; leave those joins alone
    def acrossSides(a: Expression, b: Expression): Boolean =
      (a.references.nonEmpty && a.references.subsetOf(l.outputSet) &&
        b.references.nonEmpty && b.references.subsetOf(r.outputSet)) ||
      (b.references.nonEmpty && b.references.subsetOf(l.outputSet) &&
        a.references.nonEmpty && a.references.subsetOf(r.outputSet))
    val hasEquiKey = cs.exists {
      case org.apache.spark.sql.catalyst.expressions.EqualTo(a, b) =>
        acrossSides(a, b)
      // <=> is also a hash-joinable key (BroadcastHashJoin supports
      // null-safe equality) — same demotion hazard as EqualTo
      case org.apache.spark.sql.catalyst.expressions.EqualNullSafe(a, b) =>
        acrossSides(a, b)
      case _ => false
    }
    if (hasEquiKey) return None
    val bounds = cs.flatMap(c => bound(c, l, r).map(c -> _))
    val lower = bounds.collectFirst { case (c, (p, b, true, s)) => (c, p, b, s) }
    val upper = bounds.collectFirst { case (c, (p, b, false, s)) => (c, p, b, s) }
    (lower, upper) match {
      case (Some((lc, lp, lo, ls)), Some((uc, up, hi, us)))
          if lp.semanticEquals(up) && longBacked(lp.dataType) &&
            lo.dataType == lp.dataType && hi.dataType == lp.dataType &&
            lp.deterministic && lo.deterministic && hi.deterministic =>
        val rest = cs.filterNot(c => (c eq lc) || (c eq uc))
        Some(Pattern(lp, lo, hi, ls, us,
          rest.reduceOption(And)))
      case _ => None
    }
  }

  /** Types whose internal value is a Long with value-order comparison
    * semantics — the tree probes the raw long. TimestampType /
    * TimestampNTZType are epoch micros internally, so `ts BETWEEN
    * w_start AND w_end` (the natural authoring of the window join)
    * accelerates without a manual unix_micros cast. Analysis has
    * already coerced both bounds to the point's type (enforced above),
    * so mixed-type comparisons never reach the exec. */
  private def longBacked(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt == LongType ||
      dt == org.apache.spark.sql.types.TimestampType ||
      dt == org.apache.spark.sql.types.TimestampNTZType

  /** Idempotently register the strategy on a session (the
    * driver-owned-session path; [[graft.GraftExtensions]] is the
    * spark.sql.extensions path for sessions the engine builds). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(IntervalJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ IntervalJoinStrategy
}

/** Static centered interval tree over the broadcast build side.
  *
  * Every node stores the intervals containing its center point, kept
  * in two orders (ascending lo, descending hi); intervals entirely
  * below the center go to the left child, entirely above to the
  * right. A point probe walks one root-to-leaf path: at each node the
  * matching intervals are a PREFIX of one of the two orders (probe
  * below center ⇒ every stored interval's hi ≥ center > probe, so
  * only `lo ≤ probe` needs checking — and vice versa), so the probe
  * never touches a non-matching stored interval beyond the first.
  * Build O(n log n), probe O(log n + matches) — vs the nested-loop
  * probe's O(n). Rows are UnsafeRow copies; the whole tree ships as
  * one broadcast value.
  */
final class IntervalIndex private (
    center: Long,
    byLo: Array[IntervalIndex.Entry],    // ascending lo
    byHi: Array[IntervalIndex.Entry],    // descending hi
    left: IntervalIndex,
    right: IntervalIndex) extends Serializable {

  def query(t: Long, out: ArrayBuffer[InternalRow]): Unit = {
    if (t < center) {
      var i = 0
      while (i < byLo.length && byLo(i).lo <= t) { out += byLo(i).row; i += 1 }
      if (left != null) left.query(t, out)
    } else if (t > center) {
      var i = 0
      while (i < byHi.length && byHi(i).hi >= t) { out += byHi(i).row; i += 1 }
      if (right != null) right.query(t, out)
    } else {
      // t == center: every interval stored here contains the center by
      // construction; children hold only intervals strictly beside it.
      var i = 0
      while (i < byLo.length) { out += byLo(i).row; i += 1 }
    }
  }
}

object IntervalIndex {
  final case class Entry(lo: Long, hi: Long, row: InternalRow)

  /** Empty input builds a null tree; callers treat null as no-match. */
  def build(entries: Array[Entry]): IntervalIndex = {
    if (entries.isEmpty) return null
    // Center = median of ALL 2n endpoints — the classical centered
    // interval-tree construction. The interval owning the median
    // endpoint always contains it (lo <= center <= hi when center is
    // one of its own endpoints), so at least one entry lands at this
    // node, both children are strictly smaller, recursion terminates,
    // AND each child holds at most half the remaining endpoints —
    // guaranteeing O(log n) depth even when upper bounds shrink
    // geometrically (a midpoint-of-median-element center does not).
    val endpoints = new Array[Long](entries.length * 2)
    var i = 0
    while (i < entries.length) {
      endpoints(2 * i) = entries(i).lo
      endpoints(2 * i + 1) = entries(i).hi
      i += 1
    }
    java.util.Arrays.sort(endpoints)
    val center = endpoints(endpoints.length / 2)
    val atNode = entries.filter(e => e.lo <= center && e.hi >= center)
    val lows = entries.filter(_.hi < center)
    val highs = entries.filter(_.lo > center)
    new IntervalIndex(center,
      atNode.sortBy(_.lo),
      atNode.sortBy(_.hi)(Ordering[Long].reverse),
      build(lows), build(highs))
  }
}

/** Physical broadcast interval join. The build (right) side is
  * collected once, indexed into an [[IntervalIndex]], and broadcast;
  * the probe (left) side streams partition-parallel, each row paying
  * one tree descent. Null probe points and null/inverted bounds
  * produce no matches — identical to the SQL comparison semantics the
  * operator replaces. Residual conjuncts (anything beyond the two
  * range bounds) evaluate on the joined row and DECIDE the match
  * (ON-clause semantics): for Inner a failing pair is dropped, for
  * LeftOuter a probe row none of whose candidates pass emits once
  * with null-padded build columns.
  */
case class BroadcastIntervalJoinExec(
    left: SparkPlan, right: SparkPlan, joinType: JoinType,
    point: Expression, lo: Expression, hi: Expression,
    loStrict: Boolean, hiStrict: Boolean,
    residual: Option[Expression]) extends BinaryExecNode {

  override def output: Seq[Attribute] = joinType match {
    case LeftOuter => left.output ++ right.output.map(_.withNullability(true))
    case LeftSemi | LeftAnti => left.output
    case _ => left.output ++ right.output
  }
  override def outputPartitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val loB = BindReferences.bindReference(lo, right.output)
    val hiB = BindReferences.bindReference(hi, right.output)
    // Build-side safety caps, mirroring BroadcastExchangeExec's hard
    // limits (512M rows / 8 GB): the strategy trusts logical stats
    // under autoBroadcastJoinThreshold, and a stats misestimate must
    // fail with a descriptive error — not an uncontrolled driver
    // collect and executor-side OOM when the tree ships.
    val collected = right.executeCollect()
    if (collected.length >= 512000000) {
      throw new org.apache.spark.SparkException(
        s"BroadcastIntervalJoinExec: build side has ${collected.length} " +
          "rows, above the 512000000-row broadcast limit (stats " +
          "misestimate? — disable via autoBroadcastJoinThreshold=-1 " +
          "and drop the broadcast hint to fall back to the default plan)")
    }
    var buildBytes = 0L
    collected.foreach {
      case u: org.apache.spark.sql.catalyst.expressions.UnsafeRow =>
        buildBytes += u.getSizeInBytes
      case _ => ()
    }
    if (buildBytes > (8L << 30)) {
      throw new org.apache.spark.SparkException(
        s"BroadcastIntervalJoinExec: build side is $buildBytes bytes, " +
          "above the 8 GB broadcast limit (stats misestimate? — " +
          "disable via autoBroadcastJoinThreshold=-1 and drop the " +
          "broadcast hint to fall back to the default plan)")
    }
    // Strict bounds shrink the stored interval by one microtick so the
    // tree's inclusive probe implements < / > exactly on longs.
    val entries = collected.flatMap { r =>
      val lv = loB.eval(r)
      val hv = hiB.eval(r)
      if (lv == null || hv == null) None
      else {
        val l0 = lv.asInstanceOf[Long]
        val h0 = hv.asInstanceOf[Long]
        val l1 = if (loStrict) l0 + 1 else l0
        val h1 = if (hiStrict) h0 - 1 else h0
        if (l1 > h1 || (loStrict && l0 == Long.MaxValue) ||
          (hiStrict && h0 == Long.MinValue)) None
        else Some(IntervalIndex.Entry(l1, h1, r.copy()))
      }
    }
    val index = sparkContext.broadcast(IntervalIndex.build(entries))
    val pointB = BindReferences.bindReference(point, left.output)
    // the residual evaluates on the JOINED row regardless of what the
    // join type projects out; for outer the binding schema must carry
    // the widened nullability or the projection would elide the null
    // checks and read garbage from the null-pad row
    val joinAttrs = joinType match {
      case LeftOuter => left.output ++ right.output.map(_.withNullability(true))
      case _ => left.output ++ right.output
    }
    val outAttrs = output
    val res = residual
    val jt = joinType
    val nRight = right.output.length
    left.execute().mapPartitionsWithIndex({ (partIndex, iter) =>
      val tree = index.value
      val joined = new JoinedRow
      val project = UnsafeProjection.create(outAttrs, joinAttrs)
      val pred = res.map(Predicate.create(_, joinAttrs))
      // real partition index: the analyzer pulls nondeterministic
      // expressions out of join conditions today, but a partition-
      // index-sensitive residual must not silently all see index 0
      // if that ever changes
      pred.foreach(_.initialize(partIndex))
      val nullRight =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(nRight)
      val buf = new ArrayBuffer[InternalRow]()
      // a probe row's candidate intervals, residual applied (the
      // ON-clause match set); empty for a null point — SQL comparison
      // semantics make every candidate a non-match then
      def matches(lrow: InternalRow): Iterator[InternalRow] = {
        val pv = pointB.eval(lrow)
        buf.clear()
        if (pv != null && tree != null)
          tree.query(pv.asInstanceOf[Long], buf)
        buf.iterator.filter { rrow =>
          joined(lrow, rrow); pred.forall(_.eval(joined))
        }
      }
      jt match {
        case Inner =>
          if (tree == null) Iterator.empty
          else iter.flatMap { lrow =>
            matches(lrow).map(rrow => project(joined(lrow, rrow)))
          }
        case LeftOuter => iter.flatMap { lrow =>
          // decide the match set FIRST, then emit lazily — no
          // reused projection row is ever buffered
          val ms = matches(lrow).toArray
          if (ms.isEmpty) Iterator.single(project(joined(lrow, nullRight)))
          else ms.iterator.map(rrow => project(joined(lrow, rrow)))
        }
        case LeftSemi =>
          if (tree == null) Iterator.empty
          else iter.filter(lrow => matches(lrow).hasNext)
        case LeftAnti => iter.filter(lrow => !matches(lrow).hasNext)
        case t => throw new IllegalStateException(
          s"unplannable join type reached interval exec: $t")
      }
    }, preservesPartitioning = true)
  }
}
