package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{col, expr, lit}

import graft.operators.TxLog

/** SQL `UPDATE` and `MERGE INTO` for txlog tables (VERDICT r10
  * missing #2's remainder — the reference's dbt lifecycle issues
  * exactly `MERGE INTO ... WHEN MATCHED THEN UPDATE SET * WHEN NOT
  * MATCHED THEN INSERT *` as SQL through the Thrift endpoint,
  * dbt/models/staging/stg_properties.sql:1-7 `incremental_strategy=
  * 'merge'`).
  *
  * Spark's parser already produces [[UpdateTable]]/[[MergeIntoTable]]
  * plans; for a DSv2 table without `SupportsRowLevelOperations` the
  * analyzer then rejects them. This RESOLUTION rule (ladder rung (c):
  * `SparkSessionExtensions.injectResolutionRule`) intercepts the two
  * shapes when — and only when — the target is a [[TxLogTable]], and
  * rewrites them to runnable commands over the log's merge-on-read
  * verbs: zero data files rewritten, commit cost O(changed rows),
  * manifest stats pre-pruning where the predicate allows.
  *
  * Supported MERGE shape is the dbt one: a single equi-key ON
  * conjunction, `WHEN MATCHED THEN UPDATE SET *`, `WHEN NOT MATCHED
  * THEN INSERT *` (either clause optional, DELETE accepted in the
  * matched slot). Anything fancier fails LOUDLY with the shape we do
  * support — never a silent wrong answer.
  */
case class TxLogSqlDmlRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def txRelation(plan: LogicalPlan): Option[DataSourceV2Relation] =
    plan.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[TxLogTable] => r
    }

  private def txBase(plan: LogicalPlan): Option[String] =
    txRelation(plan).map(_.table.asInstanceOf[TxLogTable].basePath)

  /** Re-target a captured expression at a fresh snapshot read: every
    * attribute (resolved or not, qualified or not) becomes a bare
    * BY-NAME reference the executing DataFrame re-resolves. The
    * EXPRESSION travels — not its `.sql` — because runtime-replaceable
    * nodes (e.g. Between) render `.sql` from shadow fields a transform
    * never visits, resurrecting stale qualifiers. */
  private def byName(e: Expression): Expression = inlineWith(e).transformUp {
    // UnresolvedAttribute IS an Attribute (and its .name is the full
    // dotted path) — match it first and keep only the column name
    case u: UnresolvedAttribute => UnresolvedAttribute(Seq(u.nameParts.last))
    case a: Attribute => UnresolvedAttribute(Seq(a.name))
  }

  /** Inline `With`/CommonExpressionRef trees (the analyzer's
    * shared-subexpression form of e.g. BETWEEN): their refs only
    * resolve inside the original plan — a captured copy must carry
    * the plain inlined expression to survive re-analysis. */
  private def inlineWith(e: Expression): Expression = e.transformUp {
    case w: org.apache.spark.sql.catalyst.expressions.With =>
      val defs = w.defs.map(d => d.id -> d.child).toMap
      w.child.transformUp {
        case r: org.apache.spark.sql.catalyst.expressions.CommonExpressionRef
            if defs.contains(r.id) => defs(r.id)
      }
  }

  private def nameOf(e: Expression): Option[String] = e match {
    case u: UnresolvedAttribute => Some(u.nameParts.last)
    case a: Attribute => Some(a.name)
    case _ => None
  }

  /** The equi-key names of a MERGE ON conjunction: every conjunct must
    * be `target.k = source.k` with the SAME column name both sides. */
  private def equiKeys(cond: Expression): Option[Seq[String]] = {
    def split(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        split(l) ++ split(r)
      case other => Seq(other)
    }
    val keys = split(cond).map {
      case EqualTo(l, r) =>
        (nameOf(l), nameOf(r)) match {
          case (Some(a), Some(b)) if a.equalsIgnoreCase(b) => Some(a)
          case _ => None
        }
      case _ => None
    }
    if (keys.forall(_.isDefined)) Some(keys.flatten) else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case u @ UpdateTable(table, assignments, condition)
        if txBase(table).isDefined =>
      val sets = assignments.map { a =>
        val key = nameOf(a.key).getOrElse(throw new IllegalArgumentException(
          s"UPDATE on a txlog table: unsupported assignment target " +
            s"${a.key.sql} (top-level columns only)"))
        key -> new ExprBox(byName(a.value))
      }
      // SQL forbids duplicate assignment targets — collapsing them
      // (Map last-wins) would silently drop an assignment
      val dup = sets.map(_._1.toLowerCase)
        .groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
      require(dup.isEmpty,
        s"UPDATE assigns column(s) ${dup.mkString(", ")} more than once")
      TxLogUpdateCommand(txBase(table).get,
        condition.map(c => new ExprBox(byName(c))), sets)

    case m @ MergeIntoTable(target, source, mergeCond,
        matched, notMatched, notMatchedBySource, _)
        if txBase(target).isDefined =>
      val base = txBase(target).get
      def unsupported(why: String): Nothing =
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "UNSUPPORTED_FEATURE.TABLE_OPERATION",
          messageParameters = Map(
            "tableName" -> s"txlog($base)",
            "operation" -> (s"this MERGE shape ($why); supported: " +
              "equi-key ON, WHEN MATCHED THEN UPDATE SET * (or DELETE), " +
              "WHEN NOT MATCHED THEN INSERT *, " +
              "WHEN NOT MATCHED BY SOURCE THEN DELETE")))
      // full-sync delete: target rows whose key vanished from the
      // source die in the same commit (Delta's third MERGE clause)
      val syncDelete = notMatchedBySource match {
        case Seq() => false
        case Seq(DeleteAction(None)) => true
        case other => unsupported(s"not-matched-by-source actions $other")
      }
      val keys = equiKeys(mergeCond).getOrElse(
        unsupported(s"non-equi-key ON: ${mergeCond.sql}"))
      // STAR actions only. Explicit assignment lists are deliberately
      // rejected: a name-based classifier cannot distinguish
      // `SET v = s.v, k = t.k` ("keep old k") from SET * — qualifiers
      // are aliases we cannot resolve here — and Spark's own star
      // expansion is rewritable-gated (it never fires for tables
      // without SupportsRowLevelOperations), so the expanded form
      // never legitimately reaches this rule. Loud error beats a
      // silent full-row overwrite.
      val doUpdate = matched match {
        case Seq() => false
        case Seq(UpdateStarAction(None)) => true
        case Seq(DeleteAction(None)) => false
        case other => unsupported(s"matched actions $other")
      }
      val deleteMatched = matched == Seq(DeleteAction(None))
      val doInsert = notMatched match {
        case Seq() => false
        case Seq(InsertStarAction(None)) => true
        case other => unsupported(s"not-matched actions $other")
      }
      if (!doUpdate && !deleteMatched && !doInsert && !syncDelete)
        unsupported("no actions")
      TxLogMergeCommand(base, keys, source,
        upsert = doUpdate, insert = doInsert, deleteMatched = deleteMatched,
        syncDelete = syncDelete)

    case other => other
  }
}

object TxLogSqlDml {
  /** Idempotently arm a session lineage with the DML rule: injects
    * into the LIVE extensions object (so every future `newSession()`
    * and Thrift-served session plans with it) exactly once per
    * extensions instance. An already-built session's analyzer is
    * frozen — callers needing DML on the CURRENT session should run
    * statements on a `newSession()`. */
  private val armed = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[AnyRef, java.lang.Boolean]()))

  /** The one guarded injection point — shared by [[ensureInjected]]
    * and GraftExtensions so a lineage built with
    * `spark.sql.extensions=graft.GraftExtensions` that ALSO calls
    * ensureInjected never carries two copies of the rule. */
  def injectInto(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    if (armed.add(ext)) {
      ext.injectResolutionRule(s => TxLogSqlDmlRule(s))
      // the grammar rung: OPTIMIZE / VACUUM / DESCRIBE HISTORY
      ext.injectParser((_, delegate) => new TxLogSqlParser(delegate))
    }

  def ensureInjected(spark: SparkSession): Unit =
    injectInto(org.apache.spark.sql.graftbridge.ColumnBridge
      .sessionExtensions(spark))
}

/** `UPDATE <txlog table> SET ... WHERE ...` → merge-on-read update:
  * hit rows are masked and their updated images land as new files in
  * ONE commit. Captured expressions travel as SQL text (re-parsed
  * against the snapshot read), so the command is plan-independent. */
/** Opaque expression holder: keeps captured (deliberately by-name,
  * hence "unresolved") expressions out of the command's
  * TreeNode-visible fields — CheckAnalysis would otherwise fail the
  * command for carrying them. They resolve at run() against the
  * snapshot read. */
final class ExprBox(val e: Expression) extends Serializable {
  override def toString: String = e.sql
}

case class TxLogUpdateCommand(base: String, condExpr: Option[ExprBox],
                              sets: Seq[(String, ExprBox)])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.column
    val cond = condExpr.map(b => column(b.e)).getOrElse(lit(true))
    TxLog.updateWhereMor(spark, base, cond,
      sets.map { case (c, v) => c -> column(v.e) }.toMap)
    Seq.empty
  }
}

/** `MERGE INTO <txlog table> USING <source> ON <equi-keys> ...` →
  * merge-on-read merge/applyChanges: matched target rows are masked;
  * the source lands as new files (upsert) in ONE commit. */
case class TxLogMergeCommand(base: String, keys: Seq[String],
                             sourcePlan: LogicalPlan,
                             upsert: Boolean, insert: Boolean,
                             deleteMatched: Boolean,
                             syncDelete: Boolean = false)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val src: DataFrame = org.apache.spark.sql.graftbridge.ColumnBridge
      .ofRows(spark, sourcePlan)
    val targetSchema = TxLog.read(spark, base).schema
    val targetCols = targetSchema.fieldNames.toSeq
    val missingKeys = keys.filterNot(k =>
      src.columns.exists(_.equalsIgnoreCase(k)))
    require(missingKeys.isEmpty,
      s"MERGE INTO txlog($base): source lacks ON key(s) " +
        missingKeys.mkString(", "))
    // SET */INSERT * need full column coverage, CAST to the target's
    // types (a bigint source landing next to int files would poison
    // later snapshot reads); a pure DELETE only needs the keys
    lazy val aligned = {
      val missing = targetCols.filterNot(c =>
        src.columns.exists(_.equalsIgnoreCase(c)))
      require(missing.isEmpty,
        s"MERGE INTO txlog($base): INSERT/UPDATE SET * needs the source " +
          s"to cover every target column; missing ${missing.mkString(", ")}")
      src.select(targetCols.map(c =>
        col(c).cast(targetSchema(c).dataType).as(c)): _*)
    }
    val statsCol = keys.headOption.getOrElse(
      throw new IllegalArgumentException("MERGE needs at least one key"))
    if (upsert && insert && !syncDelete) {
      // UPDATE SET * + INSERT * ≡ upsert: anti-by-key ∪ source
      TxLog.mergeMorAuto(spark, base, aligned, keys)
    } else {
      // decomposed shapes: the matched/not-matched split is a
      // semi/anti join against the CURRENT target keys, then one
      // mask+append commit (no #txn growth for ad-hoc statements).
      // A pure DELETE works from the keys alone (no column coverage).
      val targetKeys = TxLog.read(spark, base).select(keys.map(col): _*)
      val srcKeys = src.select(keys.map(k =>
        col(k).cast(targetSchema(k).dataType).as(k)): _*)
      val deletes =
        if (deleteMatched || upsert) srcKeys else srcKeys.limit(0)
      val inserts =
        if (upsert && insert) aligned // upsert + sync: every source row
        else if (upsert) aligned.join(targetKeys, keys, "left_semi")
        else if (insert) aligned.join(targetKeys, keys, "left_anti")
        // pure DELETE: no coverage requirement, so `aligned` must not
        // be touched — an empty frame in the TARGET's shape serves
        else TxLog.read(spark, base).limit(0)
      // WHEN NOT MATCHED BY SOURCE THEN DELETE: rows whose key is
      // absent from the source die in the SAME commit (full-sync)
      TxLog.applyBatch(spark, base, deletes, inserts, keys, statsCol,
        syncKeys = if (syncDelete) Some(srcKeys) else None)
    }
    Seq.empty
  }
}
