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
    // the analyzer wraps a type-mismatched key side in a widening
    // cast (t.k INT = s.k BIGINT) — still the same equi-key
    case c: org.apache.spark.sql.catalyst.expressions.Cast =>
      nameOf(c.child)
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
              "an equi-key ON conjunction with any number of " +
              "conditional WHEN MATCHED UPDATE/DELETE, WHEN NOT " +
              "MATCHED INSERT, and WHEN NOT MATCHED BY SOURCE " +
              "UPDATE/DELETE clauses (star or explicit assignments)")))
      val keys = equiKeys(mergeCond).getOrElse(
        unsupported(s"non-equi-key ON: ${mergeCond.sql}"))
      // FAST PATH — the exact unconditional star shapes keep their
      // proven single-verb routes (upsert / decomposed semi-anti /
      // full-sync), which also carry the sharpest stats pruning
      val fastSync = notMatchedBySource == Seq(DeleteAction(None))
      val fastUpdate = matched == Seq(UpdateStarAction(None))
      val fastDeleteM = matched == Seq(DeleteAction(None))
      val fastInsert = notMatched == Seq(InsertStarAction(None))
      val fastShape =
        (matched.isEmpty || fastUpdate || fastDeleteM) &&
          (notMatched.isEmpty || fastInsert) &&
          (notMatchedBySource.isEmpty || fastSync)
      if (matched.isEmpty && notMatched.isEmpty &&
          notMatchedBySource.isEmpty)
        unsupported("no actions")
      if (fastShape)
        TxLogMergeCommand(base, keys, source,
          upsert = fastUpdate, insert = fastInsert,
          deleteMatched = fastDeleteM, syncDelete = fastSync)
      else {
        // GENERAL PATH — conditional / multi-clause / explicit
        // assignments → [[TxLog.mergeClauses]]. Attribute references
        // are tagged by SIDE here (where the plans still carry
        // qualifiers and exprIds) and resolved against the live
        // column sets at run time.
        val tag = new MergeSideTagger(target, source, unsupported)
        def clauseOf(a: MergeAction, ctx: String): SqlMergeClause = a match {
          case UpdateAction(cond, assigns, _) =>
            SqlMergeClause("update", cond.map(c =>
              new ExprBox(tag(c))), assigns.map(asn =>
              tag.assignKey(asn.key) -> new ExprBox(tag(asn.value))), ctx)
          case UpdateStarAction(cond) =>
            SqlMergeClause("updateStar", cond.map(c =>
              new ExprBox(tag(c))), Seq.empty, ctx)
          case DeleteAction(cond) =>
            SqlMergeClause("delete", cond.map(c =>
              new ExprBox(tag(c))), Seq.empty, ctx)
          case InsertAction(cond, assigns) =>
            SqlMergeClause("insert", cond.map(c =>
              new ExprBox(tag(c))), assigns.map(asn =>
              tag.assignKey(asn.key) -> new ExprBox(tag(asn.value))), ctx)
          case InsertStarAction(cond) =>
            SqlMergeClause("insertStar", cond.map(c =>
              new ExprBox(tag(c))), Seq.empty, ctx)
          case other => unsupported(s"action $other in $ctx")
        }
        val matchedCl = matched.map(clauseOf(_, "matched"))
        val notMatchedCl = notMatched.map(clauseOf(_, "insert"))
        val nmbsCl = notMatchedBySource.map(clauseOf(_, "bySource"))
        matchedCl.foreach(c => if (c.kind.startsWith("insert"))
          unsupported("INSERT in WHEN MATCHED"))
        notMatchedCl.foreach(c => if (!c.kind.startsWith("insert"))
          unsupported("UPDATE/DELETE in WHEN NOT MATCHED"))
        nmbsCl.foreach(c => if (c.kind.startsWith("insert"))
          unsupported("INSERT in WHEN NOT MATCHED BY SOURCE"))
        TxLogMergeClausesCommand(base, keys, source,
          matchedCl, notMatchedCl, nmbsCl)
      }

    case other => other
  }
}

/** Tags every attribute reference in a captured MERGE clause
  * expression with its SIDE — `__tgt_x` / `__src_x` / bare `x` when
  * unqualified and unresolvable here — using the target/source plans'
  * aliases and (when already resolved) exprIds. The command resolves
  * the tags against the live column sets at run time (bare names
  * resolve contextually: both-sides contexts error on ambiguity,
  * source-only/target-only contexts bind to their side). */
private[sources] class MergeSideTagger(target: LogicalPlan,
                                       source: LogicalPlan,
                                       unsupported: String => Nothing) {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference

  /** Only the TOP-LEVEL aliases of one merge side: the SubqueryAlias
    * spine wrapping the root, plus a root relation's own name. Inner
    * aliases (a join inside the source subquery, the target table's
    * name re-used inside a self-merge source) are OUT OF SCOPE for
    * merge-clause qualifiers per SQL scoping — collecting them would
    * both falsely flag a self-merge as "names BOTH sides" and
    * silently rebind an out-of-scope qualifier against the side's
    * OUTPUT columns. */
  private def aliasesOf(plan: LogicalPlan): Set[String] = {
    def walk(p: LogicalPlan, acc: Set[String]): Set[String] = p match {
      case s: SubqueryAlias => walk(s.child, acc + s.alias.toLowerCase)
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
        acc + u.multipartIdentifier.last.toLowerCase
      case r: DataSourceV2Relation =>
        acc ++ r.identifier.map(_.name.toLowerCase)
      case _ => acc // a subquery body: its inner names are not in scope
    }
    walk(plan, Set.empty)
  }
  private val tgtAliases = aliasesOf(target)
  private val srcAliases = aliasesOf(source)
  private val shared = tgtAliases.intersect(srcAliases)
  private val tgtIds = target.output.map(_.exprId).toSet
  private val srcIds =
    scala.util.Try(source.output.map(_.exprId).toSet)
      .getOrElse(Set.empty[org.apache.spark.sql.catalyst.expressions.ExprId])

  private def inlineWith(e: Expression): Expression = e.transformUp {
    case w: org.apache.spark.sql.catalyst.expressions.With =>
      val defs = w.defs.map(d => d.id -> d.child).toMap
      w.child.transformUp {
        case r: org.apache.spark.sql.catalyst.expressions.CommonExpressionRef
            if defs.contains(r.id) => defs(r.id)
      }
  }

  /** Tag one expression's references by side. */
  def apply(e: Expression): Expression = inlineWith(e).transformUp {
    case a: AttributeReference if tgtIds.contains(a.exprId) =>
      UnresolvedAttribute(Seq(SqlMergeClause.TgtTag + a.name))
    case a: AttributeReference if srcIds.contains(a.exprId) =>
      UnresolvedAttribute(Seq(SqlMergeClause.SrcTag + a.name))
    case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
    case u: UnresolvedAttribute if u.nameParts.size >= 2 =>
      val q = u.nameParts.head.toLowerCase
      if (shared.contains(q)) unsupported(
        s"alias '$q' names BOTH merge sides — rename one")
      else if (tgtAliases.contains(q)) {
        if (u.nameParts.size != 2) unsupported(
          s"nested field reference ${u.nameParts.mkString(".")}")
        UnresolvedAttribute(Seq(SqlMergeClause.TgtTag + u.nameParts(1)))
      } else if (srcAliases.contains(q)) {
        if (u.nameParts.size != 2) unsupported(
          s"nested field reference ${u.nameParts.mkString(".")}")
        UnresolvedAttribute(Seq(SqlMergeClause.SrcTag + u.nameParts(1)))
      } else unsupported(
        s"unknown qualifier '${u.nameParts.head}' in " +
          u.nameParts.mkString("."))
    case u: UnresolvedAttribute => UnresolvedAttribute(Seq(u.nameParts.head))
  }

  /** An assignment TARGET must be a (possibly target-qualified)
    * top-level target column. */
  def assignKey(e: Expression): String = e match {
    case a: AttributeReference if tgtIds.contains(a.exprId) => a.name
    case a: AttributeReference if srcIds.contains(a.exprId) =>
      unsupported(s"assignment to SOURCE column ${a.name}")
    case a: Attribute if a.name.indexOf('.') < 0 => a.name
    case u: UnresolvedAttribute if u.nameParts.size == 1 =>
      u.nameParts.head
    case u: UnresolvedAttribute if u.nameParts.size == 2 &&
        tgtAliases.contains(u.nameParts.head.toLowerCase) =>
      u.nameParts(1)
    case other => unsupported(
      s"unsupported assignment target ${other.sql} (top-level target " +
        "columns only)")
  }
}

object TxLogSqlDml {
  /** Session conf gating MERGE schema evolution (Delta's
    * `spark.databricks.delta.schema.autoMerge.enabled` analog): when
    * true, a star action whose source carries columns absent from the
    * target ADDs them to the target schema in the same commit; when
    * false (default), that shape fails loudly instead of silently
    * dropping the columns. */
  val AutoMergeConf = "spark.graft.schema.autoMerge.enabled"

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

/** One captured WHEN clause of a general SQL MERGE: `kind` ∈
  * update/updateStar/delete/insert/insertStar, side-tagged condition
  * and assignments ([[MergeSideTagger]]), and the resolution context
  * (`matched` = both sides visible, `insert` = source only,
  * `bySource` = target only). */
case class SqlMergeClause(kind: String, cond: Option[ExprBox],
                          sets: Seq[(String, ExprBox)], ctx: String)

object SqlMergeClause {
  val TgtTag = "__tgt_"
  val SrcTag: String = TxLog.MergeSrcPrefix // "__src_"
}

/** General conditional multi-clause `MERGE INTO` →
  * [[TxLog.mergeClauses]]: side tags resolve against the LIVE target
  * and source column sets, star actions expand to full coverage, and
  * the verb executes the Delta clause semantics (first-match-wins,
  * cardinality law, row-precise masks) in one commit. */
case class TxLogMergeClausesCommand(base: String, keys: Seq[String],
                                    sourcePlan: LogicalPlan,
                                    matched: Seq[SqlMergeClause],
                                    notMatched: Seq[SqlMergeClause],
                                    bySource: Seq[SqlMergeClause])
    extends LeafRunnableCommand {
  import SqlMergeClause.{SrcTag, TgtTag}

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val src: DataFrame = ColumnBridge.ofRows(spark, sourcePlan)
    // an EMPTY target (file-less create, fully-deleted snapshot) is a
    // legitimate MERGE target for the NOT MATCHED half — mirror the
    // verb's own fallback to the declared #schema rather than crash
    // on the read (the empty-table incremental-bootstrap shape)
    val baseSchema = scala.util.Try(TxLog.read(spark, base).schema)
      .getOrElse(TxLog.latestVersion(spark, base)
        .flatMap(v => TxLog.declaredSchemaOf(spark, base, v))
        .getOrElse(throw new IllegalArgumentException(
          s"MERGE INTO txlog($base): the table is empty and declares " +
            "no schema — declare one (CREATE TABLE) or write data " +
            "first")))
    // MERGE schema evolution over SQL (Delta's autoMerge conf): a
    // STAR action with source columns absent from the target either
    // EVOLVES the target (conf on — dbt `on_schema_change:
    // append_new_columns`) or fails LOUDLY listing them (conf off) —
    // silently dropping the columns is data loss either way. Extra
    // source columns without a star action stay ordinary unreferenced
    // SQL inputs (clause conditions read them), exactly as before.
    val extraSrc = src.schema.fields.toSeq.filterNot(f =>
      baseSchema.fieldNames.exists(_.equalsIgnoreCase(f.name)))
    val hasStar = (matched ++ notMatched ++ bySource)
      .exists(c => c.kind == "updateStar" || c.kind == "insertStar")
    val autoMerge = spark.conf
      .get(TxLogSqlDml.AutoMergeConf, "false").toBoolean
    if (hasStar && extraSrc.nonEmpty && !autoMerge)
      throw new IllegalArgumentException(
        s"MERGE INTO txlog($base): UPDATE SET * / INSERT * would DROP " +
          s"source column(s) ${extraSrc.map(_.name).mkString(", ")} " +
          "not present in the target — set " +
          s"${TxLogSqlDml.AutoMergeConf}=true to evolve the target " +
          "schema (old rows read NULL), or project them away in the " +
          "source")
    val evolve = hasStar && extraSrc.nonEmpty && autoMerge
    val targetSchema =
      if (!evolve) baseSchema
      else org.apache.spark.sql.types.StructType(
        baseSchema.fields ++ extraSrc.map(_.copy(nullable = true)))
    val targetCols = targetSchema.fieldNames.toSeq
    val srcCols = src.columns.toSeq
    def srcActual(n: String) = srcCols.find(_.equalsIgnoreCase(n))
    def tgtActual(n: String) = targetCols.find(_.equalsIgnoreCase(n))
    def err(msg: String): Nothing =
      throw new IllegalArgumentException(s"MERGE INTO txlog($base): $msg")
    // side tags → the joined namespace (target bare, source prefixed);
    // bare names resolve by context, erroring on genuine ambiguity
    def resolveExpr(e: Expression, ctx: String): Expression = e.transformUp {
      case u: UnresolvedAttribute if u.nameParts.size == 1 =>
        val n = u.nameParts.head
        if (n.startsWith(TgtTag)) {
          val raw = n.substring(TgtTag.length)
          UnresolvedAttribute(Seq(tgtActual(raw).getOrElse(
            err(s"target has no column '$raw'"))))
        } else if (n.startsWith(SrcTag)) {
          val raw = n.substring(SrcTag.length)
          UnresolvedAttribute(Seq(SrcTag + srcActual(raw).getOrElse(
            err(s"source has no column '$raw'"))))
        } else ctx match {
          case "insert" => UnresolvedAttribute(Seq(SrcTag +
            srcActual(n).getOrElse(err(
              s"WHEN NOT MATCHED references source columns only; " +
                s"'$n' is not one"))))
          case "bySource" => UnresolvedAttribute(Seq(tgtActual(n)
            .getOrElse(err(
              s"WHEN NOT MATCHED BY SOURCE references target columns " +
                s"only; '$n' is not one"))))
          case _ => (tgtActual(n), srcActual(n)) match {
            case (Some(_), Some(_)) => err(
              s"reference '$n' is ambiguous (both target and source " +
                "have it) — qualify with the table/source alias")
            case (Some(t), None) => UnresolvedAttribute(Seq(t))
            case (None, Some(s)) => UnresolvedAttribute(Seq(SrcTag + s))
            case _ => err(s"column '$n' is in neither target nor source")
          }
        }
    }
    def colOf(b: ExprBox, ctx: String) =
      ColumnBridge.column(resolveExpr(b.e, ctx))
    def assignments(c: SqlMergeClause): Map[String, org.apache.spark.sql.Column] = {
      val keysL = c.sets.map(_._1.toLowerCase)
      val dup = keysL.groupBy(identity).collect {
        case (k, vs) if vs.size > 1 => k }
      if (dup.nonEmpty)
        err(s"column(s) ${dup.mkString(", ")} assigned more than once")
      c.sets.map { case (k, v) =>
        tgtActual(k).getOrElse(
          err(s"assignment to unknown target column '$k'")) ->
          colOf(v, c.ctx)
      }.toMap
    }
    def starValues(): Map[String, org.apache.spark.sql.Column] =
      targetCols.map { c =>
        c -> TxLog.sourceCol(srcActual(c).getOrElse(err(
          s"SET * / INSERT * needs the source to cover every target " +
            s"column; missing '$c'")))
      }.toMap
    def toWhen(c: SqlMergeClause): TxLog.MergeWhen = c.kind match {
      case "update" =>
        TxLog.MergeUpdate(c.cond.map(colOf(_, c.ctx)), assignments(c))
      case "updateStar" =>
        TxLog.MergeUpdate(c.cond.map(colOf(_, c.ctx)), starValues())
      case "delete" => TxLog.MergeDelete(c.cond.map(colOf(_, c.ctx)))
      case "insert" =>
        TxLog.MergeInsert(c.cond.map(colOf(_, c.ctx)), assignments(c))
      case "insertStar" =>
        TxLog.MergeInsert(c.cond.map(colOf(_, c.ctx)), starValues())
      case other => err(s"unknown clause kind $other")
    }
    TxLog.mergeClauses(spark, base, src, keys,
      matched = matched.map(toWhen),
      notMatched = notMatched.map(toWhen)
        .map(_.asInstanceOf[TxLog.MergeInsert]),
      notMatchedBySource = bySource.map(toWhen),
      evolveSchema = evolve)
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
    // star shapes with EXTRA source columns leave the fast path: the
    // aligned projection below would silently DROP them (data loss).
    // With autoMerge on they route through the general clause verb's
    // schema evolution; off, the same loud error the clause route
    // raises.
    val extraSrc = src.schema.fields.toSeq.filterNot(f =>
      targetCols.exists(_.equalsIgnoreCase(f.name)))
    if ((upsert || insert) && extraSrc.nonEmpty) {
      val autoMerge = spark.conf
        .get(TxLogSqlDml.AutoMergeConf, "false").toBoolean
      require(autoMerge,
        s"MERGE INTO txlog($base): UPDATE SET * / INSERT * would DROP " +
          s"source column(s) ${extraSrc.map(_.name).mkString(", ")} " +
          "not present in the target — set " +
          s"${TxLogSqlDml.AutoMergeConf}=true to evolve the target " +
          "schema (old rows read NULL), or project them away in the " +
          "source")
      val missing = targetCols.filterNot(c =>
        src.columns.exists(_.equalsIgnoreCase(c)))
      require(missing.isEmpty,
        s"MERGE INTO txlog($base): INSERT/UPDATE SET * needs the source " +
          s"to cover every target column; missing ${missing.mkString(", ")}")
      def srcName(c: String): String =
        src.columns.find(_.equalsIgnoreCase(c)).getOrElse(c)
      val star = (targetCols ++ extraSrc.map(_.name))
        .map(c => c -> TxLog.sourceCol(srcName(c))).toMap
      TxLog.mergeClauses(spark, base, src, keys,
        matched =
          if (upsert) Seq(TxLog.MergeUpdate(None, star))
          else if (deleteMatched) Seq(TxLog.MergeDelete(None))
          else Seq.empty,
        notMatched =
          if (insert) Seq(TxLog.MergeInsert(None, star)) else Seq.empty,
        notMatchedBySource =
          if (syncDelete) Seq(TxLog.MergeDelete(None)) else Seq.empty,
        evolveSchema = true)
      return Seq.empty
    }
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
