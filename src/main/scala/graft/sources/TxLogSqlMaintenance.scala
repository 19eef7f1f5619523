package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{LongType, StructType}

import graft.operators.TxLog

/** Maintenance SQL for txlog tables — the PARSER rung of the
  * SparkSessionExtensions ladder (`injectParser`), completing it:
  * functions, planner strategy, optimizer rule, resolution rule, and
  * now grammar. Three statements Spark has no native grammar for
  * (so interception is strictly additive — any other text delegates
  * to the stock parser untouched):
  *
  *   OPTIMIZE <table>
  *            [WHERE c BETWEEN lo AND hi]      → [[TxLog.compact]]
  *   OPTIMIZE <table> ZORDER BY (a, b)         → [[TxLog.compactZorder]]
  *   VACUUM <table> [LITE] RETAIN <n> VERSIONS
  *          [GRACE <m> SECONDS|MINUTES|HOURS]
  *          [DRY RUN]                          → [[TxLog.vacuum]] /
  *                                              [[TxLog.vacuumDryRun]] /
  *                                              [[TxLog.vacuumLite]]
  *   DESCRIBE HISTORY <table>                  → [[TxLog.history]]
  *   DESCRIBE DETAIL <table>                   → [[TxLog.describeDetail]]
  *   RESTORE [TABLE] <t> [TO] VERSION AS OF n  → [[TxLog.restore]]
  *   RESTORE [TABLE] <t> [TO] TIMESTAMP AS OF 'ts'
  *                    → [[TxLog.versionAtTimestamp]] + [[TxLog.restore]]
  *   CONVERT TO TXLOG '<path>' [STATS (a, b)]  → [[TxLog.convertParquet]]
  *   CREATE TABLE <dst> SHALLOW|DEEP CLONE <src>
  *                [VERSION AS OF n]
  *                [LOCATION '<path>']          → [[TxLog.cloneShallow]] /
  *                                              [[TxLog.cloneDeep]]
  *   ALTER TABLE <t> DROP FEATURE <name>
  *                [TRUNCATE HISTORY]           → [[TxLog.dropFeature]]
  *   COPY INTO <t> FROM '<dir>' FILEFORMAT = <fmt>
  *                [PATTERN = '<glob>']
  *                [FORMAT_OPTIONS ('k'='v', …)] → [[TxLog.copyInto]]
  *   COLLECT VARIANT STATS <t> (col, '$.path', type)
  *                                    → [[TxLog.collectVariantStats]]
  *   ALTER TABLE <t> DECLARE VARIANT STATS (col, '$.path', type)
  *                                    → [[TxLog.declareVariantStats]]
  *   ALTER TABLE <t> DROP VARIANT STATS (col, '$.path')
  *                                    → [[TxLog.dropVariantStats]]
  *
  * (Delta's VACUUM retains by AGE; the log's retention unit is
  * versions — stated in the grammar so nobody mistakes the two.)
  * The table name resolves through the session catalog at RUN time;
  * a non-txlog table fails loudly. */
class TxLogSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    TxLogSqlParser.maintenancePlan(sqlText)
      .getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object TxLogSqlParser {
  private val Ident = """[\w.`]+"""
  private val OptimizeRe =
    (s"""(?is)\\s*OPTIMIZE\\s+($Ident)""" +
      s"""(?:\\s+WHERE\\s+(\\w+)\\s+BETWEEN\\s+('[^']*'|\\S+)\\s+AND\\s+('[^']*'|\\S+))?""" +
      s"""\\s*(?:ZORDER\\s+BY\\s*\\(([^)]*)\\))?\\s*;?\\s*""").r
  private val VacuumRe =
    (s"""(?is)\\s*VACUUM\\s+($Ident)\\s+(LITE\\s+)?RETAIN\\s+(\\d+)\\s+VERSIONS""" +
      s"""(?:\\s+GRACE\\s+(\\d+)\\s+(SECONDS|MINUTES|HOURS))?""" +
      s"""(?:\\s+(DRY\\s+RUN))?\\s*;?\\s*""").r
  private val HistoryRe =
    s"""(?is)\\s*DESCRIBE\\s+HISTORY\\s+($Ident)\\s*;?\\s*""".r
  private val DetailRe =
    s"""(?is)\\s*DESCRIBE\\s+DETAIL\\s+($Ident)\\s*;?\\s*""".r
  // Delta's restore grammar: TABLE and TO are optional; the target is
  // a version number or a quoted timestamp literal (session-timezone
  // naive, ISO instant, or epoch millis — TxLogSource.parseTsMillis)
  private val RestoreRe =
    (s"""(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?($Ident)\\s+(?:TO\\s+)?""" +
      s"""(VERSION|TIMESTAMP)\\s+AS\\s+OF\\s+(?:'([^']*)'|(\\d+))\\s*;?\\s*""").r
  private val ConvertRe =
    (s"""(?is)\\s*CONVERT\\s+TO\\s+TXLOG\\s+'([^']+)'""" +
      s"""(?:\\s+STATS\\s*\\(([^)]*)\\))?\\s*;?\\s*""").r
  private val ShowPartitionsRe =
    s"""(?is)\\s*SHOW\\s+PARTITIONS\\s+($Ident)\\s*;?\\s*""".r
  // Delta 3.4's protocol downgrade; TRUNCATE HISTORY is the optional
  // storage-reclaim follow-up (here: vacuum to the drop version)
  private val DropFeatureRe =
    (s"""(?is)\\s*ALTER\\s+TABLE\\s+($Ident)\\s+DROP\\s+FEATURE\\s+(\\w+)""" +
      s"""(?:\\s+(TRUNCATE\\s+HISTORY))?\\s*;?\\s*""").r
  // Delta's clone grammar: the destination is either an identifier in
  // a graft TxLogCatalog (the warehouse layout IS the catalog, so the
  // clone materializes the table) or an explicit LOCATION path
  // Databricks' idempotent bulk load: only never-loaded files land
  private val CopyIntoRe =
    (s"""(?is)\\s*COPY\\s+INTO\\s+($Ident)\\s+FROM\\s+'([^']+)'\\s+""" +
      s"""FILEFORMAT\\s*=\\s*(\\w+)(?:\\s+PATTERN\\s*=\\s*'([^']+)')?""" +
      s"""(?:\\s+FORMAT_OPTIONS\\s*\\(([^)]*)\\))?\\s*;?\\s*""").r
  private val CloneRe =
    (s"""(?is)\\s*CREATE\\s+TABLE\\s+($Ident)\\s+(SHALLOW|DEEP)\\s+""" +
      s"""CLONE\\s+($Ident)(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+))?""" +
      s"""(?:\\s+LOCATION\\s+'([^']+)')?\\s*;?\\s*""").r
  // variant-path stats: one-shot sweep, standing declaration, drop
  private val CollectVarStatsRe =
    (s"""(?is)\\s*COLLECT\\s+VARIANT\\s+STATS\\s+($Ident)\\s*""" +
      s"""\\(\\s*(\\w+)\\s*,\\s*'([^']+)'\\s*,\\s*(\\w+)\\s*\\)\\s*;?\\s*""").r
  private val DeclareVarStatsRe =
    (s"""(?is)\\s*ALTER\\s+TABLE\\s+($Ident)\\s+DECLARE\\s+VARIANT\\s+""" +
      s"""STATS\\s*\\(\\s*(\\w+)\\s*,\\s*'([^']+)'\\s*,\\s*(\\w+)\\s*\\)""" +
      s"""\\s*;?\\s*""").r
  private val DropVarStatsRe =
    (s"""(?is)\\s*ALTER\\s+TABLE\\s+($Ident)\\s+DROP\\s+VARIANT\\s+""" +
      s"""STATS\\s*\\(\\s*(\\w+)\\s*,\\s*'([^']+)'\\s*\\)\\s*;?\\s*""").r

  /** Split a (possibly backtick-quoted) multipart identifier on dots
    * OUTSIDE backticks, so `my.table` stays one part. */
  private[graft] def parts(ident: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inTicks = false
    ident.foreach {
      case '`' => inTicks = !inTicks
      case '.' if !inTicks => out += cur.result(); cur.clear()
      case ch => cur += ch
    }
    out += cur.result()
    out.toSeq
  }

  private[sources] def maintenancePlan(sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case OptimizeRe(t, wcol, wlo, whi, zcols) =>
        // arity is validated HERE, loudly — a silent fall-through to
        // the stock parser would reject "OPTIMIZE" as unknown syntax
        // with no hint about the supported shape
        val z = Option(zcols).map { cs =>
          // backticks only QUOTE here (a variant key `v$.price` is
          // one identifier) — strip them before the verb sees names
          val cols = cs.split(',')
            .map(_.trim.stripPrefix("`").stripSuffix("`"))
            .filter(_.nonEmpty).toSeq
          if (cols.size < 2) throw new IllegalArgumentException(
            s"OPTIMIZE ... ZORDER BY takes at least two columns " +
              s"(a single key is a plain sort — use OPTIMIZE without " +
              s"ZORDER plus a sorted write); got ${cols.size}: " +
              cols.mkString(", "))
          cols
        }
        def unq(s: String): String =
          if (s.length >= 2 && s.head == '\'' && s.last == '\'')
            s.substring(1, s.length - 1) else s
        val where = Option(wcol).map(c => (c, unq(wlo), unq(whi)))
        if (where.isDefined && z.isDefined)
          throw new IllegalArgumentException(
            "OPTIMIZE ... WHERE scopes bin-packing compaction only; " +
              "combine it with ZORDER BY by z-ordering first, then " +
              "range-compacting follow-up appends")
        Some(TxLogOptimizeCommand(parts(t), z, where = where))
      case VacuumRe(t, lite, n, graceN, graceUnit, dryRun) =>
        val graceMs = Option(graceN).map { g =>
          val unit = graceUnit.toUpperCase match {
            case "SECONDS" => 1000L
            case "MINUTES" => 60000L
            case "HOURS" => 3600000L
          }
          g.toLong * unit
        }
        if (lite != null) {
          require(graceMs.isEmpty && dryRun == null,
            "VACUUM ... LITE is log-driven (no directory listing): " +
              "GRACE and DRY RUN apply to the listing-based full vacuum")
          Some(TxLogVacuumLiteCommand(parts(t), n.toInt))
        }
        else if (dryRun != null)
          Some(TxLogVacuumDryRunCommand(parts(t), n.toInt, graceMs))
        else Some(TxLogVacuumCommand(parts(t), n.toInt, graceMs))
      case HistoryRe(t) =>
        Some(TxLogHistoryCommand(parts(t)))
      case DetailRe(t) =>
        Some(TxLogDetailCommand(parts(t)))
      case RestoreRe(t, kind, quoted, bare) =>
        val byTimestamp = kind.equalsIgnoreCase("TIMESTAMP")
        val target = Option(quoted).getOrElse(bare)
        if (!byTimestamp && quoted != null)
          throw new IllegalArgumentException(
            s"RESTORE ... VERSION AS OF takes a version number, " +
              s"got a string literal '$quoted'")
        if (target == null)
          throw new IllegalArgumentException(
            "RESTORE ... TIMESTAMP AS OF needs a quoted timestamp " +
              "literal or epoch millis")
        Some(TxLogRestoreCommand(parts(t), byTimestamp, target))
      case ConvertRe(path, stats) =>
        val cols = Option(stats).toSeq
          .flatMap(_.split(',').map(_.trim).filter(_.nonEmpty))
        Some(TxLogConvertCommand(path, cols))
      // claimed ONLY for txlog targets: Spark HAS its own SHOW
      // PARTITIONS grammar (unlike OPTIMIZE/VACUUM), so any table the
      // resolver does not recognize as a txlog store falls through to
      // the delegate untouched — interception stays strictly additive
      case ShowPartitionsRe(t) =>
        val p = parts(t)
        val isTx =
          try { resolveBase(org.apache.spark.sql.SparkSession.active, p)
                true }
          catch { case scala.util.control.NonFatal(_) => false }
        if (isTx) Some(TxLogShowPartitionsCommand(p)) else None
      case DropFeatureRe(t, feature, trunc) =>
        Some(TxLogDropFeatureCommand(parts(t), feature, trunc != null))
      case CopyIntoRe(t, dir, fmt, pat, opts) =>
        // split on commas OUTSIDE quotes: option VALUES legitimately
        // contain commas ('sep' = ',' is the standard CSV delimiter)
        def splitOpts(text: String): Seq[String] = {
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          val cur = new StringBuilder
          var inQ = false
          text.foreach {
            case '\'' => inQ = !inQ; cur += '\''
            case ',' if !inQ => out += cur.result(); cur.clear()
            case ch => cur += ch
          }
          out += cur.result()
          out.toSeq
        }
        val options = Option(opts).toSeq.flatMap(splitOpts).flatMap { kv =>
          val m = """\s*'([^']*)'\s*=\s*'([^']*)'\s*""".r
          kv match {
            case m(k, v) => Some(k -> v)
            case blank if blank.trim.isEmpty => None
            case other => throw new IllegalArgumentException(
              s"FORMAT_OPTIONS entries are 'key' = 'value' pairs, got: " +
                other.trim)
          }
        }.toMap
        Some(TxLogCopyIntoCommand(parts(t), dir, fmt.toLowerCase,
          Option(pat), options))
      case CloneRe(dst, kind, src, ver, loc) =>
        Some(TxLogCloneCommand(parts(dst),
          deep = kind.equalsIgnoreCase("DEEP"), parts(src), Option(loc),
          Option(ver).map(_.toLong)))
      case CollectVarStatsRe(t, c, p, ty) =>
        Some(TxLogVariantStatsCommand(parts(t), c, p, Some(ty), "collect"))
      case DeclareVarStatsRe(t, c, p, ty) =>
        Some(TxLogVariantStatsCommand(parts(t), c, p, Some(ty), "declare"))
      case DropVarStatsRe(t, c, p) =>
        Some(TxLogVariantStatsCommand(parts(t), c, p, None, "drop"))
      case _ => None
    }

  /** The store root behind a catalog table name — fails loudly when
    * the name does not resolve to a txlog table. */
  private[graft] def resolveBase(spark: SparkSession,
                                   table: Seq[String]): String = {
    val plan = spark.table(table.mkString(".")).queryExecution.analyzed
    plan.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[TxLogTable] =>
        r.table.asInstanceOf[TxLogTable].basePath
    }.getOrElse(throw new IllegalArgumentException(
      s"${table.mkString(".")} is not a txlog table — OPTIMIZE/VACUUM/" +
        "DESCRIBE HISTORY apply to tables USING graft.sources.TxLogSource"))
  }
}

/** `OPTIMIZE t [ZORDER BY (a, b)]` → bin-pack small files (or re-tile
  * small/straggler files into Z-tiles with 2-D stats). Default
  * thresholds: fold files under 2^20 live rows into ~2^22-row
  * outputs — the row-count analog of Delta's default file-size bins.
  * Returns the published version (unchanged when nothing to do). */
case class TxLogOptimizeCommand(table: Seq[String],
                                zorder: Option[Seq[String]],
                                smallThresholdRows: Long = 1L << 20,
                                targetRows: Long = 1L << 22,
                                where: Option[(String, String, String)] =
                                  None)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val base = TxLogSqlParser.resolveBase(spark, table)
    val v = zorder match {
      case Some(cols) => TxLog.compactZorder(spark, base, cols,
        smallThresholdRows, targetRows)
      case None => TxLog.compact(spark, base, smallThresholdRows, targetRows,
        statsCol0 = where.map(_._1), range0 = where)
    }
    Seq(Row(v))
  }
}

/** `VACUUM t RETAIN n VERSIONS [GRACE …] DRY RUN` → everything the
  * identically-parameterized vacuum WOULD delete, as (kind, path)
  * rows; nothing is touched. */
case class TxLogVacuumDryRunCommand(table: Seq[String], keepLast: Int,
                                    graceMs: Option[Long] = None)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.types.StringType
  override val output: Seq[Attribute] = Seq(
    AttributeReference("kind", StringType, nullable = false)(),
    AttributeReference("path", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val base = TxLogSqlParser.resolveBase(spark, table)
    TxLog.vacuumDryRun(spark, base, keepLast,
      graceMs.getOrElse(3600000L)).collect().toSeq
  }
}

/** `VACUUM t RETAIN n VERSIONS [GRACE m SECONDS|MINUTES|HOURS]` →
  * drop all but the newest n manifests and every unreferenced txn dir
  * OLDER than the grace window (default 1 hour — a concurrent
  * writer's not-yet-published dir must survive; `GRACE 0 SECONDS` is
  * the controlled-maintenance-window escape hatch that forces full
  * reclamation, the SQL twin of the Scala `graceMs=0`). Returns the
  * surviving versions. */
case class TxLogVacuumCommand(table: Seq[String], keepLast: Int,
                              graceMs: Option[Long] = None)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val base = TxLogSqlParser.resolveBase(spark, table)
    graceMs match {
      case Some(g) => TxLog.vacuum(spark, base, keepLast, g).map(Row(_))
      case None => TxLog.vacuum(spark, base, keepLast).map(Row(_))
    }
  }
}

/** Variant-path stats over SQL — the three spellings of
  * [[TxLog.collectVariantStats]]/[[TxLog.declareVariantStats]]/
  * [[TxLog.dropVariantStats]]:
  * {{{
  *   COLLECT VARIANT STATS t (v, '$.price', long)        -- one sweep
  *   ALTER TABLE t DECLARE VARIANT STATS (v, '$.price', long)
  *   ALTER TABLE t DROP VARIANT STATS (v, '$.price')
  * }}}
  * Returns the published version. */
case class TxLogVariantStatsCommand(table: Seq[String], col: String,
                                    path: String,
                                    targetType: Option[String],
                                    mode: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val base = TxLogSqlParser.resolveBase(spark, table)
    val v = mode match {
      case "collect" =>
        TxLog.collectVariantStats(spark, base, col, path, targetType.get)
      case "declare" =>
        TxLog.declareVariantStats(spark, base, col, path, targetType.get)
      case _ => TxLog.dropVariantStats(spark, base, col, path)
    }
    Seq(Row(v))
  }
}

/** `CONVERT TO TXLOG '<path>' [STATS (a, b)]` → adopt an existing
  * flat parquet directory in place (Delta `CONVERT TO DELTA`): one
  * metadata commit, zero data copied, per-file min/max stats on the
  * STATS columns computed in the same pass. Returns the version (1). */
case class TxLogConvertCommand(path: String, statsCols: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxLog.convertParquet(spark, path, statsCols)))
}

/** `SHOW PARTITIONS t` → the manifest's partition inventory
  * ([[TxLog.showPartitions]]): one row per live tuple with file/row
  * counts, zero data files opened. */
case class TxLogShowPartitionsCommand(table: Seq[String])
    extends LeafRunnableCommand {
  import org.apache.spark.sql.types.StringType
  override val output: Seq[Attribute] = Seq(
    AttributeReference("partition", StringType, nullable = false)(),
    AttributeReference("num_files", LongType, nullable = false)(),
    AttributeReference("num_rows", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val base = TxLogSqlParser.resolveBase(spark, table)
    TxLog.showPartitions(spark, base).collect().toSeq
  }
}

/** `DESCRIBE DETAIL t` → the one-row [[TxLog.describeDetail]]
  * surface over SQL/JDBC (format, location, version, live counts,
  * physical bytes, metadata inventory, checkpoint version). */
case class TxLogDetailCommand(table: Seq[String])
    extends LeafRunnableCommand {
  import org.apache.spark.sql.types.StringType
  override val output: Seq[Attribute] = Seq(
    AttributeReference("format", StringType, nullable = false)(),
    AttributeReference("location", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("last_modified_ms", LongType, nullable = false)(),
    AttributeReference("num_files", LongType, nullable = false)(),
    AttributeReference("num_rows", LongType, nullable = true)(),
    AttributeReference("num_masked_rows", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)(),
    AttributeReference("stats_columns", StringType, nullable = false)(),
    AttributeReference("num_constraints", LongType, nullable = false)(),
    AttributeReference("num_identity_cols", LongType, nullable = false)(),
    AttributeReference("num_bloom_cols", LongType, nullable = false)(),
    AttributeReference("num_txn_apps", LongType, nullable = false)(),
    AttributeReference("checkpoint_version", LongType, nullable = true)(),
    AttributeReference("min_reader_version",
      org.apache.spark.sql.types.IntegerType, nullable = false)(),
    AttributeReference("min_writer_version",
      org.apache.spark.sql.types.IntegerType, nullable = false)(),
    AttributeReference("partition_columns", StringType, nullable = false)(),
    AttributeReference("clustering_columns", StringType,
      nullable = false)(),
    AttributeReference("row_tracking",
      org.apache.spark.sql.types.BooleanType, nullable = false)(),
    AttributeReference("default_columns", StringType, nullable = false)(),
    AttributeReference("widened_columns", StringType, nullable = false)(),
    AttributeReference("variant_stats", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val base = TxLogSqlParser.resolveBase(spark, table)
    TxLog.describeDetail(spark, base).collect().toSeq
  }
}

/** `RESTORE [TABLE] t [TO] VERSION|TIMESTAMP AS OF x` → republish the
  * target version's state as a NEW version ([[TxLog.restore]] — the
  * Delta restore verb, history never rewritten). Returns the restored
  * source version and the newly published one. */
case class TxLogRestoreCommand(table: Seq[String], byTimestamp: Boolean,
                               target: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("restored_version", LongType, nullable = false)(),
    AttributeReference("new_version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val base = TxLogSqlParser.resolveBase(spark, table)
    val v =
      if (byTimestamp) TxLog.versionAtTimestamp(spark, base,
        TxLogSource.parseTsMillis(spark, target))
      else target.toLong
    Seq(Row(v, TxLog.restore(spark, base, v)))
  }
}

/** `DESCRIBE HISTORY t` → one row per surviving version (the
  * [[TxLog.history]] surface over SQL/JDBC). */
case class TxLogHistoryCommand(table: Seq[String])
    extends LeafRunnableCommand {
  import org.apache.spark.sql.types.StringType
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("timestamp_ms", LongType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = true)(),
    AttributeReference("n_files", LongType, nullable = false)(),
    AttributeReference("n_rows", LongType, nullable = true)(),
    AttributeReference("n_added_files", LongType, nullable = false)(),
    AttributeReference("n_txn_apps", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val base = TxLogSqlParser.resolveBase(spark, table)
    TxLog.history(spark, base).collect().toSeq
  }
}

/** `CREATE TABLE dst SHALLOW|DEEP CLONE src [LOCATION '<path>']` →
  * [[TxLog.cloneShallow]] / [[TxLog.cloneDeep]]. The destination is
  * resolved to a store root: an explicit LOCATION wins; otherwise the
  * identifier must live in a graft [[TxLogCatalog]], whose warehouse
  * layout IS the catalog — cloning into `<warehouse>/ns/t`
  * materializes the table, immediately visible to every session
  * sharing the warehouse. Returns the destination base and the
  * published version (always 1 — a clone is a new table). */
case class TxLogCloneCommand(dst: Seq[String], deep: Boolean,
                             src: Seq[String], location: Option[String],
                             versionAsOf: Option[Long] = None)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.types.StringType
  override val output: Seq[Attribute] = Seq(
    AttributeReference("base", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val srcBase = TxLogSqlParser.resolveBase(spark, src)
    val dstBase = location.getOrElse {
      val cm = spark.sessionState.catalogManager
      // `cat.ns….t` names its catalog explicitly; a bare ident clones
      // into the CURRENT catalog (iff that is a TxLogCatalog)
      val explicit = dst.size >= 2 &&
        (try { cm.catalog(dst.head); true }
         catch { case scala.util.control.NonFatal(_) => false })
      val (cat, rest) =
        if (explicit) (cm.catalog(dst.head), dst.tail)
        else (cm.currentCatalog, dst)
      cat match {
        case c: TxLogCatalog =>
          require(rest.nonEmpty, "clone destination needs a table name")
          c.tableLocation(org.apache.spark.sql.connector.catalog.Identifier
            .of(rest.init.toArray, rest.last))
        case other => throw new IllegalArgumentException(
          s"CREATE TABLE ... CLONE resolves its destination through a " +
            s"graft TxLogCatalog or an explicit LOCATION '<path>'; " +
            s"'${dst.mkString(".")}' lands in catalog " +
            s"'${other.name}' (${other.getClass.getName})")
      }
    }
    val v = if (deep) TxLog.cloneDeep(spark, srcBase, dstBase, versionAsOf)
            else TxLog.cloneShallow(spark, srcBase, dstBase, versionAsOf)
    Seq(Row(dstBase, v))
  }
}

/** `ALTER TABLE t DROP FEATURE <name> [TRUNCATE HISTORY]` →
  * [[TxLog.dropFeature]]: remove a table feature, run its in-commit
  * cleanup (e.g. the narrow-file rewrite for typeWidening), and LOWER
  * the protocol floors to what the remaining features demand — the
  * verb that lets an older engine build read/write a long-lived table
  * again. TRUNCATE HISTORY additionally vacuums every version below
  * the drop (needed only to reclaim storage; per-version protocol
  * stamps keep time travel below the drop sound without it). */
case class TxLogDropFeatureCommand(table: Seq[String], feature: String,
                                   truncateHistory: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val base = TxLogSqlParser.resolveBase(spark, table)
    val v = TxLog.dropFeature(spark, base, feature)
    if (truncateHistory) TxLog.vacuum(spark, base, keepLast = 1)
    Seq(Row(v))
  }
}

/** `COPY INTO t FROM '<dir>' FILEFORMAT = <fmt> [PATTERN = '<glob>']
  * [FORMAT_OPTIONS ('k'='v', ...)]` → [[TxLog.copyInto]]: load every
  * not-yet-loaded file under the directory in ONE ACID append —
  * re-running is exactly-once per file (per-path markers ride the
  * manifest's txn map, so the state is checkpoint-durable and needs
  * no protocol bump). The reference's scheduled bronze load as a
  * single SQL statement. */
case class TxLogCopyIntoCommand(table: Seq[String], srcDir: String,
                                format: String, pattern: Option[String],
                                options: Map[String, String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("num_files_loaded", LongType, nullable = false)(),
    AttributeReference("num_rows_loaded", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val base = TxLogSqlParser.resolveBase(spark, table)
    val (v, nf, nr) = TxLog.copyInto(spark, base, srcDir, format,
      options, pattern)
    Seq(Row(v, nf, nr))
  }
}

/** `VACUUM t LITE RETAIN n VERSIONS` → [[TxLog.vacuumLite]]: the
  * log-driven vacuum (Delta 3.3's VACUUM LITE) — reclaims exactly the
  * files dropped versions referenced, with zero data-tree listing and
  * executor-side delete fan-out. Returns one row per surviving
  * version plus the reclaim count on the first row. */
case class TxLogVacuumLiteCommand(table: Seq[String], keepLast: Int)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("files_reclaimed", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val base = TxLogSqlParser.resolveBase(spark, table)
    val (kept, n) = TxLog.vacuumLite(spark, base, keepLast)
    kept.zipWithIndex.map { case (v, i) =>
      Row(v, if (i == 0) n else 0L) }
  }
}
