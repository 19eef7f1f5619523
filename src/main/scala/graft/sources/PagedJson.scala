package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.graftbridge.JsonLineBridge
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 reader for the reference's paged-crawl feed shape
  * (SURVEY §2.1 S10: airflow/dags/end_to_end_pipeline.py:33-66 pulls
  * the listings API page by page and lands each page as JSONL). The
  * HTTP half stays out-of-engine by design; THIS is the in-engine
  * half done natively: a `TableProvider` whose unit of parallelism is
  * the PAGE — `planInputPartitions` returns one `InputPartition` per
  * `page-NNNNN.jsonl` file, so a 10k-page crawl scans as 10k
  * independent tasks with no driver-side row handling at all.
  *
  * Scale/pushdown contract:
  *   - column pruning is pushed INTO the parser
  *     (`SupportsPushDownRequiredColumns` → Jackson skips unread
  *     fields token-by-token, see [[JsonLineBridge.lineParser]]);
  *   - pages are listed once on the driver (the API-cursor analogue)
  *     and stream through executor-side Hadoop FS readers — works on
  *     any Hadoop-visible filesystem, nothing is collected;
  *   - schema inference (`spark.read` without an explicit schema)
  *     unions inference across ALL pages — the paged analogue of the
  *     reference's all-files two-pass (load_bronze_to_table.py:
  *     130-133), needed because the crawl's key set is ragged per
  *     listing: a field that first appears on page 2 must still
  *     surface. `samplePages=N` bounds the inference pass for
  *     crawls too large to full-scan twice (100 TB case) — an
  *     explicit, documented trade: fields appearing only AFTER the
  *     first N pages are then dropped on a schema-less read;
  *   - `maxPagesPerPartition=N` coalesces N consecutive pages into
  *     one input partition (order preserved within the partition) —
  *     without it a 100 TB crawl of small pages would plan millions
  *     of tiny tasks; with it, parallelism is bounded by
  *     ceil(pages/N) while row identity is untouched.
  *
  * Usage: `spark.read.format("graft.sources.PagedJsonSource")
  *   .schema(...).load(dir)`.
  */
class PagedJsonSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val dir = options.get("path")
    require(dir != null, "paged-json source requires a path")
    val pages = PagedJsonSource.listPages(dir, PagedJsonSource.driverHadoopConf())
    if (pages.isEmpty)
      throw new IllegalArgumentException(s"no page-*.jsonl files under $dir")
    // union inference across pages (the builtin JSON source's multi-
    // file behavior): the crawl is ragged — a key first appearing on
    // page 2 must not be silently dropped. samplePages caps the pass
    // for crawls where a full second read is unaffordable.
    val sample = Option(options.get("samplePages")) match {
      case Some(n) =>
        require(n.toInt > 0, s"samplePages must be positive, got $n")
        pages.take(n.toInt)
      case None => pages
    }
    SparkSession.active.read.json(sample.map(_.toString): _*).schema
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // validated here, not only in inferSchema: the explicit-schema
    // read path (supportsExternalMetadata) never calls inferSchema
    val path = properties.get("path")
    require(path != null, "paged-json source requires a path")
    new PagedJsonTable(schema, path)
  }
}

object PagedJsonSource {
  /** The session's Hadoop configuration (driver-side) — so
    * spark.hadoop.* settings (credentials, defaultFS) reach this
    * source exactly as they reach the builtin ones. */
  private[sources] def driverHadoopConf(): Configuration =
    SparkSession.active.sparkContext.hadoopConfiguration

  /** Page files in cursor order — NUMERIC page order, not
    * lexicographic (page-100000 must sort after page-99999, and
    * mixed-width names must not interleave; the streaming cursor
    * slices this sequence by position, so ordering IS correctness
    * there). Driver-side metadata listing only. */
  def listPages(dir: String, conf: Configuration): Seq[HPath] = {
    val p = new HPath(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath)
      .filter(_.getName.matches("page-\\d+\\.jsonl"))
      .sortBy(pageNumber)
      .toSeq
  }

  /** The page's NUMBER — the cursor's unit of identity (a count is
    * not: a late page filling a numbering gap below the cursor shifts
    * every later position while keeping counts monotone). */
  def pageNumber(p: HPath): Long =
    p.getName.stripPrefix("page-").stripSuffix(".jsonl").toLong

  /** Write one hand-built page file in the layout's naming scheme —
    * the harness uses this for far-future SENTINEL pages that advance
    * stream watermarks deterministically (one page per micro-batch).
    * Kept here so the naming stays in lockstep with
    * [[listPages]]/[[buildPages]]. */
  def writePage(dir: String, idx: Int, lines: Seq[String]): Unit =
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir).resolve(f"page-$idx%05d.jsonl"),
      scala.jdk.CollectionConverters.SeqHasAsJava(lines).asJava,
      java.nio.charset.StandardCharsets.UTF_8)

  /** Fixture builder: lay `df` out as the crawl's page directory
    * (`page-00000.jsonl` …), one JSONL file per page — the landed
    * shape of the reference's paged API pull
    * (end_to_end_pipeline.py:104-163). Page assignment by
    * `idCol % nPages` is synthetic (a real cursor pages by arrival);
    * the executors write each page, the driver only renames. */
  def buildPages(df: org.apache.spark.sql.DataFrame, idCol: String,
                 nPages: Int, dir: String): String = {
    import org.apache.spark.sql.functions._
    val staging = dir + "__build"
    // NULL ids route to page 0 (pmod(NULL) is NULL, which would land
    // in the Hive default partition and be silently dropped by the
    // rename loop below — rows are never lost to the paging)
    df.withColumn("__page",
        coalesce(pmod(col(idCol), lit(nPages)), lit(0)).cast("int"))
      .repartition(nPages, col("__page"))
      .write.mode("overwrite").partitionBy("__page")
      // full microsecond precision: the default JSON timestampFormat
      // writes [.SSS] and silently truncates micros, which would make
      // a paged round trip of TIMESTAMP columns lossy (reads are
      // lenient and accept any fraction width)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .json(staging)
    val out = new HPath(dir)
    val fs = out.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    fs.delete(out, true)
    fs.mkdirs(out)
    (0 until nPages).foreach { i =>
      val partDir = new HPath(s"$staging/__page=$i")
      if (fs.exists(partDir)) {
        val parts = fs.listStatus(partDir).map(_.getPath)
          .filter(_.getName.startsWith("part-"))
        require(parts.length == 1,
          s"expected one part file per page, got ${parts.length} in $partDir")
        val dest = new HPath(out, f"page-$i%05d.jsonl")
        // HDFS-style FileSystems report most rename failures by
        // returning false, not throwing — a dropped page must abort
        require(fs.rename(parts.head, dest), s"rename failed: $dest")
      }
    }
    fs.delete(new HPath(staging), true)
    dir
  }
}

class PagedJsonTable(tableSchema: StructType, path: String)
    extends Table with SupportsRead {
  override def name(): String = s"paged_json($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedJsonScanBuilder(tableSchema, path, options)
}

class PagedJsonScanBuilder(full: StructType, path: String,
                           options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  // ALL filters stay residual (returned back to Spark): the parser
  // uses them to skip failing rows mid-parse (the builtin JSON
  // source's own pushdown shape), while Spark re-applies them above,
  // so the skip can never change results. Parity with the builtin:
  // the spark.sql.json.filterPushdown escape hatch is honored, and
  // only the subset the parser can actually evaluate is REPORTED as
  // pushed.
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed =
      if (JsonLineBridge.jsonFilterPushdownEnabled)
        JsonLineBridge.convertibleFilters(filters, full)
      else Array.empty
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = {
    val pagesPerPartition =
      Option(options.get("maxPagesPerPartition")).map(_.toInt).getOrElse(1)
    require(pagesPerPartition >= 1,
      s"maxPagesPerPartition must be >= 1, got $pagesPerPartition")
    new PagedJsonScan(required, path, pushed,
      Option(options.get("maxPagesPerTrigger")).map(_.toInt),
      pagesPerPartition)
  }
}

class PagedJsonScan(required: StructType, path: String,
                    pushed: Array[Filter], maxPagesPerTrigger: Option[Int],
                    pagesPerPartition: Int)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new PagedJsonMicroBatchStream(this, path, maxPagesPerTrigger)
  override def description(): String =
    s"PagedJsonScan path=$path, readSchema=${required.simpleString}, " +
      s"pushedFilters=[${pushed.mkString(", ")}]"
  /** Consecutive pages coalesce into one partition (bounded task
    * count at scale); cursor order is preserved both across and
    * within partitions, so row identity is unchanged. */
  private[sources] def groupPages(pages: Seq[HPath]): Array[InputPartition] =
    pages.map(_.toString).grouped(pagesPerPartition)
      .map(g => PagedJsonInputPartition(g): InputPartition).toArray
  override def planInputPartitions(): Array[InputPartition] =
    groupPages(
      PagedJsonSource.listPages(path, PagedJsonSource.driverHadoopConf()))
  // driver-side capture of the session's Hadoop conf + timezone, so
  // executor readers see spark.hadoop.* settings and parse zone-less
  // timestamps exactly like the builtin JSON source; ONE factory
  // builder shared by the batch and streaming halves
  private[sources] def readerFactory(): PartitionReaderFactory =
    new PagedJsonReaderFactory(required,
      new org.apache.spark.util.SerializableConfiguration(
        PagedJsonSource.driverHadoopConf()),
      JsonLineBridge.sessionTimeZone, pushed)
  override def createReaderFactory(): PartitionReaderFactory = readerFactory()
}

case class PagedJsonInputPartition(files: Seq[String]) extends InputPartition

class PagedJsonReaderFactory(
    required: StructType,
    conf: org.apache.spark.util.SerializableConfiguration,
    timeZoneId: String,
    pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PagedJsonPartitionReader(
      partition.asInstanceOf[PagedJsonInputPartition].files, required,
      conf.value, timeZoneId, pushed)
}

/** One partition = one task over its (coalesced) pages, read in
  * cursor order, one open stream at a time: the lines flow through
  * the shared Jackson parser (constructed HERE, executor-side — it
  * is not serializable) against only the pruned schema. */
class PagedJsonPartitionReader(files: Seq[String], required: StructType,
                               conf: Configuration, timeZoneId: String,
                               pushed: Array[Filter])
    extends PartitionReader[InternalRow] {
  private val parse =
    JsonLineBridge.lineParser(required, timeZoneId, pushed.toSeq)
  private var fileIdx = -1
  private var stream: org.apache.hadoop.fs.FSDataInputStream = _
  private var rows: Iterator[InternalRow] = Iterator.empty
  private var current: InternalRow = _

  private def advanceFile(): Boolean = {
    if (stream != null) { stream.close(); stream = null }
    fileIdx += 1
    if (fileIdx >= files.length) false
    else {
      val hPath = new HPath(files(fileIdx))
      stream = hPath.getFileSystem(conf).open(hPath)
      rows = scala.io.Source.fromInputStream(stream, "UTF-8").getLines()
        .filter(_.trim.nonEmpty).flatMap(parse)
      true
    }
  }

  @scala.annotation.tailrec
  final override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true }
    else if (advanceFile()) next()
    else false
  override def get(): InternalRow = current
  override def close(): Unit = if (stream != null) stream.close()
}

/** The API cursor as a STREAMING offset: the paged feed consumed as
  * a micro-batch stream, offset = "number of pages consumed so far".
  * Each poll re-lists the page directory (the cursor check), a batch
  * plans exactly the pages in [start, end) — one task per page (or per maxPagesPerPartition pages) — and
  * the checkpoint persists the cursor, so a restarted query resumes
  * at the first unconsumed page.
  *
  * Contract: the crawl's page layout is APPEND-ONLY and IMMUTABLE —
  * new pages carry numbers greater than every existing page (cursor
  * order = numeric page order, see [[PagedJsonSource.listPages]]),
  * and consumed pages never change. The offset therefore persists
  * the positional cursor (pages consumed), the NUMBER of the last
  * consumed page, AND a rolling fingerprint of every consumed page
  * number in order: a count alone cannot detect a late page filling
  * a numbering gap below the cursor or a delete+recreate that
  * preserves count, and the last number alone cannot detect a
  * count-preserving delete+gap-fill pair — all of these shift
  * positions in the sorted listing, so a positional slice would
  * silently re-ship a consumed page and skip the new one. Every poll
  * and every planned batch re-verifies the consumed prefix against
  * the checkpointed fingerprint and aborts the query on any mismatch
  * (as it does when the listing count regresses).
  *
  * Admission control: `maxPagesPerTrigger` (read option) bounds each
  * micro-batch; with `Trigger.AvailableNow` the target offset is
  * frozen up front ([[SupportsTriggerAvailableNow]] — without it
  * Spark would silently fall back to single-batch Trigger.Once
  * semantics) and the backlog drains in maxPagesPerTrigger-sized
  * batches, each with its own checkpoint commit. Column pruning and
  * residual filter-skipping are inherited from the batch scan
  * unchanged (shared reader factory). */
/** `pages` = positional cursor (pages consumed); `lastPage` = page
  * NUMBER of the last consumed page (-1 when nothing is consumed);
  * `prefixHash` = rolling fingerprint over ALL consumed page numbers
  * in cursor order ([[PagedJsonOffset.prefixHash]]), None when the
  * checkpoint predates the field (legacy offsets deserialize without
  * it and skip the identity check once). The full-prefix fingerprint
  * is what actually carries the immutability contract: checking only
  * the number at position pages-1 would miss a count-preserving
  * delete-below-cursor combined with a gap-fill (listing [0,5] →
  * [1,5]: same length, same last number, different consumed pages).
  * Equality is positional — the rest is validation payload. */
class PagedJsonOffset(val pages: Int, val lastPage: Long = -1L,
                      val prefixHash: Option[Long] = None)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = prefixHash match {
    case Some(h) => s"""{"pages":$pages,"lastPage":$lastPage,"prefixHash":$h}"""
    case None => s"""{"pages":$pages,"lastPage":$lastPage}"""
  }
  override def equals(o: Any): Boolean = o match {
    case p: PagedJsonOffset => p.pages == pages
    case _ => false
  }
  override def hashCode(): Int = pages
}

object PagedJsonOffset {
  /** Order-sensitive fold over the first `n` listed pages' NUMBERS —
    * any mutation of the consumed prefix (replace, delete+gap-fill,
    * reorder) changes it. */
  def prefixHash(pages: Seq[HPath], n: Int): Long =
    pages.take(n).foldLeft(17L)((h, p) =>
      h * 1000003L + PagedJsonSource.pageNumber(p))
}

class PagedJsonMicroBatchStream(scan: PagedJsonScan, path: String,
                                maxPagesPerTrigger: Option[Int])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit, ReadMaxFiles}

  // last directory snapshot (reused by planInputPartitions — one
  // listing per poll, not two) and the high-water cursor (never
  // allowed to regress; fed by polls AND checkpointed offsets)
  private var lastListing: Seq[HPath] = Seq.empty
  private var maxSeen = 0
  private var availableNowCap: Option[Int] = None

  private def poll(): Int = {
    val pages = PagedJsonSource.listPages(path, PagedJsonSource.driverHadoopConf())
    require(pages.length >= maxSeen,
      s"page directory regressed: listed ${pages.length} pages below the " +
        s"high-water cursor $maxSeen — the layout must be append-only")
    lastListing = pages
    maxSeen = pages.length
    pages.length
  }

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(poll())

  override def getDefaultReadLimit: ReadLimit =
    maxPagesPerTrigger.map(n => ReadLimit.maxFiles(n))
      .getOrElse(ReadLimit.allAvailable())

  override def initialOffset(): Offset = new PagedJsonOffset(0)

  // unused once SupportsAdmissionControl is in play — Spark drives
  // the two-arg variant below
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used (SupportsAdmissionControl)")

  /** The identity check a positional cursor needs: the consumed
    * prefix of the current listing must still carry exactly the
    * checkpointed page numbers, fingerprint-compared in order. A late
    * gap-filling page, a delete, or a delete+recreate below the
    * cursor — including count-preserving combinations — changes the
    * fingerprint: abort rather than silently re-ship/skip. */
  private def validateCursor(off: PagedJsonOffset): Unit =
    if (off.pages > 0 && off.lastPage >= 0) {
      require(lastListing.length >= off.pages,
        s"page directory regressed: ${lastListing.length} pages listed " +
          s"below the cursor ${off.pages}")
      val actual = PagedJsonSource.pageNumber(lastListing(off.pages - 1))
      require(actual == off.lastPage,
        s"page directory mutated below the cursor: position ${off.pages - 1} " +
          s"is now page-$actual but the checkpoint consumed through " +
          s"page-${off.lastPage} — a late page filled a numbering gap or a " +
          "consumed page was replaced; the layout must be append-only")
      off.prefixHash.foreach { expected =>
        require(PagedJsonOffset.prefixHash(lastListing, off.pages) == expected,
          s"page directory mutated below the cursor: the ${off.pages} " +
            "consumed pages' numbers no longer match the checkpointed " +
            "prefix fingerprint — a consumed page was deleted/replaced " +
            "and a later page shifted into its position; the layout must " +
            "be append-only")
      }
    }

  private def offsetAt(pages: Int): PagedJsonOffset =
    if (pages == 0) new PagedJsonOffset(0)
    else new PagedJsonOffset(pages,
      PagedJsonSource.pageNumber(lastListing(pages - 1)),
      Some(PagedJsonOffset.prefixHash(lastListing, pages)))

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startOff = start.asInstanceOf[PagedJsonOffset]
    val from = startOff.pages
    val avail = availableNowCap.getOrElse(poll())
    if (lastListing.length < from) poll() // restart path: stale snapshot
    validateCursor(startOff)
    val to = limit match {
      case mf: ReadMaxFiles => math.min(avail, from + mf.maxFiles())
      case _ => avail
    }
    offsetAt(math.max(from, to))
  }

  override def reportLatestOffset(): Offset = new PagedJsonOffset(maxSeen)

  override def deserializeOffset(json: String): Offset = {
    val hashed =
      """\{"pages":(\d+),"lastPage":(-?\d+),"prefixHash":(-?\d+)\}""".r
    val numbered = """\{"pages":(\d+),"lastPage":(-?\d+)\}""".r
    val legacy = """\{"pages":(\d+)\}""".r
    json.trim match {
      case hashed(n, lp, ph) =>
        maxSeen = math.max(maxSeen, n.toInt)
        new PagedJsonOffset(n.toInt, lp.toLong, Some(ph.toLong))
      case numbered(n, lp) =>
        maxSeen = math.max(maxSeen, n.toInt)
        new PagedJsonOffset(n.toInt, lp.toLong)
      case legacy(n) =>
        maxSeen = math.max(maxSeen, n.toInt)
        new PagedJsonOffset(n.toInt)
      case other => throw new IllegalArgumentException(
        s"malformed paged-json offset: $other")
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val startOff = start.asInstanceOf[PagedJsonOffset]
    val endOff = end.asInstanceOf[PagedJsonOffset]
    val from = startOff.pages
    val to = endOff.pages
    if (lastListing.length < to) poll() // restart path: no snapshot yet
    require(lastListing.length >= to,
      s"page directory regressed: cannot plan [${from}, ${to}) over " +
        s"${lastListing.length} listed pages")
    validateCursor(startOff)
    validateCursor(endOff)
    scan.groupPages(lastListing.slice(from, to))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    scan.readerFactory()
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
