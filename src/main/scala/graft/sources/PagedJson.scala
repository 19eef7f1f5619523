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
  *   - schema inference (`spark.read` without an explicit schema) is
  *     a metadata operation on the FIRST page only — the paged
  *     analogue of the reference's describe-then-read two-pass.
  *
  * Usage: `spark.read.format("graft.sources.PagedJsonSource")
  *   .schema(...).load(dir)`.
  */
class PagedJsonSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val dir = options.get("path")
    require(dir != null, "paged-json source requires a path")
    val first = PagedJsonSource.listPages(dir).headOption.getOrElse(
      throw new IllegalArgumentException(s"no page-*.jsonl files under $dir"))
    SparkSession.active.read.json(first.toString).schema
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PagedJsonTable(schema, properties.get("path"))
}

object PagedJsonSource {
  /** Page files in cursor order. Driver-side metadata listing only. */
  def listPages(dir: String): Seq[HPath] = {
    val p = new HPath(dir)
    val fs = p.getFileSystem(new Configuration())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath)
      .filter(_.getName.matches("page-\\d+\\.jsonl"))
      .sortBy(_.getName).toSeq
  }

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
    df.withColumn("__page", pmod(col(idCol), lit(nPages)).cast("int"))
      .repartition(nPages, col("__page"))
      .write.mode("overwrite").partitionBy("__page").json(staging)
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
        fs.rename(parts.head, new HPath(out, f"page-$i%05d.jsonl"))
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
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedJsonScanBuilder(tableSchema, path)
}

class PagedJsonScanBuilder(full: StructType, path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new PagedJsonScan(required, path)
}

class PagedJsonScan(required: StructType, path: String) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"PagedJsonScan path=$path, readSchema=${required.simpleString}"
  override def planInputPartitions(): Array[InputPartition] =
    PagedJsonSource.listPages(path)
      .map(p => PagedJsonInputPartition(p.toString): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new PagedJsonReaderFactory(required)
}

case class PagedJsonInputPartition(file: String) extends InputPartition

class PagedJsonReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PagedJsonPartitionReader(
      partition.asInstanceOf[PagedJsonInputPartition].file, required)
}

/** One page = one task: stream the page's lines through the shared
  * Jackson parser (constructed HERE, executor-side — it is not
  * serializable) against only the pruned schema. */
class PagedJsonPartitionReader(file: String, required: StructType)
    extends PartitionReader[InternalRow] {
  private val parse = JsonLineBridge.lineParser(required)
  private val hPath = new HPath(file)
  private val stream = hPath.getFileSystem(new Configuration()).open(hPath)
  private val lines = scala.io.Source.fromInputStream(stream, "UTF-8").getLines()
  private val rows = lines.filter(_.nonEmpty).flatMap(parse)
  private var current: InternalRow = _

  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = stream.close()
}
