package graft.operators

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic manifest-commit log over plain parquet — the ACID half of
  * the reference's Delta surface (`_delta_log` commit protocol,
  * scripts/load_bronze_to_table.py:158-163) that [[Versioned]]'s
  * partition-per-version store lacks: there a reader overlapping a
  * writer can observe a partially-landed directory; here it cannot.
  *
  * Protocol (single-table, full-snapshot manifests):
  *
  *   base/data/<txn>/part-*.parquet   landed data files — inert until
  *                                    some manifest references them
  *   base/_log/v<20-digit>.txt        manifest: newline-separated
  *                                    base-relative paths of EVERY
  *                                    file in that version (a full
  *                                    snapshot, so resolving any
  *                                    version reads ONE manifest)
  *
  * - WRITE: land all files under a fresh txn dir, then publish the
  *   manifest for version v+1 with an ATOMIC create-if-absent rename
  *   ([[FileContext]] + `Options.Rename.NONE` — the same primitive
  *   Spark's streaming checkpoint manager relies on; atomic on
  *   HDFS-like stores and the local FS, NOT on raw S3, which needs a
  *   coordinating catalog — the identical caveat Delta documents).
  * - READ: resolve the highest published manifest, read only its
  *   files. A reader interleaved anywhere inside a write sees the
  *   previous complete version — never a partial directory
  *   (TxLogSpec pins the interleaving).
  * - CONFLICT: the manifest name IS the compare-and-swap: two racing
  *   writers both targeting v+1 cannot both win the rename; the loser
  *   gets [[TxLog.CommitConflictException]], discards its landed
  *   files, and [[transact]] recomputes against the winner's table —
  *   so concurrent MERGEs serialize instead of last-write-winning
  *   (TxLogSpec proves final state equals sequential application).
  *
  * Scale notes: a manifest lists file PATHS (one short line per
  * file), so at 100 TB / ~1 GB files it is ~10^5 lines — megabytes,
  * listed and parsed on the driver in milliseconds; data files never
  * move or rewrite on commit, so commit cost is independent of table
  * size. Full-snapshot manifests trade Delta's log-replay (read all
  * deltas since a checkpoint) for one-file resolution.
  */
object TxLog {

  /** The CAS lost: another writer published this version first. */
  final class CommitConflictException(version: Long)
    extends RuntimeException(
      s"concurrent writer already committed version $version; " +
        "re-read the table and retry (see TxLog.transact)")

  private val LogDir = "_log"
  private val DataDir = "data"

  private def fc(base: String, spark: SparkSession): FileContext =
    FileContext.getFileContext(new Path(base).toUri,
      spark.sparkContext.hadoopConfiguration)

  private def fs(base: String, spark: SparkSession) =
    new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(base: String, v: Long) =
    new Path(f"$base/$LogDir/v$v%020d.txt")

  private def parseVersion(name: String): Option[Long] =
    if (name.startsWith("v") && name.endsWith(".txt"))
      name.stripPrefix("v").stripSuffix(".txt").toLongOption
    else None

  /** Highest published version, or None for an empty store. */
  def latestVersion(spark: SparkSession, base: String): Option[Long] = {
    val dir = new Path(s"$base/$LogDir")
    val f = fs(base, spark)
    if (!f.exists(dir)) None
    else f.listStatus(dir).toSeq
      .flatMap(st => parseVersion(st.getPath.getName))
      .maxOption
  }

  /** The file list of one published version (base-relative paths). */
  def manifestFiles(spark: SparkSession, base: String, v: Long): Seq[String] = {
    val f = fs(base, spark)
    val in = f.open(manifestPath(base, v))
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Snapshot read of version `v`: only that manifest's files. */
  def readVersion(spark: SparkSession, base: String, v: Long): DataFrame = {
    val files = manifestFiles(spark, base, v).map(rel => s"$base/$rel")
    spark.read.parquet(files: _*)
  }

  /** Snapshot read of the latest published version. */
  def read(spark: SparkSession, base: String): DataFrame = {
    val v = latestVersion(spark, base).getOrElse(
      throw new IllegalStateException(s"no committed version at $base"))
    readVersion(spark, base, v)
  }

  /** Land `df`'s files under a fresh txn dir. They reference no
    * manifest yet, so concurrent readers cannot see them. Returns the
    * base-relative paths, for [[publish]]. */
  private[graft] def land(df: DataFrame, base: String): Seq[String] = {
    val txn = java.util.UUID.randomUUID().toString
    val dir = s"$base/$DataDir/$txn"
    df.write.mode("error").parquet(dir)
    val f = fs(base, df.sparkSession)
    f.listStatus(new Path(dir)).toSeq
      .filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      .map(st => s"$DataDir/$txn/${st.getPath.getName}")
  }

  /** Atomically publish `files` as version `v`. Write-to-temp then
    * rename-if-absent: the rename either installs the complete
    * manifest or throws — no reader can observe a half-written one,
    * and no two writers can both win the same version. */
  private[graft] def publish(spark: SparkSession, base: String,
                                 v: Long, files: Seq[String]): Unit = {
    val f = fs(base, spark)
    f.mkdirs(new Path(s"$base/$LogDir"))
    val tmp = new Path(
      s"$base/$LogDir/.tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write((files.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    val dst = manifestPath(base, v)
    try fc(base, spark).rename(tmp, dst, Options.Rename.NONE)
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException |
           _: java.nio.file.FileAlreadyExistsException =>
        f.delete(tmp, false)
        throw new CommitConflictException(v)
      case _: java.io.IOException if f.exists(dst) =>
        // some FileContext impls signal an existing destination as a
        // bare IOException — same CAS outcome
        f.delete(tmp, false)
        throw new CommitConflictException(v)
    }
  }

  /** Discard a landed-but-unpublished txn's files (conflict loser). */
  private def discard(spark: SparkSession, base: String,
                      files: Seq[String]): Unit = {
    val f = fs(base, spark)
    files.map(rel => new Path(s"$base/$rel").getParent).distinct
      .foreach(dir => f.delete(dir, true))
  }

  /** One optimistic commit: land `df`, publish as `expected`+1 (or
    * version 1 of an empty store). Throws [[CommitConflictException]]
    * after cleaning up the landed files if another writer got there
    * first. Returns the published version. */
  def commit(df: DataFrame, base: String,
             expected: Option[Long]): Long = {
    val spark = df.sparkSession
    val v = expected.getOrElse(0L) + 1L
    val files = land(df, base)
    try { publish(spark, base, v, files); v }
    catch {
      case e: CommitConflictException =>
        discard(spark, base, files); throw e
    }
  }

  /** Optimistic-concurrency transaction: `body` receives the current
    * snapshot (None for an empty store) and returns the FULL new
    * table contents; on a CAS loss the landed files are discarded and
    * `body` re-runs against the winner's table — so a concurrent
    * MERGE never silently last-write-wins. Returns the version
    * published. */
  def transact(spark: SparkSession, base: String, maxAttempts: Int = 5)
              (body: Option[DataFrame] => DataFrame): Long = {
    var attempt = 0
    while (true) {
      attempt += 1
      val cur = latestVersion(spark, base)
      val out = body(cur.map(v => readVersion(spark, base, v)))
      try return commit(out, base, cur)
      catch {
        case _: CommitConflictException if attempt < maxAttempts => ()
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Retention vacuum: drop all but the newest `keepLast` manifests,
    * then delete every txn dir no surviving manifest references.
    * Returns the surviving versions, ascending. */
  def vacuum(spark: SparkSession, base: String, keepLast: Int): Seq[Long] = {
    val f = fs(base, spark)
    val logDir = new Path(s"$base/$LogDir")
    if (!f.exists(logDir)) return Seq.empty
    val versions = f.listStatus(logDir).toSeq
      .flatMap(st => parseVersion(st.getPath.getName)).sorted
    val (drop, keep) = versions.splitAt(math.max(0, versions.length - keepLast))
    val live = keep.flatMap(v => manifestFiles(spark, base, v))
      .map(rel => new Path(s"$base/$rel").getParent.getName).toSet
    drop.foreach(v => f.delete(manifestPath(base, v), false))
    val dataDir = new Path(s"$base/$DataDir")
    if (f.exists(dataDir))
      f.listStatus(dataDir).toSeq.filter(_.isDirectory)
        .filterNot(st => live.contains(st.getPath.getName))
        .foreach(st => f.delete(st.getPath, true))
    keep
  }

  /** Remove the whole store (test/fixture reset). */
  def drop(spark: SparkSession, base: String): Unit =
    fs(base, spark).delete(new Path(base), true)
}
