package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot versioning + retention vacuum on plain parquet — the
  * time-travel half of the reference's Delta surface (SURVEY §2.11:
  * advertised, never exercised by its pipeline) without Delta jars.
  *
  * Design: version IS a partition (`v=<n>` directories). Reading the
  * store yields a `v` column, so "time travel to version n" is a
  * partition-pruned filter (`WHERE v = n` — the scan never opens
  * other versions' files), version diffs are ordinary queries over
  * two partitions, and writing version n+1 never touches version n's
  * files (append-only history, snapshot isolation for free). Delta
  * keeps deltas + a log where this keeps full snapshots: at 100 TB
  * that trade is real (storage for simplicity), which is why
  * [[vacuum]] — retention-bounded history — is part of the same
  * operator, exactly like Delta's VACUUM.
  */
object Versioned {

  /** Write `df` as snapshot version `n` of the store at `base`.
    * Overwrites only that version's partition directory. */
  def writeSnapshot(df: DataFrame, base: String, n: Int): Unit =
    df.write.mode("overwrite").parquet(s"$base/v=$n")

  /** Time-travel read: snapshot `n` only (partition-pruned). */
  def snapshot(spark: SparkSession, base: String, n: Int): DataFrame =
    spark.read.option("basePath", base).parquet(base)
      .where(col("v") === n).drop("v")

  /** The full history with its `v` column. */
  def history(spark: SparkSession, base: String): DataFrame =
    spark.read.option("basePath", base).parquet(base)

  /** Retention vacuum: delete all but the newest `keepLast` version
    * directories. Uses the Hadoop FileSystem API (not java.io) so the
    * same code runs against HDFS/object stores on a cluster. Returns
    * the surviving version numbers, ascending. */
  def vacuum(spark: SparkSession, base: String, keepLast: Int): Seq[Int] = {
    val path = new org.apache.hadoop.fs.Path(base)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = fs.listStatus(path).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .flatMap { p =>
        p.getName match {
          case s if s.startsWith("v=") => s.drop(2).toIntOption.map(_ -> p)
          case _ => None
        }
      }
      .sortBy(_._1)
    val drop = versions.dropRight(keepLast)
    drop.foreach { case (_, p) => fs.delete(p, true) }
    versions.takeRight(keepLast).map(_._1)
  }
}
