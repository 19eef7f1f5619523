package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins (SURVEY §4.3: "bucketing for co-located
  * joins"). Writing both sides bucketed (and sorted) on the join key
  * lets a sort-merge join read bucket-aligned files with NO shuffle of
  * either side — at 100 TB this converts the dominant fact⋈fact
  * shuffle into a local merge per bucket. The `merge` hint pins SMJ so
  * the demonstration holds even when one side would broadcast at test
  * scale.
  */
object Colocate {

  /** Write `df` as a bucketed+sorted managed parquet table. Drops any
    * previous incarnation AND its on-disk location first — a fresh
    * session's catalog doesn't know about a prior session's managed
    * table, but the warehouse directory survives and would block
    * saveAsTable (LOCATION_ALREADY_EXISTS). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Write only if the table isn't already in the session catalog —
    * the setup/query split (VERDICT r2 #8): bucketing is one-time ETL,
    * re-bucketing on every query invocation would charge the write to
    * every join. Callers must encode the data identity (e.g. the SF
    * dir) in `table` so a stale incarnation can't be reused. */
  def ensureBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    // A catalog entry alone is not proof of a usable table: a crash
    // between DROP and saveAsTable, or warehouse files deleted out
    // from under the catalog (/tmp cleanup), leaves an entry that is
    // broken — or worse, PARTIALLY populated, where a limit(1) read
    // still succeeds but joins silently lose rows. Require one data
    // file per bucket (a bucketed save writes exactly that per task
    // set) before trusting the table; anything less rebuilds.
    val usable = spark.catalog.tableExists(table) &&
      scala.util.Try(spark.table(table).inputFiles.length >= buckets)
        .getOrElse(false)
    if (!usable) writeBucketed(df, table, key, buckets)
  }

  /** Bucket-align two frames on their join keys (idempotent setup) and
    * return the shuffle-free joined frame. */
  def bucketedJoin(spark: SparkSession,
                   left: DataFrame, leftKey: String,
                   right: DataFrame, rightKey: String,
                   buckets: Int, tablePrefix: String): DataFrame = {
    ensureBucketed(left, s"${tablePrefix}_l", leftKey, buckets)
    ensureBucketed(right, s"${tablePrefix}_r", rightKey, buckets)
    val l = spark.table(s"${tablePrefix}_l")
    val r = spark.table(s"${tablePrefix}_r")
    l.hint("merge").join(r, l(leftKey) === r(rightKey))
  }
}
