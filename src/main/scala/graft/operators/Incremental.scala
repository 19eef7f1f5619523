package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental-processing primitives (SURVEY §2.2 P9/P10, §2.1 S5).
  *
  * The reference reads "only new data" three ways:
  *   1. max-timestamp watermark scalar subquery —
  *      `where file_modification_time > (select
  *      coalesce(max(updated_at_ts),'1970-01-01') from {{this}})`
  *      (dbt/models/staging/stg_properties.sql:13-16,
  *      dbt/models/marts/fct_properties.sql:14-16);
  *   2. NOT-IN-existing-keys subquery
  *      (dbt/models/marts/dim_locations.sql:23-26,
  *      dim_properties.sql:49-55);
  *   3. processed-file list diffed against the bucket listing
  *      (scripts/load_bronze_to_table.py:37-73,136-137).
  *
  * Scale notes: the watermark predicate is a plain comparison on a
  * (typically partition/sort) column, so at 100 TB it becomes partition
  * pruning / parquet min-max skipping — the scan never touches old
  * files. NOT-IN compiles to a null-aware anti join; when the existing
  * key set is the small side, broadcast it.
  */
object Incremental {

  /** Rows of `src` strictly newer than the max watermark seen in
    * `existing` — expressed as a scalar-subquery-free two-step (the
    * aggregate is a 1-row DataFrame cross-joined in, which Catalyst
    * plans as a broadcast nested loop over a single row; no collect()
    * on the driver, no shuffle of `src`).
    */
  def newerThanWatermark(src: DataFrame, existing: DataFrame,
                         srcTs: String, existingTs: String): DataFrame = {
    val wm = existing.agg(
      coalesce(max(col(existingTs)), to_timestamp(lit("1970-01-01"))).as("__wm"))
    src.join(broadcast(wm)).where(col(srcTs) > col("__wm")).drop("__wm")
  }

  /** SQL NOT IN (subquery) semantics, including the null-aware corner:
    * if `existingKey` contains any NULL, NO rows qualify (SURVEY §7.4).
    * Expressed exactly as NOT IN so Catalyst plans its null-aware anti
    * join — reference site dbt/models/marts/dim_locations.sql:23-26.
    */
  def notInExisting(src: DataFrame, existing: DataFrame,
                    srcKey: String, existingKey: String): DataFrame = {
    val s = src
    val keys = existing.select(col(existingKey).as("__k"))
    // Null-aware anti join: drop src rows with a matching key; if the
    // key set has a NULL, SQL NOT IN returns nothing.
    val hasNull = keys.where(col("__k").isNull).limit(1)
    s.join(broadcast(keys), s(srcKey) === col("__k"), "left_anti")
      .join(broadcast(hasNull), lit(true), "left_anti")
  }

  /** Processed-file-set incremental scan (S5): read a multi-file
    * source, keep rows from files not yet processed, using the
    * Spark 4 `_metadata` hidden column (input_file_name() is the 3.x
    * spelling, scripts/load_bronze_to_table.py:134).
    */
  def unprocessedFiles(df: DataFrame, processed: Seq[String]): DataFrame =
    df.withColumn("__file", col("_metadata.file_path"))
      .filter(!col("__file").isin(processed: _*))
      .drop("__file")
}
