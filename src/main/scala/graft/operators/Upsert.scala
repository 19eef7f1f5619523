package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE / upsert semantics in pure Spark (SURVEY §2.1 S8, §2.3 J5).
  *
  * The reference upserts via Delta
  * `whenMatchedUpdateAll.whenNotMatchedInsertAll` on `list_id`
  * (scripts/normalize_bronze_columns.py:145-148) and declaratively via
  * dbt `incremental_strategy='merge'` for every model
  * (dbt/models/staging/stg_properties.sql:1-7). With no Delta jars in
  * this environment we express the identical row-level semantics
  * relationally: rows of `target` whose key appears in `source` are
  * replaced wholesale by the source row ("update all"); unmatched
  * source rows are appended ("insert all").
  *
  * Precondition (same as the reference, which pre-dedups at
  * normalize_bronze_columns.py:127-130): `source` is unique on the key.
  *
  * Scale notes: the anti-join shuffles on the key — at 100 TB target
  * size, the daily source is small relative to target, so mark the
  * source side broadcastable ([[mergeBroadcast]]) to turn the anti-join
  * into a broadcast-hash anti join with NO shuffle of the big target.
  * Schema evolution (`mergeSchema=true` at
  * scripts/load_bronze_to_table.py:158) maps to
  * `unionByName(allowMissingColumns = true)`.
  */
object Upsert {

  def merge(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame =
    target.join(source, keys, "left_anti")
      .unionByName(source, allowMissingColumns = true)

  /** Broadcast-anti variant for the common big-target / small-source
    * incremental shape.
    */
  def mergeBroadcast(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame =
    target.join(broadcast(source.select(keys.map(col): _*).distinct()), keys, "left_anti")
      .unionByName(source, allowMissingColumns = true)
}
