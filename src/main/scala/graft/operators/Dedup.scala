package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-record deduplication — the reference's core dedup idiom
  * (SURVEY §2.5 W1): `row_number() over (partition by key order by ts
  * desc) = 1`, used at reference sites
  * scripts/normalize_bronze_columns.py:127-130,
  * dbt/models/staging/stg_properties.sql:23-31,
  * dbt/models/marts/dim_properties.sql:37-40,
  * dbt/models/marts/fct_properties.sql:22-26.
  *
  * Scale notes (100 TB): this is a single hash-shuffle on the key
  * columns followed by a per-partition sort — no global sort. Skewed
  * keys (one `list_id` with millions of versions) are the hazard; for
  * that case use [[latestByKeySkewSafe]], which pre-aggregates a
  * max-ordering per key map-side (partial agg) and joins back, so the
  * hot key never concentrates all its rows in one task's sort buffer.
  */
object Dedup {

  /** Keep exactly one row per key: the first under `ordering`
    * (descending timestamp for "latest wins"). `ordering` must be a
    * total order per key (add a unique tiebreaker column) for
    * deterministic output.
    */
  def latestByKey(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Skew-safe variant: compute max(orderKey) per key with a
    * map-side-combinable aggregate, then inner-join back. Two shuffles
    * instead of one, but the reduce-side state per key is O(1) instead
    * of O(rows-per-key).
    *
    * CONTRACT: `orderCol` must be NON-NULL and a total order within a
    * key. Use a struct with a non-null unique tiebreaker —
    * `struct(ts, unique_id)` satisfies both even when ts itself is
    * NULL (a struct with a NULL field is not a NULL struct). A bare
    * nullable column would match every row of an all-NULL group via
    * the null-safe join and return duplicates.
    */
  def latestByKeySkewSafe(df: DataFrame, keys: Seq[String], orderCol: Column): DataFrame = {
    val tagged = df.withColumn("__ord", orderCol)
    val maxPerKey = tagged.groupBy(keys.map(col): _*)
      .agg(max(col("__ord")).as("__mx"))
      .select(keys.map(c => col(c).as(s"__k_$c")) :+ col("__mx"): _*)
    // Null-safe equality on every join column: a NULL key forms its own
    // group in latestByKey (and in SQL GROUP BY), so the semi-join must
    // match it too — plain equality would silently drop NULL-key rows.
    val cond = keys.map(c => tagged(c) <=> col(s"__k_$c"))
      .reduce(_ && _) && (col("__ord") <=> col("__mx"))
    tagged.join(maxPerKey, cond, "left_semi")
      .select(df.columns.map(col): _*)
  }

  /** Position-preserving, NULL-safe content fingerprint over a set of
    * columns. Each column is cast to string and NULLs are replaced by a
    * sentinel that also encodes "was null", so ("a", null) and
    * (null, "a") hash differently, and ("a b","c") vs ("a","b c")
    * cannot collide (the separator U+0001 never occurs in the data).
    * Portable: the same expression is expressible in ANSI SQL
    * (concat_ws(chr(1), coalesce(...))), so a DuckDB oracle can
    * recompute it exactly.
    */
  def contentFingerprint(contentCols: Seq[String]): Column =
    md5(concat_ws("\u0001",
      contentCols.map(c => coalesce(col(c).cast("string"), lit("\u0001N"))): _*))

  /** Exact duplicate removal by content hash (extension operator —
    * builder-prompt dedup family). Keeps the row with the minimum
    * `idCol` among identical `contentCols`. One hash shuffle on the
    * 16-byte fingerprint — no all-pairs comparison, scale-linear.
    */
  def exactByContent(df: DataFrame, idCol: String, contentCols: Seq[String]): DataFrame =
    latestByKey(df.withColumn("__fp", contentFingerprint(contentCols)),
      Seq("__fp"), Seq(col(idCol).asc))
      .drop("__fp")

  /** The daily-crawl dedup step: from a NEW batch, keep only rows
    * whose content fingerprint is absent from the accumulated
    * fingerprint store AND that aren't duplicated within the batch
    * itself (min-id wins intra-batch, matching [[exactByContent]]).
    *
    * Scale shape: the store is the corpus's fingerprint history
    * (huge) but the anti-join shuffles only 16-byte keys, and the
    * batch side is a day's crawl — both sides hash-partition on the
    * fingerprint; nothing is broadcast or collected. The caller
    * appends the survivors' fingerprints to the store afterwards
    * (idempotent: re-running a batch finds its fingerprints present
    * and yields zero new rows).
    */
  def newAgainstStore(batch: DataFrame, idCol: String,
                      contentCols: Seq[String], storeFps: DataFrame): DataFrame = {
    val fp = batch.withColumn("__fp", contentFingerprint(contentCols))
    val intraNew = latestByKey(fp, Seq("__fp"), Seq(col(idCol).asc))
    intraNew
      .join(storeFps.select(col("fp").as("__fp")), Seq("__fp"), "left_anti")
      .drop("__fp")
  }
}
