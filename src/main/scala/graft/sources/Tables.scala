package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table access for the harness star schema (TESTDATA.md).
  *
  * Mirrors the reference's catalogued-table access (SURVEY §2.1 S3:
  * `spark.read.parquet(path)` / `spark.table(name)` — reference site
  * scripts/normalize_bronze_columns.py:82). All reads go through
  * `spark.read.parquet` so Catalyst gets parquet pushdown/pruning.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // The harness `events` table carries parquet TIMESTAMP(NANOS), which
    // Spark's parquet reader rejects by default. Read nanos as long and
    // rebuild a (micro-truncated) timestamp — truncation toward zero,
    // identical to an engine-side ns→us cast.
    val df = if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      import org.apache.spark.sql.types.LongType
      if (raw.schema("ts").dataType == LongType)
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      else raw
    } else spark.read.parquet(s"$sfDir/$name.parquet")
    normalizeNtz(df)
  }

  /** The harness parquet has carried three timestamp encodings across
    * rounds: TIMESTAMP(NANOS) (readable only as long under
    * nanosAsLong), UTC-adjusted TIMESTAMP(MICROS), and naive
    * TIMESTAMP_NTZ(MICROS). Normalize every NTZ column to session-TZ
    * TimestampType so downstream operators (unix_micros, watermarks,
    * date_trunc, typed Encoders) see ONE type regardless of which
    * encoding the driver generated. Every engine session pins UTC, so
    * the NTZ wall clock maps to the identical instant the UTC-adjusted
    * encoding carried — and DuckDB, reading the same file naively,
    * computes the same epoch micros. No-op when nothing is NTZ. */
  def normalizeNtz(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    df.schema.fields.filter(_.dataType == TimestampNTZType).foldLeft(df) {
      (d, f) => d.withColumn(f.name, col(f.name).cast(TimestampType))
    }
  }

  /** Register every table as a temp view named exactly like the parquet
    * file, so `spark.sql` queries can reference them the way dbt models
    * reference sources (SURVEY §3 E2). Idempotent.
    */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n => load(spark, sfDir, n).createOrReplaceTempView(n) }

  /** Spread a narrow-parallelism scan across the cluster before
    * expression-dense work. The harness parquet files are single
    * row-group (1 scan split), which would pin all downstream narrow
    * work to ONE core; a real lake layout has thousands of splits and
    * this is a no-op there (p >= cores). The small shuffle buys full
    * parallelism for the regex/hash-heavy projections that follow.
    */
  def scaled(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
