package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Bronze-layer ingestion (SURVEY §2.1 S1/S2/S4–S7, §2.2 P1/P3):
  * JSON/CSV scans with schema inference, append/overwrite write modes
  * with schema merge, file-metadata stamping, and the text-file state
  * store (S11) the reference keeps its processed-file list in
  * (scripts/load_bronze_to_table.py:37-73).
  *
  * Fixture files are DERIVED deterministically from the harness
  * parquet tables (never hand-synthesized data), so a DuckDB oracle
  * can recompute expected results from the original tables.
  */
object Ingest {

  /** Stable scratch dir per scale factor. */
  def fixtureDir(sfDir: String): String =
    "/tmp/graft_fixtures/" + sfDir.replaceAll("[^A-Za-z0-9.]+", "_")

  /** Two-pass inferred-schema JSON read — the reference reads once to
    * infer, then re-reads with the pinned schema
    * (scripts/load_bronze_to_table.py:130-133). */
  def readJsonInferred(spark: SparkSession, path: String): DataFrame = {
    val inferred = spark.read.json(path).schema
    spark.read.schema(inferred).json(path)
  }

  /** header=true, inferSchema=true CSV scan
    * (scripts/normalize_csv.py:45-48). */
  def readCsvInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** Write `df` as JSONL, idempotently (overwrite). Returns the dir. */
  def writeJsonl(df: DataFrame, path: String): String = {
    df.write.mode("overwrite").json(path); path
  }

  /** Write `df` as headered CSV, idempotently. Returns the dir. */
  def writeCsv(df: DataFrame, path: String): String = {
    df.write.mode("overwrite").option("header", "true").csv(path); path
  }

  /** Append + schema-merge round-trip (S6): `base` overwrites the
    * target, `extra` (possibly wider schema) appends, and the read
    * back merges schemas — parquet's stand-in for Delta
    * `mergeSchema=true` (scripts/load_bronze_to_table.py:158). */
  def appendMergeRoundtrip(spark: SparkSession, base: DataFrame,
                           extra: DataFrame, path: String): DataFrame = {
    base.write.mode("overwrite").parquet(path)
    extra.write.mode("append").parquet(path)
    spark.read.option("mergeSchema", "true").parquet(path)
  }

  /** Overwrite round-trip (S7). */
  def overwriteRoundtrip(spark: SparkSession, df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Line-file state store (S11) — the processed-file / seen-ids
    * pattern (airflow/dags/end_to_end_pipeline.py:68-88): read the
    * current set, merge new entries, write back. Driver-side by
    * design: this is orchestration state (tiny), not data. */
  object StateStore {
    def read(path: String): Set[String] = {
      val p = Paths.get(path)
      if (Files.exists(p)) Files.readAllLines(p).asScala.toSet else Set.empty
    }
    def append(path: String, entries: Iterable[String]): Set[String] = {
      val merged = read(path) ++ entries
      val p = Paths.get(path)
      Files.createDirectories(p.getParent)
      Files.write(p, merged.toSeq.sorted.asJava,
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      merged
    }
  }

  /** Auto-sanitize messy column names (P1's companion — the
    * reference's lowercase+strip normalizer,
    * scripts/normalize_bronze_columns.py:97-124): lowercase, spaces
    * and separator punctuation collapsed to underscores. */
  def sanitizeColumns(df: DataFrame): DataFrame = {
    val renamed = df.columns.map { c =>
      c -> c.toLowerCase.replaceAll("[ ,;.{}()=/]+", "_").replaceAll("^_+|_+$", "")
    }
    val dupes = renamed.groupBy(_._2).filter(_._2.length > 1).keys
    require(dupes.isEmpty,
      s"sanitized column names collide: ${dupes.mkString(", ")}")
    df.select(renamed.map { case (o, n) => col(s"`$o`").as(n) }: _*)
  }

  /** File-name metadata column (S4) — Spark 4's `_metadata.file_path`
    * replaces 3.x `input_file_name()`
    * (scripts/load_bronze_to_table.py:134). Only the basename is
    * exposed: absolute paths and mtimes are environment-dependent and
    * would poison oracle comparison. */
  def withFileName(df: DataFrame): DataFrame =
    df.withColumn("file_name",
      regexp_extract(col("_metadata.file_path"), "([^/]+)$", 1))
}
