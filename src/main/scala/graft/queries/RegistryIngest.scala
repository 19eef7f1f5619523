package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{Ingest, Tables}
import graft.operators.Incremental

/** Bronze-ingestion registry (SURVEY §2.1 S1/S2/S4–S7, §2.2 P1/P3 —
  * the reference's scripts/load_bronze_to_table.py and
  * normalize_csv.py shapes).
  *
  * Fixture files are derived deterministically from the harness
  * parquet tables inside each query, so the DuckDB oracle recomputes
  * the expected result from the ORIGINAL tables — the round-trip
  * through JSONL/CSV/parquet-append is exactly what's under test.
  */
object RegistryIngest {
  private type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Shared witness shape for the paged-source pair: the batch and
    * streaming reads must produce the IDENTICAL aggregate, checked
    * against one oracle — defined once so they cannot diverge. */
  private def pagedAgg(df: DataFrame): DataFrame =
    df.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type")
  private val pagedOracle =
    """SELECT event_type, count(*) AS n,
              cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
              count(DISTINCT user_id) AS n_users
       FROM events GROUP BY event_type ORDER BY event_type"""
  private def tsLit(df: DataFrame, c: String, v: String) =
    lit(v).cast(df.schema(df.schema.fieldIndex(c)).dataType)

  val defs: Map[String, Q] = Map(
    // S1: JSONL sink + 2-pass inferred-schema scan (load_bronze_to_table.py:130-133).
    "s1_json_roundtrip" -> ((s, dir) => {
      val path = Ingest.fixtureDir(dir) + "/events_jsonl"
      Ingest.writeJsonl(
        t(s, dir, "events").select("event_id", "user_id", "event_type", "value"), path)
      Ingest.readJsonInferred(s, path)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
        .orderBy("event_type")
    }),

    // S1 ragged variant — the reference's ACTUAL bronze shape: each
    // JSONL record carries a varying key set (crawl parameters differ
    // per listing), and inference must union them
    // (load_bronze_to_table.py:130-133 two-pass + mergeSchema).
    "s1_ragged_json_inference" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val doc = when(col("event_id") % 3 === 0,
          to_json(struct(col("event_id"), col("user_id"))))
        .when(col("event_id") % 3 === 1,
          to_json(struct(col("event_id"), col("user_id"), col("value"))))
        .otherwise(
          to_json(struct(col("event_id"), col("user_id"), col("value"),
            col("event_type"))))
      val path = Ingest.fixtureDir(dir) + "/ragged_jsonl"
      ev.select(doc.as("value")).write.mode("overwrite").text(path)
      Ingest.readJsonInferred(s, path)
        .agg(count(lit(1)).as("n_rows"),
          count(col("value")).as("n_with_value"),
          count(col("event_type")).as("n_with_type"),
          countDistinct(col("user_id")).as("n_users"))
    }),

    // S1 at 100 TB: the reference's 2-pass inference re-READS the
    // whole feed just to discover the schema — unaffordable at scale.
    // samplingRatio bounds the inference pass to a deterministic
    // sample (seeded sample, builtin JSON source); the witness pins
    // BOTH the data (same oracle as the full pass) and the inferred
    // schema itself (schema_sig literal under the hash), so a sampled
    // pass that ever narrows a type or drops a field breaks the row.
    "s1_sampled_inference" -> ((s, dir) => {
      val path = Ingest.fixtureDir(dir) + "/events_jsonl_sampled"
      Ingest.writeJsonl(
        t(s, dir, "events").select("event_id", "user_id", "event_type", "value"), path)
      val inferred = s.read.option("samplingRatio", "0.1").json(path).schema
      val sig = inferred.fields
        .map(f => f.name + ":" + f.dataType.simpleString).mkString(",")
      s.read.schema(inferred).json(path)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
        .withColumn("schema_sig", lit(sig))
        .orderBy("event_type")
    }),

    // S2: headered CSV scan with schema inference (normalize_csv.py:45-48).
    "s2_csv_roundtrip" -> ((s, dir) => {
      val path = Ingest.fixtureDir(dir) + "/customer_csv"
      Ingest.writeCsv(
        t(s, dir, "customer").select("c_custkey", "c_name", "c_acctbal", "c_mktsegment"),
        path)
      Ingest.readCsvInferred(s, path)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          sum(col("c_acctbal").cast("decimal(18,6)")).cast("double").as("sum_acctbal"))
        .orderBy("c_mktsegment")
    }),

    // S4: file-metadata column (basename only — mtimes/abs paths are
    // environment noise the oracle can't see).
    "s4_file_metadata" -> ((s, dir) =>
      Ingest.withFileName(t(s, dir, "events"))
        .groupBy("file_name").agg(count(lit(1)).as("n"))
        .orderBy("file_name")),

    // S5+S11: processed-file-set incremental scan over a two-file dir.
    // The processed list is persisted via the line-file state store
    // (the faithful S11 witness), but the incremental SCAN consumes it
    // as a FRAME via an anti-join on _metadata.file_path — no driver
    // In-list in the plan, the 100 TB shape (VERDICT r2 #1).
    "s5_incremental_files" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val cut = tsLit(ev, "ts", "2024-01-15 00:00:00")
      val base = Ingest.fixtureDir(dir)
      ev.where(col("ts") < cut).write.mode("overwrite").parquet(s"$base/ev_a")
      ev.where(col("ts") >= cut).write.mode("overwrite").parquet(s"$base/ev_b")
      val processed = s.read.parquet(s"$base/ev_a")
        .select(col("_metadata.file_path")).distinct()
        .collect().map(_.getString(0))
      Ingest.StateStore.append(s"$base/processed_files.txt", processed)
      val union = s.read.parquet(s"$base/ev_a", s"$base/ev_b")
      val processedDf = s.read.textFile(s"$base/processed_files.txt").toDF("path")
      Incremental.unprocessedFilesJoin(union, processedDf, "path")
        .agg(count(lit(1)).as("n_new"), countDistinct(col("user_id")).as("n_users"))
    }),

    // S6: append + mergeSchema round-trip (schema-evolving bronze append).
    "s6_append_merge_schema" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val base = ev.where(col("ts") < tsLit(ev, "ts", "2024-01-10 00:00:00"))
        .select("event_id", "user_id", "value")
      val extra = ev.where(col("ts") >= tsLit(ev, "ts", "2024-01-25 00:00:00"))
        .select("event_id", "user_id", "value", "event_type")
      Ingest.appendMergeRoundtrip(s, base, extra,
          Ingest.fixtureDir(dir) + "/ev_append")
        .groupBy(coalesce(col("event_type"), lit("__missing")).as("etype"))
        .agg(count(lit(1)).as("n"))
        .orderBy("etype")
    }),

    // S7: overwrite round-trip of a joined snapshot.
    "s7_overwrite_roundtrip" -> ((s, dir) => {
      val snap = t(s, dir, "nation")
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name", "r_name")
      Ingest.overwriteRoundtrip(s, snap, Ingest.fixtureDir(dir) + "/nation_snap")
        .orderBy("n_nationkey")
    }),

    // The CSV→bronze adapter (scripts/normalize_csv.py:56-94): md5
    // surrogate id from address‖price‖area, address tail-split, typed
    // casts, NULL array column — over a CSV round-trip with inference.
    "bronze_csv_adapter" -> ((s, dir) => {
      val src = t(s, dir, "customer")
        .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .select(
          concat(col("c_name"), lit(", "), col("n_name"), lit(", "), col("r_name"))
            .as("address"),
          col("c_acctbal").as("price"),
          (col("c_custkey") % 300 + 10).cast("double").as("area"))
      val path = Ingest.fixtureDir(dir) + "/housing_csv"
      Ingest.writeCsv(src, path)
      val csv = Ingest.readCsvInferred(s, path)
      csv.select(
          md5(concat(coalesce(col("address"), lit("")),
            col("price").cast("string"), col("area").cast("string"))).as("list_id"),
          col("address"), col("price"), col("area"),
          trim(element_at(split(col("address"), ","), -1)).as("province"),
          trim(element_at(split(col("address"), ","), -2)).as("district"),
          // the reference's lit(None).cast(array<string>) column
          // (normalize_csv.py:94); compared as a null-witness boolean
          // because NULL-array columns hash ambiguously across engines
          lit(null).cast("array<string>").isNull.as("images_is_null"))
        .orderBy("list_id")
    }),

    // P1 companion: messy source column names auto-sanitized
    // (normalize_bronze_columns.py:97-124 shape).
    "p1_sanitize_columns" -> ((s, dir) => {
      val messy = t(s, dir, "lineitem").select(
        col("l_orderkey").as("L OrderKey"),
        col("l_linenumber").as("Line.Number"),
        col("l_quantity").as("Quantity (units)"))
      Ingest.sanitizeColumns(messy)
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n"),
          sum(col("quantity_units").cast("decimal(18,6)")).cast("double")
            .as("sum_qty"))
        .orderBy("l_orderkey")
    }),

    // P1, the reference's literal production policy: full 38-entry
    // Vietnamese→English map + drop-list + auto-name fallback +
    // first-occurrence duplicate collapse + latest-wins list_id dedup
    // (normalize_bronze_columns.py:11-50,88-129) over a synthesized
    // messy bronze frame carrying every mapped column.
    "p1_full_rename_map" -> ((s, dir) =>
      graft.operators.RenameMap
        .normalizeDedup(graft.operators.RenameMap.syntheticBronze(t(s, dir, "orders")))
        .orderBy("list_id")),

    // The reference's daily incremental loop end-to-end (E1+E2 shape):
    // day-1 state materialized, day-2 increment selected by watermark
    // against the materialized state, MERGE'd, re-materialized, read
    // back. Result == latest-per-user over everything before day 3.
    "pipeline_incremental_run" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val d2 = tsLit(ev, "ts", "2024-01-10 00:00:00")
      val d3 = tsLit(ev, "ts", "2024-01-20 00:00:00")
      val latest = (df: DataFrame) => graft.operators.Dedup.latestByKey(
        df, Seq("user_id"), Seq(col("ts").desc, col("event_id").desc))
      val base = Ingest.fixtureDir(dir)

      // run 1: initial materialization
      latest(ev.where(col("ts") < d2))
        .write.mode("overwrite").parquet(s"$base/pipe_state")
      val state1 = s.read.parquet(s"$base/pipe_state")
      // run 2: watermark-incremental read, dedup, MERGE, re-materialize
      val incr = latest(
        Incremental.newerThanWatermark(ev.where(col("ts") < d3), state1, "ts", "ts"))
      graft.operators.Upsert.merge(state1, incr, Seq("user_id"))
        .write.mode("overwrite").parquet(s"$base/pipe_state2")
      s.read.parquet(s"$base/pipe_state2")
        .select("user_id", "event_id", "event_type", "value")
        .orderBy("user_id")
    }),

    // Date-partitioned gold layout + partition pruning — the 100 TB
    // write shape (SURVEY §4.3: partition facts by date_key). The read
    // back filters on the partition column, so Spark prunes to ONE
    // day's directory without touching the rest.
    "s7_partitioned_write_prune" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val path = Ingest.fixtureDir(dir) + "/events_by_day"
      ev.withColumn("day", date_trunc("day", col("ts")).cast("date"))
        .write.mode("overwrite").partitionBy("day").parquet(path)
      s.read.parquet(path)
        .where(col("day") === lit("2024-01-05").cast("date"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
        .orderBy("event_type")
    }),

    // S19: ORC round-trip — the second columnar format (Spark's
    // native ORC reader/writer, the lakehouse interchange case).
    // The read-back applies a predicate that must reach the ORC scan
    // as a pushed filter (plan-pinned in PlanShapeSpec) — same
    // pushdown contract as the parquet S3 witness, different format.
    "s19_orc_roundtrip" -> ((s, dir) => {
      val path = Ingest.fixtureDir(dir) + "/lineitem_orc"
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_quantity",
          "l_extendedprice", "l_returnflag")
        .write.mode("overwrite").orc(path)
      s.read.orc(path)
        .where(col("l_quantity") > 25)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,6)")).cast("double")
            .as("sum_price"))
        .orderBy("l_returnflag")
    }),

    // S21: XML round trip through Spark 4's NATIVE XML source (the
    // spark-xml module folded into core) — the third non-columnar
    // interchange format beside JSONL and CSV, with rowTag framing
    // and schema inference. The crawl world still ships XML sitemaps
    // and legacy listing feeds; the oracle recomputes from the
    // original table so element framing, escaping, and type
    // inference are all under the hash.
    "s21_xml_roundtrip" -> ((s, dir) => {
      val path = Ingest.fixtureDir(dir) + "/customer_xml"
      t(s, dir, "customer")
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
        .write.mode("overwrite").option("rowTag", "customer").xml(path)
      s.read.option("rowTag", "customer").xml(path)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("c_name")).as("n_names"),
          sum(col("c_acctbal").cast("decimal(18,6)")).cast("double")
            .as("sum_acctbal"))
        .orderBy("c_mktsegment")
    }),

    // S10's in-engine half, done natively: the paged crawl feed read
    // through a custom DataSource V2 (graft.sources.PagedJsonSource —
    // one InputPartition per API page, column pruning pushed into the
    // Jackson parser). The fixture lands events as 8 page-NNNNN.jsonl
    // files exactly as the reference's DAG lands API pages; the
    // oracle recomputes from the original table, so a paging bug
    // (row lost/duplicated across pages) breaks the hash.
    "s10_paged_json_source" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/paged_api"
      graft.sources.PagedJsonSource.buildPages(
        t(s, dir, "events").select("event_id", "user_id", "event_type", "value"),
        "event_id", nPages = 8, base)
      pagedAgg(s.read.format("graft.sources.PagedJsonSource")
        .schema("event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE")
        .load(base))
    }),

    // The STREAMING half of the paged source: the same page directory
    // consumed as a micro-batch stream (offset = pages consumed —
    // PagedJsonMicroBatchStream's cursor semantics) through the
    // append parquet sink, paced to 3 pages per micro-batch
    // (admission control — the 8-page backlog drains as 3 REAL
    // batches, each with its own checkpoint commit). The oracle is
    // identical to the batch witness: the cursor must deliver every
    // page exactly once.
    "stream_paged_json_source" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/paged_api_stream"
      graft.sources.PagedJsonSource.buildPages(
        t(s, dir, "events").select("event_id", "user_id", "event_type", "value"),
        "event_id", nPages = 8, base)
      val nonce = "graft_paged_stream_" + System.nanoTime()
      val outDir = s"/tmp/graft_paged_stream/out_$nonce"
      val q = s.readStream.format("graft.sources.PagedJsonSource")
        .schema("event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE")
        .option("maxPagesPerTrigger", "3")
        .load(base)
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", "/tmp/graft_stream_ckpt/" + nonce)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.streaming.StreamTune.dropScratch("/tmp/graft_stream_ckpt/" + nonce)
      pagedAgg(s.read.parquet(outDir))
    }),

    // S20: malformed-row handling on the CSV scan — the ingest
    // semantics a messy crawl feed actually needs. Every
    // custkey % 13 == 0 line carries an unparseable numeric field;
    // PERMISSIVE quarantines those rows in the corrupt-record column
    // (good fields still parse), DROPMALFORMED silently drops them.
    // Both modes are asserted against the planted corruption count in
    // ONE result row. At 100 TB this is the row-level error-quarantine
    // path: one poisoned record must never kill the stage.
    "s20_csv_malformed_modes" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val path = Ingest.fixtureDir(dir) + "/malformed_csv"
      t(s, dir, "customer").select(
          concat(
            col("c_custkey").cast("string"), lit(","),
            when(col("c_custkey") % 13 === 0, lit("xx"))
              .otherwise(col("c_acctbal").cast("decimal(12,2)").cast("string")))
            .as("value"))
        .write.mode("overwrite").text(path)
      val dataFields = Seq(StructField("c_custkey", LongType),
        StructField("c_acctbal", DoubleType))
      val permissive = s.read
        .schema(StructType(dataFields :+ StructField("_corrupt", StringType)))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
        .agg(count(lit(1)).as("n_total"),
          count(col("_corrupt")).as("n_corrupt"),
          sum(col("c_acctbal").cast("decimal(18,6)")).cast("double")
            .as("sum_good"))
      // count(c_acctbal), not count(*): the CSV parser only validates
      // the columns the plan actually reads (column pruning), so a
      // bare row count would parse nothing and drop nothing —
      // malformation is defined relative to the projected schema
      val dropped = s.read.schema(StructType(dataFields))
        .option("mode", "DROPMALFORMED").csv(path)
        .agg(count(col("c_acctbal")).as("n_dropmalformed"))
      permissive.crossJoin(dropped)
    }),

    // S21: the JSON half of the malformed-ingestion story (S20 covers
    // CSV): one row in 13 is written as syntactically invalid JSONL.
    // PERMISSIVE lands the raw line in the corrupt column with data
    // fields null; DROPMALFORMED silently drops the row. The oracle
    // recomputes every count from the generative formula — corruption
    // is keyed on c_custkey % 13, so DuckDB never parses the broken
    // file.
    "s21_json_corrupt_modes" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val path = Ingest.fixtureDir(dir) + "/malformed_json"
      t(s, dir, "customer").select(
          concat(lit("{\"c_custkey\":"), col("c_custkey").cast("string"),
            lit(",\"c_acctbal\":"),
            when(col("c_custkey") % 13 === 0, lit("oops}"))
              .otherwise(concat(
                col("c_acctbal").cast("decimal(12,2)").cast("string"),
                lit("}"))))
            .as("value"))
        .write.mode("overwrite").text(path)
      val dataFields = Seq(StructField("c_custkey", LongType),
        StructField("c_acctbal", DoubleType))
      val permissive = s.read
        .schema(StructType(dataFields :+ StructField("_corrupt", StringType)))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
        .agg(count(lit(1)).as("n_total"),
          count(col("_corrupt")).as("n_corrupt"),
          sum(col("c_acctbal").cast("decimal(18,6)")).cast("double")
            .as("sum_good"))
      // count(c_acctbal), not count(*): like the CSV scan, the Jackson
      // parser validates only projected fields — malformation is
      // relative to the read schema
      val dropped = s.read.schema(StructType(dataFields))
        .option("mode", "DROPMALFORMED").json(path)
        .agg(count(col("c_acctbal")).as("n_dropmalformed"))
      permissive.crossJoin(dropped)
    }),

    // Small-file COMPACTION (the OPTIMIZE/rewrite maintenance verb): a
    // 64-file directory (the streaming-ingest small-files problem) is
    // rewritten as 4 range-partitioned, key-sorted files —
    // repartitionByRange + sortWithinPartitions preserves clustering
    // so min-max stats keep row-group skipping effective after the
    // rewrite. The query proves content identity through the rewrite;
    // IngestLayoutSpec asserts the file counts.
    // CDC apply (the MERGE shape s8 does not cover: DELETES plus
    // multiple changes per key): a deterministic change batch carries
    // inserts, two CONFLICTING sequenced updates per updated key
    // (latest-wins by change_seq), and deletes. Apply = one argmax
    // aggregate over the change batch (struct-max on change_seq — no
    // window sort) + one anti-join to drop superseded base rows +
    // union of surviving inserts/updates. Two shuffles total on the
    // key, each map-side combinable — the scale shape of streaming
    // CDC compaction at 100 TB/day.
    "s18_cdc_apply" -> ((s, dir) => {
      val base = t(s, dir, "customer")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
      val m = col("c_custkey") % 100
      // latest change per key via struct-max: (seq, op, acctbal)
      val changes =
        base.where(m === 0)
          .select(col("c_custkey"), lit(1L).as("change_seq"),
            lit("D").as("op"), col("c_mktsegment"), col("c_acctbal"))
        .unionByName(base.where(m === 1)
          .select(col("c_custkey"), lit(1L).as("change_seq"),
            lit("U").as("op"), col("c_mktsegment"),
            (col("c_acctbal") + 1000).as("c_acctbal")))
        .unionByName(base.where(m === 1)
          .select(col("c_custkey"), lit(2L).as("change_seq"),
            lit("U").as("op"), col("c_mktsegment"),
            (col("c_acctbal") + 2000).as("c_acctbal")))
        .unionByName(base.where(m === 2)
          .select((col("c_custkey") + 1000000).as("c_custkey"),
            lit(1L).as("change_seq"), lit("I").as("op"),
            col("c_mktsegment"), col("c_acctbal")))
      val latest = changes
        .groupBy("c_custkey")
        .agg(max(struct(col("change_seq"), col("op"),
          col("c_mktsegment"), col("c_acctbal"))).as("__c"))
        .select(col("c_custkey"), col("__c.op").as("op"),
          col("__c.c_mktsegment").as("c_mktsegment"),
          col("__c.c_acctbal").as("c_acctbal"))
      base.join(latest.select("c_custkey"), Seq("c_custkey"), "left_anti")
        .unionByName(latest.where(col("op") =!= "D")
          .select("c_custkey", "c_mktsegment", "c_acctbal"))
        .orderBy("c_custkey")
    }),

    "s13_compact_small_files" -> ((s, dir) => {
      val src = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      val smallDir = Ingest.fixtureDir(dir) + "/compact_src"
      val outDir = Ingest.fixtureDir(dir) + "/compact_out"
      src.repartition(64).write.mode("overwrite").parquet(smallDir)
      s.read.parquet(smallDir)
        .repartitionByRange(4, col("user_id"))
        .sortWithinPartitions("user_id", "event_id")
        .write.mode("overwrite").parquet(outDir)
      s.read.parquet(outDir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"),
          count(when(col("user_id").isNotNull, 1)).as("n_users_set"))
        .orderBy("event_type")
    }))

  val oracles: Map[String, String] = Map(
    "s1_json_roundtrip" ->
      """SELECT event_type, count(*) AS n,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events GROUP BY event_type ORDER BY event_type""",
    "s1_ragged_json_inference" ->
      """SELECT count(*) AS n_rows,
                count(CASE WHEN event_id % 3 <> 0 THEN 1 END) AS n_with_value,
                count(CASE WHEN event_id % 3 = 2 THEN 1 END) AS n_with_type,
                count(DISTINCT user_id) AS n_users
         FROM events""",
    "s1_sampled_inference" ->
      """SELECT event_type, count(*) AS n,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
                'event_id:bigint,event_type:string,user_id:bigint,value:double'
                  AS schema_sig
         FROM events GROUP BY event_type ORDER BY event_type""",
    "s2_csv_roundtrip" ->
      """SELECT c_mktsegment, count(*) AS n,
                cast(sum(cast(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sum_acctbal
         FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "s4_file_metadata" ->
      """SELECT 'events.parquet' AS file_name, count(*) AS n FROM events
         ORDER BY file_name""",
    "s5_incremental_files" ->
      """SELECT count(*) AS n_new, count(DISTINCT user_id) AS n_users
         FROM events WHERE ts >= TIMESTAMP '2024-01-15'""",
    "s6_append_merge_schema" ->
      """WITH u AS (
           SELECT event_id, user_id, value, NULL AS event_type FROM events
           WHERE ts < TIMESTAMP '2024-01-10'
           UNION ALL
           SELECT event_id, user_id, value, event_type FROM events
           WHERE ts >= TIMESTAMP '2024-01-25')
         SELECT coalesce(event_type, '__missing') AS etype, count(*) AS n
         FROM u GROUP BY 1 ORDER BY etype""",
    "s7_overwrite_roundtrip" ->
      """SELECT n_nationkey, n_name, r_name FROM nation
         JOIN region ON n_regionkey = r_regionkey
         ORDER BY n_nationkey""",
    "s18_cdc_apply" ->
      """WITH base AS (SELECT c_custkey, c_mktsegment, c_acctbal FROM customer),
         changes AS (
           SELECT c_custkey, 1 AS change_seq, 'D' AS op, c_mktsegment, c_acctbal
           FROM base WHERE c_custkey % 100 = 0
           UNION ALL
           SELECT c_custkey, 1, 'U', c_mktsegment, c_acctbal + 1000
           FROM base WHERE c_custkey % 100 = 1
           UNION ALL
           SELECT c_custkey, 2, 'U', c_mktsegment, c_acctbal + 2000
           FROM base WHERE c_custkey % 100 = 1
           UNION ALL
           SELECT c_custkey + 1000000, 1, 'I', c_mktsegment, c_acctbal
           FROM base WHERE c_custkey % 100 = 2),
         latest AS (
           SELECT c_custkey, op, c_mktsegment, c_acctbal FROM (
             SELECT *, row_number() OVER (PARTITION BY c_custkey
                       ORDER BY change_seq DESC, op DESC,
                                c_mktsegment DESC, c_acctbal DESC) AS rn
             FROM changes) WHERE rn = 1)
         SELECT c_custkey, c_mktsegment, c_acctbal FROM base
         WHERE c_custkey NOT IN (SELECT c_custkey FROM latest)
         UNION ALL
         SELECT c_custkey, c_mktsegment, c_acctbal FROM latest WHERE op <> 'D'
         ORDER BY c_custkey""",
    "s13_compact_small_files" ->
      """SELECT event_type, count(*) AS n,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
                count(CASE WHEN user_id IS NOT NULL THEN 1 END) AS n_users_set
         FROM events GROUP BY event_type ORDER BY event_type""",
    "s7_partitioned_write_prune" ->
      """SELECT event_type, count(*) AS n,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events
         WHERE cast(date_trunc('day', ts) AS DATE) = DATE '2024-01-05'
         GROUP BY event_type ORDER BY event_type""",
    "s19_orc_roundtrip" ->
      """SELECT l_returnflag, count(*) AS n,
                cast(sum(cast(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
         FROM lineitem WHERE l_quantity > 25
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "s21_xml_roundtrip" ->
      """SELECT c_mktsegment, count(*) AS n,
                count(DISTINCT c_name) AS n_names,
                cast(sum(cast(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sum_acctbal
         FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "s10_paged_json_source" -> pagedOracle,
    "stream_paged_json_source" -> pagedOracle,
    // expected counts derive from the PLANTED corruption rule: rows
    // with custkey % 13 == 0 are unparseable in the numeric field
    "s20_csv_malformed_modes" ->
      """SELECT count(*) AS n_total,
                count(*) FILTER (WHERE c_custkey % 13 = 0) AS n_corrupt,
                cast(sum(cast(cast(c_acctbal AS DECIMAL(12,2)) AS DECIMAL(18,6)))
                       FILTER (WHERE c_custkey % 13 <> 0) AS DOUBLE) AS sum_good,
                count(*) FILTER (WHERE c_custkey % 13 <> 0) AS n_dropmalformed
         FROM customer""",
    "s21_json_corrupt_modes" ->
      """SELECT count(*) AS n_total,
                count(*) FILTER (WHERE c_custkey % 13 = 0) AS n_corrupt,
                cast(sum(cast(cast(c_acctbal AS DECIMAL(12,2)) AS DECIMAL(18,6)))
                       FILTER (WHERE c_custkey % 13 <> 0) AS DOUBLE) AS sum_good,
                count(*) FILTER (WHERE c_custkey % 13 <> 0) AS n_dropmalformed
         FROM customer""",
    "bronze_csv_adapter" ->
      """WITH src AS (
           SELECT c_name || ', ' || n_name || ', ' || r_name AS address,
                  c_acctbal AS price,
                  cast(c_custkey % 300 + 10 AS DOUBLE) AS area
           FROM customer
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey)
         SELECT md5(coalesce(address, '') || cast(price AS VARCHAR)
                    || cast(area AS VARCHAR)) AS list_id,
                address, price, area,
                trim(string_split(address, ',')[-1]) AS province,
                trim(string_split(address, ',')[-2]) AS district,
                CAST(NULL AS VARCHAR[]) IS NULL AS images_is_null
         FROM src ORDER BY list_id""",
    "p1_sanitize_columns" ->
      """SELECT l_orderkey, count(*) AS n,
                cast(sum(cast(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
         FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""",
    "p1_full_rename_map" -> graft.operators.RenameMap.syntheticOracleSql,
    "pipeline_incremental_run" ->
      """SELECT user_id, event_id, event_type, value FROM (
           SELECT *, row_number() OVER (PARTITION BY user_id
             ORDER BY ts DESC, event_id DESC) AS rn
           FROM events WHERE ts < TIMESTAMP '2024-01-20')
         WHERE rn = 1 ORDER BY user_id""")
}
