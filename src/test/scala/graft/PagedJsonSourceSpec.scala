package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Contract of the custom DataSource V2 paged-JSON reader
  * (`graft.sources.PagedJsonSource`): pages are the unit of
  * parallelism, column pruning reaches the parser, and schema
  * inference is a first-page metadata operation. */
class PagedJsonSourceSpec extends AnyFunSuite {
  import SparkTestBase._

  private lazy val base: String = {
    val dir = graft.sources.Ingest.fixtureDir(sfDir) + "/paged_api_spec"
    graft.sources.PagedJsonSource.buildPages(
      graft.sources.Tables.load(spark, sfDir, "events")
        .select("event_id", "user_id", "event_type", "value"),
      "event_id", nPages = 8, dir)
  }

  private def read() = spark.read
    .format("graft.sources.PagedJsonSource")
    .schema("event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE")
    .load(base)

  test("one input partition per page") {
    assert(read().rdd.getNumPartitions == 8,
      "page files must map 1:1 to input partitions")
  }

  test("maxPagesPerPartition bounds task count without changing rows") {
    // 8 pages coalesced 3-at-a-time -> ceil(8/3) = 3 partitions; the
    // 100 TB shape: parallelism bounded, row identity untouched
    val coalesced = spark.read
      .format("graft.sources.PagedJsonSource")
      .schema("event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE")
      .option("maxPagesPerPartition", "3")
      .load(base)
    assert(coalesced.rdd.getNumPartitions == 3,
      "8 pages at 3 pages/partition must plan 3 partitions")
    val a = coalesced.agg(
      count(lit(1)), countDistinct(col("event_id")),
      sum(col("value").cast("decimal(18,6)"))).collect()(0)
    val b = read().agg(
      count(lit(1)), countDistinct(col("event_id")),
      sum(col("value").cast("decimal(18,6)"))).collect()(0)
    assert(a == b, s"coalescing changed row content: $a vs $b")
  }

  test("no row lost or duplicated across the page layout") {
    val viaPages = read().agg(
      count(lit(1)), countDistinct(col("event_id")),
      sum(col("value").cast("decimal(18,6)"))).collect()(0)
    val direct = graft.sources.Tables.load(spark, sfDir, "events").agg(
      count(lit(1)), countDistinct(col("event_id")),
      sum(col("value").cast("decimal(18,6)"))).collect()(0)
    assert(viaPages == direct, s"paged read diverged: $viaPages vs $direct")
  }

  test("inferred schema (all-pages metadata pass) matches the data") {
    val inferred = spark.read
      .format("graft.sources.PagedJsonSource").load(base)
    // JSON inference orders fields alphabetically and widens numerics;
    // the COUNTS must agree with the explicit-schema read
    assert(inferred.columns.sorted.toSeq ==
      Seq("event_id", "event_type", "user_id", "value"))
    assert(inferred.count() == read().count())
  }

  test("ragged pages: inference unions keys across ALL pages") {
    // the crawl's actual shape: page 1 introduces a key page 0 lacks
    // (end_to_end_pipeline.py's ragged per-listing parameters); the
    // reference infers over all files (load_bronze_to_table.py:
    // 130-133) and so must we — a schema-less read that silently
    // drops later-page fields is the bug this pins
    val dir = graft.sources.Ingest.fixtureDir(sfDir) + "/paged_api_ragged"
    val p = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(p)
    java.nio.file.Files.write(p.resolve("page-00000.jsonl"),
      java.util.Arrays.asList("""{"id":1}""", """{"id":2}"""),
      java.nio.charset.StandardCharsets.UTF_8)
    java.nio.file.Files.write(p.resolve("page-00001.jsonl"),
      java.util.Arrays.asList("""{"id":3,"extra":"only-on-page-1"}"""),
      java.nio.charset.StandardCharsets.UTF_8)
    val inferred = spark.read.format("graft.sources.PagedJsonSource").load(dir)
    assert(inferred.columns.sorted.toSeq == Seq("extra", "id"),
      s"later-page key dropped by inference: ${inferred.columns.toSeq}")
    assert(inferred.where(col("extra").isNotNull).count() == 1,
      "the later-page field must carry its value")
    // the STREAMING half infers through the same path
    val streamSchema = spark.readStream
      .format("graft.sources.PagedJsonSource").load(dir).schema
    assert(streamSchema.fieldNames.sorted.toSeq == Seq("extra", "id"),
      s"streaming inference dropped a later-page key: $streamSchema")
    // samplePages=1 is the documented bounded-inference trade:
    // first-page-only, later-only keys invisible
    val sampled = spark.read.format("graft.sources.PagedJsonSource")
      .option("samplePages", "1").load(dir)
    assert(sampled.columns.toSeq == Seq("id"),
      s"samplePages=1 must infer from page 0 only: ${sampled.columns.toSeq}")
  }

  test("column pruning is pushed into the scan") {
    val plan = read().select("event_type", "value")
      .queryExecution.executedPlan.toString
    assert(plan.contains("readSchema=struct<event_type:string,value:double>"),
      s"scan did not prune to the 2 referenced columns:\n$plan")
  }

  test("filters reach the parser as a skip hint and stay residual") {
    val filtered = read().where(col("event_type") === "click")
    val plan = filtered.queryExecution.executedPlan.toString
    // exact content, not just the marker: an empty pushedFilters=[]
    // (pushdown silently broken) must fail here
    assert(plan.contains(
      "pushedFilters=[IsNotNull(event_type), EqualTo(event_type,click)]"),
      s"filter did not reach the scan:\n$plan")
    // residual semantics: the parser-side skip can never change the
    // result vs filtering the direct table read
    val expected = graft.sources.Tables.load(spark, sfDir, "events")
      .where(col("event_type") === "click").count()
    assert(filtered.count() == expected)
  }

  test("spark.sql.json.filterPushdown.enabled=false disables the parser skip") {
    spark.conf.set("spark.sql.json.filterPushdown.enabled", "false")
    try {
      val plan = read().where(col("event_type") === "click")
        .queryExecution.executedPlan.toString
      assert(plan.contains("pushedFilters=[]"),
        s"escape hatch must empty the pushed set:\n$plan")
    } finally spark.conf.unset("spark.sql.json.filterPushdown.enabled")
  }

  test("malformed page lines yield null rows (builtin PERMISSIVE parity)") {
    val dir = graft.sources.Ingest.fixtureDir(sfDir) + "/paged_api_bad"
    val p = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(p)
    java.nio.file.Files.write(p.resolve("page-00000.jsonl"),
      java.util.Arrays.asList(
        """{"event_id": 1, "value": 2.5}""",
        "{garbage",
        "   ",
        """{"event_id": 2, "value": 3.5}"""),
      java.nio.charset.StandardCharsets.UTF_8)
    val rows = spark.read.format("graft.sources.PagedJsonSource")
      .schema("event_id BIGINT, value DOUBLE").load(dir).collect()
    // 2 parsed rows + 1 all-null row for the garbage line; the
    // whitespace-only line is skipped — a poisoned crawl page must
    // not kill the task
    assert(rows.length == 3, s"expected 3 rows, got ${rows.toSeq}")
    assert(rows.count(r => r.isNullAt(0) && r.isNullAt(1)) == 1,
      s"garbage line should surface as one null row: ${rows.toSeq}")
  }

  test("streaming: the API cursor is the offset — resume ships only new pages") {
    import spark.implicits._
    val nonce = "paged_stream_" + System.nanoTime()
    val dir = s"/tmp/graft_paged_stream/src_$nonce"
    val out = s"/tmp/graft_paged_stream/out_$nonce"
    val ckpt = s"/tmp/graft_stream_ckpt/$nonce"
    def writePage(i: Int, rows: String*): Unit = {
      val p = java.nio.file.Paths.get(dir)
      java.nio.file.Files.createDirectories(p)
      java.nio.file.Files.write(p.resolve(f"page-$i%05d.jsonl"),
        java.util.Arrays.asList(rows: _*),
        java.nio.charset.StandardCharsets.UTF_8)
    }
    def runOnce(): Seq[Long] = {
      val q = spark.readStream.format("graft.sources.PagedJsonSource")
        .schema("id BIGINT, tag STRING")
        .option("maxPagesPerTrigger", "1")
        .load(dir)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q.recentProgress.map(_.numInputRows).toSeq
    }
    writePage(0, """{"id":1,"tag":"a"}""", """{"id":2,"tag":"b"}""")
    writePage(1, """{"id":3,"tag":"c"}""")
    val batches = runOnce()
    assert(spark.read.parquet(out).count() == 3,
      "first run must consume both existing pages")
    // admission control is REAL micro-batching, not one giant batch:
    // AvailableNow + maxPagesPerTrigger=1 drains 2 pages as 2 batches
    assert(batches.filter(_ > 0) == Seq(2L, 1L),
      s"expected one batch per page (2 rows then 1): $batches")
    writePage(2, """{"id":4,"tag":"d"}""")
    runOnce()
    val tags = spark.read.parquet(out)
      .select("tag").as[String].collect().sorted.toSeq
    // the checkpointed cursor must skip pages 0-1: nothing re-shipped
    assert(tags == Seq("a", "b", "c", "d"),
      s"cursor resume shipped wrong pages: $tags")
  }

  test("streaming: a gap-filling page below the cursor aborts, a true append resumes") {
    import spark.implicits._
    val nonce = "paged_gap_" + System.nanoTime()
    val dir = s"/tmp/graft_paged_stream/src_$nonce"
    val out = s"/tmp/graft_paged_stream/out_$nonce"
    val ckpt = s"/tmp/graft_stream_ckpt/$nonce"
    def writePage(i: Int, rows: String*): Unit = {
      val p = java.nio.file.Paths.get(dir)
      java.nio.file.Files.createDirectories(p)
      java.nio.file.Files.write(p.resolve(f"page-$i%05d.jsonl"),
        java.util.Arrays.asList(rows: _*),
        java.nio.charset.StandardCharsets.UTF_8)
    }
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft.sources.PagedJsonSource")
        .schema("id BIGINT, tag STRING")
        .load(dir)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // the crawl legitimately skips empty pages: consume 0 and 2
    writePage(0, """{"id":1,"tag":"a"}""")
    writePage(2, """{"id":3,"tag":"c"}""")
    runOnce()
    assert(spark.read.parquet(out).count() == 2)
    // a true append above the cursor resumes cleanly across the gap
    writePage(3, """{"id":4,"tag":"d"}""")
    runOnce()
    assert(spark.read.parquet(out).select("tag").as[String].collect().sorted
      .toSeq == Seq("a", "c", "d"))
    // a LATE page filling the numbering gap below the cursor shifts
    // every consumed position while keeping counts monotone — the
    // count-only guard round 8 shipped would silently re-ship page 2
    // and skip page 1; the page-NUMBER check must abort instead
    writePage(1, """{"id":9,"tag":"X"}""")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runOnce()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("mutated below the cursor")),
      s"expected the cursor-identity abort, got: ${messages(e)}")
    // and nothing was re-shipped or skipped before the abort
    assert(spark.read.parquet(out).select("tag").as[String].collect().sorted
      .toSeq == Seq("a", "c", "d"))
  }

  test("streaming: count-preserving delete+gap-fill below the cursor aborts") {
    // the adversarial case a single-position check misses: consume
    // [page-0, page-5], then delete page-0 AND gap-fill page-1 — the
    // listing keeps length 2 and the same LAST page number 5, but the
    // consumed prefix is no longer the consumed pages; only the
    // full-prefix fingerprint in the offset can see it
    val nonce = "paged_swap_" + System.nanoTime()
    val dir = s"/tmp/graft_paged_stream/src_$nonce"
    val out = s"/tmp/graft_paged_stream/out_$nonce"
    val ckpt = s"/tmp/graft_stream_ckpt/$nonce"
    def writePage(i: Int, rows: String*): Unit = {
      val p = java.nio.file.Paths.get(dir)
      java.nio.file.Files.createDirectories(p)
      java.nio.file.Files.write(p.resolve(f"page-$i%05d.jsonl"),
        java.util.Arrays.asList(rows: _*),
        java.nio.charset.StandardCharsets.UTF_8)
    }
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft.sources.PagedJsonSource")
        .schema("id BIGINT, tag STRING")
        .load(dir)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    writePage(0, """{"id":1,"tag":"a"}""")
    writePage(5, """{"id":2,"tag":"b"}""")
    runOnce()
    assert(spark.read.parquet(out).count() == 2)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(dir).resolve("page-00000.jsonl"))
    writePage(1, """{"id":9,"tag":"X"}""")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runOnce()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("mutated below the cursor")),
      s"expected the prefix-fingerprint abort, got: ${messages(e)}")
  }

  test("missing directory reads as empty, not as an error") {
    val df = spark.read
      .format("graft.sources.PagedJsonSource")
      .schema("event_id BIGINT").load("/tmp/graft_paged_json_nonexistent")
    assert(df.count() == 0)
  }
}
