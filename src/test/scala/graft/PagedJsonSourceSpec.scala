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

  test("no row lost or duplicated across the page layout") {
    val viaPages = read().agg(
      count(lit(1)), countDistinct(col("event_id")),
      sum(col("value").cast("decimal(18,6)"))).collect()(0)
    val direct = graft.sources.Tables.load(spark, sfDir, "events").agg(
      count(lit(1)), countDistinct(col("event_id")),
      sum(col("value").cast("decimal(18,6)"))).collect()(0)
    assert(viaPages == direct, s"paged read diverged: $viaPages vs $direct")
  }

  test("inferred schema (first-page metadata pass) matches the data") {
    val inferred = spark.read
      .format("graft.sources.PagedJsonSource").load(base)
    // JSON inference orders fields alphabetically and widens numerics;
    // the COUNTS must agree with the explicit-schema read
    assert(inferred.columns.sorted.toSeq ==
      Seq("event_id", "event_type", "user_id", "value"))
    assert(inferred.count() == read().count())
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

  test("missing directory reads as empty, not as an error") {
    val df = spark.read
      .format("graft.sources.PagedJsonSource")
      .schema("event_id BIGINT").load("/tmp/graft_paged_json_nonexistent")
    assert(df.count() == 0)
  }
}
