package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import graft.SparkTestBase

/** Scale-shape + numeric-edge laws for the streaming operators that
  * the sfDir oracle compare cannot articulate: the upsert merge must
  * keep the TARGET out of every per-batch shuffle (the 100 TB
  * contract), and tier emission must agree with the DuckDB oracle on
  * refunds (negative values) the non-negative fixture never
  * exercises. */
class StreamingSemanticsSpec extends AnyFunSuite {
  import SparkTestBase._

  test("mergeBatch: untouched target bulk flows scan→anti→union, no shuffle") {
    val base = graft.sources.Tables.load(spark, sfDir, "events")
      .select("user_id", "event_id", "event_type", "value", "ts")
    val prevDir = graft.sources.Ingest.fixtureDir(sfDir) + "/merge_prev_spec"
    StreamingOps.latestPerUser(base.where(col("event_id") % 3 =!= 0))
      .write.mode("overwrite").parquet(prevDir)
    val prev = spark.read.parquet(prevDir)
    val incoming = StreamingOps.latestPerUser(base.where(col("event_id") % 3 === 0))

    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val merged = StreamingOps.mergeBatch(prev, incoming)
      val plan = merged.queryExecution.executedPlan
      // the target passes through a broadcast anti join (batch keys
      // build side), and that anti join's OUTPUT never re-shuffles:
      // no ShuffleExchange holds the anti join in its subtree
      val antis = plan.collect {
        case j: BroadcastHashJoinExec if j.joinType == LeftAnti => j }
      assert(antis.size == 1, s"expected 1 broadcast anti join:\n$plan")
      val shufflesOverAnti = plan.collect {
        case e: ShuffleExchangeExec if e.collectFirst {
          case j: BroadcastHashJoinExec if j.joinType == LeftAnti => j
        }.nonEmpty => e
      }
      assert(shufflesOverAnti.isEmpty,
        s"target bulk re-shuffles above the anti join — O(target) merge:\n$plan")
      // only the contested slice (broadcast semi) re-enters the
      // latest-wins aggregate
      val semis = plan.collect {
        case j: BroadcastHashJoinExec if j.joinType == LeftSemi => j }
      assert(semis.size == 1, s"expected 1 broadcast semi join:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)

    // semantics: identical to the naive full re-aggregation
    val merged = StreamingOps.mergeBatch(prev, incoming)
    val naive = StreamingOps.latestPerUser(prev.unionByName(incoming))
    assert(merged.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(merged).count() == 0)
  }

  private def ev(id: Long, v: Double) =
    ThresholdEmit.EventRow(id, new java.sql.Timestamp(id * 60000L), 1L, v)

  test("toCents rounds ties half-away-from-zero (DuckDB round), not half-up") {
    assert(ThresholdEmit.toCents(2.125) == 213)   // 212.5 → away from zero
    assert(ThresholdEmit.toCents(-2.125) == -213) // math.round gives -212
    assert(ThresholdEmit.toCents(-0.005) == -1)   // math.round gives 0
    assert(ThresholdEmit.toCents(490.02) == 49002)
    assert(ThresholdEmit.toCents(-490.02) == -49002)
  }

  test("refund semantics: only positive tiers emit; re-crossing re-emits") {
    // deposit 1500 → tier 1; refund 600 (cum 900, no emission);
    // deposit 200 (cum 1100) → tier 1 crossed AGAIN from below
    val (cum1, out1) = ThresholdEmit.foldCrossings(1L,
      Seq(ev(1, 1500.00), ev(2, -600.00), ev(3, 200.00)), 0L)
    assert(cum1 == 110000L)
    assert(out1.map(c => (c.event_id, c.tier)) == Seq((1L, 1L), (3L, 1L)))

    // a dip below zero emits nothing on the way down and no tier <= 0
    // on the way back up (the DuckDB oracle's `tier >= 1` filter)
    val (cum2, out2) = ThresholdEmit.foldCrossings(1L,
      Seq(ev(1, -1500.00), ev(2, 2700.00), ev(3, 900.00)), 0L)
    assert(cum2 == 210000L)
    assert(out2.map(c => (c.event_id, c.tier)) == Seq((2L, 1L), (3L, 2L)))

    // state round-trip: a later batch resumes from the stored cum
    val (cum3, out3) = ThresholdEmit.foldCrossings(1L, Seq(ev(4, 1000.00)), cum2)
    assert(cum3 == 310000L && out3.map(_.tier) == Seq(3L))
  }

  test("streaming paths survive a refund fixture (negative values end-to-end)") {
    // The harness fixture is all-positive, so this drives the ACTUAL
    // streaming machinery (flatMapGroupsWithState + transformWithState/
    // RocksDB) over refunds: dips, re-crossings, exact tie cents.
    import spark.implicits._
    val dir = graft.sources.Ingest.fixtureDir(sfDir) + "/refund_fixture"
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val rows = Seq(
      (1L, t(1), 10L, "purchase", 1500.00),
      (2L, t(2), 10L, "refund", -600.00),
      (3L, t(3), 10L, "purchase", 200.00), // re-crosses tier 1
      (4L, t(1), 11L, "refund", -1500.00), // dips below zero first
      (5L, t(2), 11L, "purchase", 2700.00),
      (6L, t(3), 11L, "purchase", 900.00),
      (7L, t(1), 12L, "purchase", 2.125), // exact .5-cent ties
      (8L, t(2), 12L, "refund", -2.125),
      (9L, t(1), 13L, "refund", -0.005)) // rounds away from zero
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val tmp = dir + "/__build"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    // the streaming sources glob the literal FILE name events.parquet
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)

    val crossings = ThresholdEmit.tierCrossings(spark, dir)
      .select("user_id", "event_id", "tier")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(crossings == Set((10L, 1L, 1L), (10L, 3L, 1L),
      (11L, 5L, 1L), (11L, 6L, 2L)),
      s"refund tier semantics diverged: $crossings")

    val spend = TransformWithStateOps.runningSpend(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // (total_cents, n_events, n_types, n_batches); batches = distinct
    // event_id%3 groups per user
    assert(spend(10L) == ((110000L, 3L, 2L, 3L)))
    assert(spend(11L) == ((210000L, 3L, 2L, 3L)))
    assert(spend(12L) == ((0L, 2L, 2L, 2L)), s"tie cents diverged: ${spend(12L)}")
    assert(spend(13L) == ((-1L, 1L, 1L, 1L)), s"negative tie diverged: ${spend(13L)}")
  }

  test("checkpoint resume: a restarted stream processes only new files, exactly once") {
    // The native version of the reference's _processed_files.txt
    // incremental contract (load_bronze_to_table.py:37-73): the file
    // source tracks consumed files in the checkpoint, so a restarted
    // AvailableNow run ships ONLY files that arrived since the last
    // run, and nothing twice — restart-safe incremental ingest with
    // no bookkeeping code at all.
    import spark.implicits._
    val nonce = "ckpt_resume_" + System.nanoTime()
    val srcDir = s"/tmp/graft_stream_resume/src_$nonce"
    val outDir = s"/tmp/graft_stream_resume/out_$nonce"
    val ckpt = s"/tmp/graft_stream_ckpt/$nonce"
    val seed = Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
    def runOnce(): Unit = {
      val q = spark.readStream.schema(seed.schema).parquet(srcDir)
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    seed.coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()
    val afterFirst = spark.read.parquet(outDir).count()
    assert(afterFirst == 2, s"first run should ship both seed rows: $afterFirst")
    Seq((3L, "c")).toDF("id", "tag")
      .coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()
    val ids = spark.read.parquet(outDir)
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L),
      s"resume must ship only the new file and never re-ship old ones: $ids")
  }

  test("dropDuplicatesWithinWatermark: cross-batch dedup + horizon expiry") {
    // The registry witness runs one micro-batch; this drives the two
    // halves that need batch boundaries: (a) a duplicate arriving in a
    // LATER batch is dropped while its key is inside the horizon, and
    // (b) once the watermark passes key-ts + delay the state is
    // EVICTED, so a fresh-timestamped redelivery re-emits — the
    // observable proof that state is bounded to the horizon rather
    // than accumulating forever.
    import spark.implicits._
    val nonce = "dropdup_spec_" + System.nanoTime()
    val srcDir = s"/tmp/graft_stream_dropdup/spec_src_$nonce"
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(hours: Long) = new java.sql.Timestamp(t0.getTime + hours * 3600000L)
    val batches = Seq(
      // batch 1: two distinct keys
      Seq((1L, at(0), "a"), (2L, at(1), "b")),
      // batch 2: key 1 redelivered inside the horizon (dropped) + a
      // far-ahead row that advances the watermark to t0+48h, past
      // key 1's expiry at ts(t0) + 1d delay
      Seq((1L, at(0), "a-dup"), (3L, at(72), "c")),
      // batch 3: spacer — state cleanup applies the advanced
      // watermark at the END of a batch, so key 1's eviction lands
      // here, one batch after the watermark moved
      Seq((4L, at(73), "d")),
      // batch 4: key 1 re-sent with a fresh in-horizon timestamp
      // AFTER eviction -> re-emits
      Seq((1L, at(60), "a-again")))
    batches.foreach { rows =>
      rows.toDF("event_id", "ts", "tag").coalesce(1)
        .write.mode("append").parquet(srcDir)
      Thread.sleep(1100) // distinct mtimes -> deterministic file order
    }
    val outDir = s"/tmp/graft_stream_dropdup/spec_out_$nonce"
    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .withWatermark("ts", "1 day")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", s"/tmp/graft_stream_ckpt/$nonce")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val tags = spark.read.parquet(outDir)
      .select("tag").collect().map(_.getString(0)).toSet
    assert(tags == Set("a", "b", "c", "d", "a-again"),
      s"expected in-horizon dup dropped and post-expiry redelivery kept: $tags")
  }

  test("stream-stream LEFT OUTER join equals the batch left join, nulls included") {
    // the law the oracle pins at sf0.01, asserted in-JVM at sf0.001:
    // the streamed outer join (flush sentinels + spacer batch driving
    // watermark expiry) must reproduce the BATCH left join exactly —
    // in particular the UNMATCHED clicks, which only exist if expired
    // state really emits its null rows
    val streamed = StreamingOps.streamStreamOuterAttribution(spark, sfDir)
      .select("user_id", "click_id", "purchase_id")
    val ev = graft.sources.Tables.load(spark, sfDir, "events")
      .where(col("user_id") % 3 === 0) // the witness's deterministic subset
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("p_id"))
    val batch = clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("interval 1 day"),
        "left_outer")
      .select(col("user_id"), col("click_id"),
        coalesce(col("p_id"), lit(-1L)).as("purchase_id"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed outer join diverged from the batch left join")
    val unmatched = batch.where(col("purchase_id") === -1).count()
    assert(unmatched > 0,
      "fixture must contain unmatched clicks or the expiry path is untested")
  }

  test("StreamingQueryListener: progress events carry exact input-row and state accounting") {
    // the production monitoring surface: a listener observes every
    // micro-batch's numInputRows and the stateful operator's state
    // rows — at 100 TB this is how lag, state growth, and watermark
    // stalls actually get alerted on. The accounting must be EXACT:
    // summed numInputRows equals the feed, state rows equal the
    // distinct group count.
    import org.apache.spark.sql.streaming.StreamingQueryListener
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.streaming.StreamingQueryProgress]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        seen.add(e.progress)
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    try {
      val out = StreamingOps.dailyEventCounts(spark, sfDir)
      val expectedGroups = out.count()
      val events = graft.sources.Tables.load(spark, sfDir, "events").count()
      // listener delivery is async — progress events may trail the
      // query's termination briefly
      val deadline = System.nanoTime() + 30L * 1000000000L
      def inputRows = {
        val it = seen.iterator(); var s = 0L
        while (it.hasNext) s += it.next().numInputRows
        s
      }
      while (inputRows < events && System.nanoTime() < deadline)
        Thread.sleep(100)
      assert(inputRows == events,
        s"listener accounted $inputRows input rows, feed has $events")
      val stateRows = {
        val it = seen.iterator(); var m = 0L
        while (it.hasNext) {
          val p = it.next()
          p.stateOperators.foreach(so => m = math.max(m, so.numRowsTotal))
        }
        m
      }
      assert(stateRows == expectedGroups,
        s"state rows $stateRows != aggregate groups $expectedGroups")
    } finally spark.streams.removeListener(listener)
  }
}
