package graft

import org.scalatest.funsuite.AnyFunSuite

/** Side-effecting registry queries (table writes, state files,
  * streaming sinks) must be idempotent under repeated invocation in
  * ONE session — the driver is free to call a query more than once. */
class IdempotenceSpec extends AnyFunSuite {
  import SparkTestBase._

  private def runTwice(name: String): Unit = {
    val fn = SparkEntry.queries(name)
    val first = fn(spark, sfDir).collect()
    val second = fn(spark, sfDir).collect()
    assert(first.sameElements(second), s"$name diverged across invocations")
    assert(first.nonEmpty, s"$name returned no rows")
  }

  test("bucketed-join query is re-runnable (managed tables recreated)") {
    runTwice("j1_bucketed_colocated_join")
  }

  test("incremental-file query is re-runnable (state store merge is idempotent)") {
    runTwice("s5_incremental_files")
  }

  test("streaming query is re-runnable (nonced sink + checkpoint)") {
    runTwice("stream_daily_counts")
  }

  test("two-run pipeline query is re-runnable (materializations overwritten)") {
    runTwice("pipeline_incremental_run")
  }

  test("incremental-dedup query is re-runnable (fingerprint store overwritten)") {
    runTwice("llm_incremental_dedup")
  }

  test("append-sink archive query is re-runnable (nonced output + checkpoint)") {
    runTwice("stream_events_archive")
  }

  test("compaction query is re-runnable (fixture dirs overwritten)") {
    runTwice("s13_compact_small_files")
  }

  test("incremental near-dup query is re-runnable (signature store overwritten)") {
    runTwice("llm_incremental_neardup")
  }

  test("stream-stream join query is re-runnable (nonced sink + checkpoint)") {
    runTwice("stream_stream_join")
  }

  test("session-window streaming query is re-runnable (nonced sink + checkpoint)") {
    runTwice("stream_session_window")
  }

  test("streaming merge-upsert query is re-runnable (nonced source/target/checkpoint)") {
    runTwice("stream_upsert_merge")
  }

  test("threshold-emission streaming query is re-runnable (nonced sink + checkpoint)") {
    runTwice("stream_threshold_emit")
  }

  test("transformWithState query is re-runnable (nonced source/sink/checkpoint)") {
    runTwice("stream_transform_with_state")
  }

  test("timer-session streaming query is re-runnable (nonced source/sink/checkpoint)") {
    runTwice("stream_timer_sessions")
  }

  test("zorder layout query is re-runnable (clustered dir overwritten)") {
    runTwice("s15_zorder_layout")
  }

  test("targeted-delete query is re-runnable (base table rebuilt each run)") {
    runTwice("s14_targeted_delete")
  }

  test("versioned-snapshot query is re-runnable (version dirs overwritten)") {
    runTwice("s16_versioned_snapshot")
  }

  test("vacuum query is re-runnable (history rebuilt before each vacuum)") {
    runTwice("s17_vacuum_retention")
  }

  test("dpp query is re-runnable (partitioned fixture overwritten)") {
    runTwice("j14_dpp_star_join")
  }

  test("cbo query is re-runnable (dim table + stats recreated)") {
    runTwice("j15_cbo_stats_join")
  }

  test("watermark-dedup streaming query is re-runnable (nonced source/sink/checkpoint)") {
    runTwice("stream_dropdup_watermark")
  }

  test("orc round-trip query is re-runnable (fixture dir overwritten)") {
    runTwice("s19_orc_roundtrip")
  }

  test("malformed-csv query is re-runnable (fixture dir overwritten)") {
    runTwice("s20_csv_malformed_modes")
  }

  test("corrupt-json query is re-runnable (fixture dir overwritten)") {
    runTwice("s21_json_corrupt_modes")
  }

  test("paged-json DSv2 query is re-runnable (page dir rebuilt)") {
    runTwice("s10_paged_json_source")
  }

  test("paged-json streaming query is re-runnable (nonced sink + checkpoint)") {
    runTwice("stream_paged_json_source")
  }

  test("memory-sink and file-sink streaming variants agree") {
    import org.apache.spark.sql.functions.col
    val order = Seq(col("report_date"), col("event_type"))
    val mem = graft.streaming.StreamingOps.dailyEventCounts(spark, sfDir)
      .orderBy(order: _*).collect()
    val file = graft.streaming.StreamingOps.dailyEventCountsToFiles(spark, sfDir)
      .orderBy(order: _*).collect()
    assert(mem.nonEmpty && mem.sameElements(file),
      "file-sink stream result diverged from memory-sink result")
  }
}
