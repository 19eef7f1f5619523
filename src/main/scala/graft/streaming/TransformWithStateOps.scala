package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** The CURRENT arbitrary-state streaming API — `transformWithState`
  * (state API v2, Spark 4.x [[StatefulProcessor]]) — rounding out
  * coverage of all three Structured-Streaming state APIs beside
  * [[StatefulDedup]] (mapGroupsWithState) and [[ThresholdEmit]]
  * (flatMapGroupsWithState). What v2 adds, and what this witness
  * exercises: NAMED TYPED state cells per key (two ValueStates plus a
  * MapState — composite shapes v1 forces into one case-class blob
  * rewritten wholesale per update), first-class TTL plumbing, and the
  * RocksDB state-store provider the API requires — the 100 TB state
  * backend, where per-key state lives off-heap/on-disk per executor
  * instead of in JVM hash maps.
  *
  * Witness semantics: per-user running spend. Each micro-batch folds
  * its rows into cumulative cents (exact integer,
  * [[ThresholdEmit.toCents]] discipline), the running event count and
  * per-event-type counts (MapState), then emits ONE progress row per
  * (user, batch). The read-back aggregate is independent of
  * file→batch assignment order by construction: `batch_cents` is the
  * batch's own DELTA (summable in any order — refund-safe where a
  * max-of-cumulative would not be, since refunds make the cumulative
  * non-monotone), while `n_events`/`n_types` are genuinely monotone
  * counters (→ max).
  */
object TransformWithStateOps {

  case class SpendEvent(event_id: Long, user_id: Long, event_type: String,
                        value: Double)
  case class SpendProgress(user_id: Long, batch_cents: Long, n_events: Long,
                           n_types: Long)

  /** Per-user running-spend processor: two ValueStates + a MapState,
    * O(1)-per-key state (the map is bounded by |event types|). */
  class SpendProcessor
      extends StatefulProcessor[Long, SpendEvent, SpendProgress] {
    @transient private var cum: ValueState[Long] = _
    @transient private var cnt: ValueState[Long] = _
    @transient private var byType: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      cum = getHandle.getValueState[Long]("cum", Encoders.scalaLong, TTLConfig.NONE)
      cnt = getHandle.getValueState[Long]("cnt", Encoders.scalaLong, TTLConfig.NONE)
      byType = getHandle.getMapState[String, Long]("by_type",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[SpendEvent],
                                 timers: TimerValues): Iterator[SpendProgress] = {
      var c = if (cum.exists()) cum.get() else 0L
      var n = if (cnt.exists()) cnt.get() else 0L
      var batchCents = 0L
      rows.foreach { r =>
        val cents = ThresholdEmit.toCents(r.value)
        c += cents
        batchCents += cents
        n += 1
        val prev = if (byType.containsKey(r.event_type))
          byType.getValue(r.event_type) else 0L
        byType.updateValue(r.event_type, prev + 1)
      }
      cum.update(c)
      cnt.update(n)
      var types = 0L
      val it = byType.keys()
      while (it.hasNext) { it.next(); types += 1 }
      Iterator.single(SpendProgress(user, batchCents, n, types))
    }
  }

  /** Run the processor over the events table split into three
    * micro-batches (event_id mod 3, one file per trigger — state
    * genuinely persists across batches in RocksDB), then aggregate
    * the per-batch progress rows into the order-independent final
    * shape: per-user max of each monotone measure + batch count. */
  def runningSpend(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nonce = "graft_tws_" + System.nanoTime()
    val srcDir = s"/tmp/graft_tws/src_$nonce"
    val base = graft.sources.Tables.load(spark, sfDir, "events")
      .select("event_id", "user_id", "event_type", "value")
    (0 until 3).foreach { i =>
      base.where(pmod(col("event_id"), lit(3)) === i)
        .coalesce(1).write.mode("append").parquet(srcDir)
    }
    val schema = spark.read.parquet(srcDir).schema
    // transformWithState requires the RocksDB provider; scope it to
    // this query's start (the conf is captured at stream start).
    // CAVEAT: the conf is SESSION-global for the swap window — any
    // OTHER stream started concurrently in this session while this
    // query spins up would silently inherit RocksDB (or have its
    // intended provider reverted by the finally). Safe here because
    // the harness runs queries sequentially (Verify/Bench/specs all
    // single-stream); a concurrent-streams caller must instead set
    // the provider once session-wide, or isolate via newSession().
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    try {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val events = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
        .as[SpendEvent]
      val progress = events.groupByKey(_.user_id)
        .transformWithState(new SpendProcessor, TimeMode.None(),
          OutputMode.Append())
      // state = ValueState per user (≤ events); RocksDB instances per
      // partition make oversizing even costlier than HDFS-backed
      StreamTune.withStatePartitions(spark,
        StreamTune.eventRows(spark, sfDir)) {
        val q = progress.writeStream
          .format("memory").queryName(nonce)
          .outputMode("append")
          .option("checkpointLocation", "/tmp/graft_stream_ckpt/" + nonce)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      StreamTune.dropScratch("/tmp/graft_stream_ckpt/" + nonce, srcDir)
    } finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    spark.table(nonce)
      .groupBy("user_id")
      .agg(sum("batch_cents").as("total_cents"),
        max("n_events").as("n_events"),
        max("n_types").as("n_types"),
        count(lit(1)).as("n_batches"))
  }
}
