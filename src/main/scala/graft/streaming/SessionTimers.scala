package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** EVENT-TIME TIMERS in `transformWithState` — the state-API-v2
  * surface the other arbitrary-state witnesses don't touch
  * ([[TransformWithStateOps]] runs TimeMode.None: state mutation
  * only). Timers are how production state actually gets BOUNDED: the
  * processor registers an expiry per key, the runtime calls
  * `handleExpiredTimer` once the watermark passes it, and the key's
  * state is emitted + cleared — TTL-by-semantics instead of
  * TTL-by-config.
  *
  * Witness semantics: 30-minute-gap sessionization per user —
  * deliberately the SAME contract as the builtin
  * `session_window` witness (`stream_session_window`), so one oracle
  * pins both the declarative operator and this timer-driven
  * re-expression of it. Each key holds its PENDING sessions (merged
  * intervals, never raw events — state is O(open sessions), bounded
  * by the watermark horizon at 100 TB/day); every input batch merges
  * its rows in and re-arms one timer at the earliest pending
  * session's close (last event + gap); when the watermark passes
  * that, the expired-timer callback emits every ripe session
  * (watermark ≥ last + gap ⇒ no future row can merge into it — the
  * watermark contract makes the finalization safe) and re-arms for
  * the rest.
  *
  * Determinism harness (same recipe as the stream-stream outer
  * join): the feed is consumed through the engine's own paged source
  * one page per micro-batch — page 0 carries the whole real feed
  * (watermark still unset while it processes, so nothing is late),
  * pages 1–2 carry far-future sentinels (user −1, filtered from the
  * readback): the first advances the watermark past every real
  * session's close, the second is the batch in which those timers
  * then fire.
  */
object SessionTimers {

  case class SessEvent(user_id: Long, event_id: Long, ts: java.sql.Timestamp)
  case class PendingSession(start_us: Long, last_us: Long, n: Long)
  case class SessionOut(user_id: Long, session_start_us: Long,
                        session_end_us: Long, n_events: Long)

  /** Merge pending sessions with a batch of event times: interval
    * merge under the session rule — a row extends a session when its
    * distance from the session's last event is < gap (the
    * `session_window` / oracle break rule is `diff >= gap` starts a
    * new session). Pure, so the law is unit-testable. */
  private[graft] def mergeAll(existing: Seq[PendingSession],
                              eventUs: Seq[Long],
                              gapUs: Long): Seq[PendingSession] = {
    val all = (existing ++ eventUs.map(us => PendingSession(us, us, 1L)))
      .sortBy(p => (p.start_us, p.last_us))
    val out = scala.collection.mutable.ArrayBuffer[PendingSession]()
    all.foreach { p =>
      if (out.nonEmpty && p.start_us - out.last.last_us < gapUs) {
        val prev = out.remove(out.length - 1)
        out += PendingSession(prev.start_us,
          math.max(prev.last_us, p.last_us), prev.n + p.n)
      } else out += p
    }
    out.toSeq
  }

  /** One ListState cell of merged pending sessions per user; one
    * armed timer per key (the earliest close). */
  class SessionTimerProcessor(gapUs: Long)
      extends StatefulProcessor[Long, SessEvent, SessionOut] {
    @transient private var pending: ListState[PendingSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      pending = getHandle.getListState[PendingSession]("pending",
        Encoders.product[PendingSession], TTLConfig.NONE)

    /** Re-arm the key's single timer at the earliest pending close.
      * A timer whose expiry is already behind the watermark fires in
      * the next micro-batch — that is what drains multi-session
      * backlogs batch by batch. */
    private def rearmTimer(ps: Seq[PendingSession]): Unit = {
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      // CEIL to millis: timers are ms-granular but ripeness compares
      // in micros — flooring would let a timer fire up to 999us before
      // the session is ripe, find nothing, and re-arm an already-
      // passed expiry (a session silently withheld if the watermark
      // never advances again)
      if (ps.nonEmpty)
        getHandle.registerTimer((ps.map(_.last_us).min + gapUs + 999L) / 1000L)
    }

    override def handleInputRows(user: Long, rows: Iterator[SessEvent],
                                 timers: TimerValues): Iterator[SessionOut] = {
      // exact micros (Timestamp.getTime would truncate to millis)
      val evUs = rows.map { r =>
        val i = r.ts.toInstant
        i.getEpochSecond * 1000000L + i.getNano / 1000L
      }.toSeq
      val existing = if (pending.exists()) pending.get().toSeq else Seq.empty
      val merged = mergeAll(existing, evUs, gapUs)
      pending.put(merged.toArray)
      rearmTimer(merged)
      Iterator.empty
    }

    override def handleExpiredTimer(user: Long, timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[SessionOut] = {
      val wmUs = timers.getCurrentWatermarkInMs * 1000L
      val ps = if (pending.exists()) pending.get().toSeq else Seq.empty
      val (ripe, rest) = ps.partition(p => p.last_us + gapUs <= wmUs)
      if (rest.isEmpty) pending.clear() else pending.put(rest.toArray)
      rearmTimer(rest)
      ripe.sortBy(_.start_us)
        .map(p => SessionOut(user, p.start_us, p.last_us + gapUs, p.n))
        .iterator
    }
  }

  /** Run timer-driven sessionization over the events feed to
    * completion and return the finalized sessions.
    *
    * TWO-SENTINEL INVARIANT (load-bearing, do not weaken): an
    * AvailableNow query stops once the source drains, and a timer
    * that becomes ripe only under the FINAL batch's watermark fires
    * in the NEXT micro-batch — which never runs. A single flush page
    * would advance the watermark past every real session's close but
    * stop before the re-armed timers fire, silently withholding the
    * trailing sessions. Hence exactly two sentinel pages: page 1
    * advances the watermark, page 2 is the batch in which the now-
    * ripe timers fire. The completeness assertion below recomputes
    * the session count in batch and fails loudly if a future edit
    * drops a sentinel. */
  def timerSessions(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nonce = "graft_timer_sess_" + System.nanoTime()
    val pageDir = "/tmp/graft_stream_src/" + nonce
    val ev = graft.sources.Tables.load(spark, sfDir, "events")
      .select("user_id", "event_id", "ts")
    graft.sources.PagedJsonSource.buildPages(ev, "event_id", 1, pageDir)
    def flushPage(idx: Int, ts: String): Unit =
      graft.sources.PagedJsonSource.writePage(pageDir, idx,
        Seq(s"""{"user_id":-1,"event_id":-1,"ts":"$ts"}"""))
    flushPage(1, "2030-01-01T00:00:00.000Z")
    flushPage(2, "2030-03-01T00:00:00.000Z")

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    try {
      // transformWithState requires RocksDB (same scoped swap +
      // sequential-harness caveat as TransformWithStateOps)
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val events = spark.readStream.format("graft.sources.PagedJsonSource")
        .schema("user_id BIGINT, event_id BIGINT, ts TIMESTAMP")
        .option("maxPagesPerTrigger", "1")
        .load(pageDir)
        .withWatermark("ts", "1 day")
        .as[SessEvent]
      val sessions = events.groupByKey(_.user_id)
        .transformWithState(new SessionTimerProcessor(gapUs = 1800000000L),
          TimeMode.EventTime(), OutputMode.Append())
      // state = pending sessions ≤ events within the horizon
      StreamTune.withStatePartitions(spark,
        StreamTune.eventRows(spark, sfDir)) {
        val q = sessions.writeStream
          .format("memory").queryName(nonce)
          .outputMode("append")
          .option("checkpointLocation", "/tmp/graft_stream_ckpt/" + nonce)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      StreamTune.dropScratch("/tmp/graft_stream_ckpt/" + nonce, pageDir)
    } finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    // Completeness check for the two-sentinel invariant: the batch
    // session_window recompute (same 30-min contract as the oracle)
    // must agree on the session COUNT — if a caller ever runs this
    // with fewer sentinel pages, trailing sessions are withheld and
    // this fails instead of returning a silently short result.
    val streamed = spark.table(nonce).where(col("user_id") >= 0)
    val expected = ev
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .count().count()
    val got = streamed.count()
    require(got == expected,
      s"timerSessions emitted $got sessions but batch recompute has " +
        s"$expected — trailing timers never fired (two-sentinel " +
        "invariant violated?)")
    streamed
  }
}
