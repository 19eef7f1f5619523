package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Variable-arity stateful emission via `flatMapGroupsWithState` — the
  * one KeyValueGroupedDataset state API [[StatefulDedup]]'s
  * mapGroupsWithState (exactly one row per group per batch) cannot
  * express: a group invocation here emits ZERO OR MANY rows. The
  * witness is spend-tier alerting: each user's running value total
  * (in exact integer cents — no float accumulation) emits one row per
  * 1000.00 tier boundary it crosses, attributed to the event that
  * crossed it.
  *
  * State is O(1) per key (the cumulative cents), so 100 TB of events
  * hold |users| longs in the state store. Events are sorted
  * (ts, event_id) INSIDE the group — Spark guarantees no iterator
  * order — which bounds per-invocation memory by the per-key batch
  * volume, the same bound mapGroupsWithState already implies.
  *
  * Negative values (refunds) are first-class: cents use
  * half-away-from-zero tie rounding ([[toCents]] — the semantics of
  * DuckDB's round() and BigDecimal HALF_UP; `math.round` rounds ties
  * toward +∞ and diverges on negative values), tiers are FLOOR
  * divisions so the boundary grid is well-defined below zero, and
  * only POSITIVE tier boundaries (t ≥ 1) emit — a refund can drag the
  * cumulative down and a later re-crossing of the same boundary
  * re-emits, which is exactly "the event that crossed it".
  */
object ThresholdEmit {

  case class EventRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                      value: Double)
  case class Crossing(user_id: Long, event_id: Long, tier: Long)

  private val tierCents = 100000L // 1000.00 in cents

  /** Integer cents of a double with HALF-AWAY-FROM-ZERO tie rounding
    * on the binary double — matches DuckDB round(value*100) (the
    * oracle) for negative refunds where math.round(x) (ties toward
    * +∞) would be off by one cent. */
  private[streaming] def toCents(value: Double): Long = {
    val x = value * 100.0
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong
  }

  /** Pure per-group fold (spec-testable without a stream): crossings
    * emitted by `sorted` events starting from cumulative `start`
    * cents, plus the updated cumulative. A tier t ≥ 1 emits when the
    * cumulative crosses t*1000.00 from below; floorDiv keeps the grid
    * consistent when refunds push the cumulative negative. */
  private[streaming] def foldCrossings(uid: Long, sorted: Seq[EventRow],
                                       start: Long): (Long, Seq[Crossing]) = {
    var cum = start
    val out = Seq.newBuilder[Crossing]
    sorted.foreach { r =>
      val prevTier = Math.floorDiv(cum, tierCents)
      cum += toCents(r.value)
      (math.max(prevTier + 1, 1L) to Math.floorDiv(cum, tierCents)).foreach { t =>
        out += Crossing(uid, r.event_id, t)
      }
    }
    (cum, out.result())
  }

  /** Run tier-crossing emission over the events file stream to
    * completion (AvailableNow) and return every crossing. */
  def tierCrossings(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val sinkName = "graft_threshold_emit_" + System.nanoTime()
    val ckpt = "/tmp/graft_stream_ckpt/" + sinkName

    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir)
    val events = graft.sources.Tables.normalizeNtz(
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000"))) else raw)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
      .as[EventRow]

    val crossings = events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, Crossing](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[EventRow], state: GroupState[Long]) =>
          val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.event_id))
          val (cum, out) =
            foldCrossings(uid, sorted, state.getOption.getOrElse(0L))
          state.update(cum)
          out.iterator
      }

    // state = one cumulative-cents long per user (≤ events)
    StreamTune.withStatePartitions(spark,
      StreamTune.eventRows(spark, sfDir)) {
      val q = crossings.writeStream
        .format("memory").queryName(sinkName)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    StreamTune.dropScratch(ckpt)
    spark.table(sinkName)
  }
}
