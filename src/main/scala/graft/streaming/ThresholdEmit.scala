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
  */
object ThresholdEmit {

  case class EventRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                      value: Double)
  case class Crossing(user_id: Long, event_id: Long, tier: Long)

  private val tierCents = 100000L // 1000.00 in cents

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
    val events = (if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000"))) else raw)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
      .as[EventRow]

    val crossings = events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, Crossing](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[EventRow], state: GroupState[Long]) =>
          val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.event_id))
          var cum = state.getOption.getOrElse(0L)
          val out = Seq.newBuilder[Crossing]
          sorted.foreach { r =>
            val prevTier = cum / tierCents
            cum += math.round(r.value * 100)
            (prevTier + 1 to cum / tierCents).foreach { t =>
              out += Crossing(uid, r.event_id, t)
            }
          }
          state.update(cum)
          out.result().iterator
      }

    val q = crossings.writeStream
      .format("memory").queryName(sinkName)
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sinkName)
  }
}
