package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, Trigger}

/** Stateful streaming latest-record dedup — the Structured-Streaming
  * expression of the reference's W1 idiom (`row_number()=1` per key)
  * using `mapGroupsWithState` (builder-brief: custom state via
  * KeyValueGroupedDataset). Each key's state is O(1): the current
  * winning record under (ts, event_id) ordering — the streaming twin
  * of [[graft.operators.Dedup.latestByKeySkewSafe]]'s per-key max.
  */
object StatefulDedup {

  case class EventRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                      event_type: String, value: Double)

  /** Run latest-per-user dedup over the events file stream to
    * completion (AvailableNow) and return the final per-key winners. */
  def latestPerUser(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    // Nonce keeps repeated invocations in one session from colliding.
    val sinkName = "graft_stateful_dedup_" + System.nanoTime()
    val ckpt = "/tmp/graft_stream_ckpt/" + sinkName

    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir)
    val events = graft.sources.Tables.normalizeNtz(
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000"))) else raw)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventRow]

    val deduped = events.groupByKey(_.user_id)
      .mapGroupsWithState[EventRow, EventRow](GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[EventRow], state: GroupState[EventRow]) =>
          val newest = rows.reduce { (a, b) =>
            val c = a.ts.compareTo(b.ts)
            if (c > 0 || (c == 0 && a.event_id > b.event_id)) a else b
          }
          val winner = state.getOption match {
            case Some(prev) =>
              val c = prev.ts.compareTo(newest.ts)
              if (c > 0 || (c == 0 && prev.event_id > newest.event_id)) prev else newest
            case None => newest
          }
          state.update(winner)
          winner
      }

    // state = one winner row per user (≤ events): size state
    // partitions to that, not the session's batch shuffle default
    StreamTune.withStatePartitions(spark,
      StreamTune.eventRows(spark, sfDir)) {
      val q = deduped.writeStream
        .format("memory").queryName(sinkName)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    StreamTune.dropScratch(ckpt)
    // With update mode a key may emit once per micro-batch; keep the
    // final (latest) emission per key — same W1 semantics, batch-side.
    graft.operators.Dedup.latestByKey(
      spark.table(sinkName), Seq("user_id"),
      Seq(col("ts").desc, col("event_id").desc))
  }
}
