package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Layout, TextAnalysis, TxLog, Upsert, Versioned}
import graft.sources.{Ingest, Tables}

/** Structured-streaming witnesses over the transaction-log source,
  * split out of RegistryMaint by feature family (r13 hygiene item):
  * the exactly-once sink, CDF/backfill/medallion streams, row-id-keyed
  * replica and lineage reconstruction. */
object RegistryMaintStream {
  private type Q = (SparkSession, String) => DataFrame
  import RegistryMaint.{t, morLo, morHi}

  val defs: Map[String, Q] = Map(
    // Row-id lineage END-TO-END (the payoff of row tracking + the
    // DSv2 rowIds STREAM): a replica keyed ONLY by the stable
    // `_row_id` consumes the snapshot stream — the MOR update's
    // post-image arrives in a later batch under the SAME id its
    // target row was born with (inherited + materialized at update
    // time), so an id-keyed latest-wins merge reconstructs the
    // source without ever seeing a delete. The helper requires
    // replica ≡ source bit-for-bit and unique ids; the oracle
    // recomputes the final state from orders.
    "stream_txlog_lineage" -> ((s, dir) =>
      graft.streaming.StreamingOps.rowIdLineagePipeline(s, dir)
        .groupBy("v")
        .agg(count(lit(1)).as("n"), sum(col("k")).cast("long").as("sum_k"))
        .orderBy("v")),

    // The native streaming SINK (DSv2 StreamingWrite — no foreachBatch
    // anywhere): the bronze log streams version-per-batch through the
    // source and lands in the silver log one VERSION PER EPOCH with
    // the (queryId → epoch) high-water carried in the manifest — the
    // replay-safe exactly-once contract, now entirely inside the
    // format. The oracle is the full events aggregate.
    "stream_txlog_sink" -> ((s, dir) => {
      val bronze = Ingest.fixtureDir(dir) + "/txsink_bronze"
      val silver = Ingest.fixtureDir(dir) + "/txsink_silver"
      TxLog.drop(s, bronze); TxLog.drop(s, silver)
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      TxLog.commit(
        ev.where(col("event_id") >= 500)
          .repartitionByRange(4, col("event_id")),
        bronze, None, Some("event_id"))
      TxLog.append(ev.where(col("event_id") < 500), bronze, Some("event_id"))
      val nonce = "graft_txsink_" + System.nanoTime()
      val q = s.readStream.format("graft.sources.TxLogSource")
        .option("maxVersionsPerTrigger", "1")
        .load(bronze)
        .writeStream.format("graft.sources.TxLogSource")
        .option("path", silver)
        .option("statsColumns", "event_id")
        .option("checkpointLocation", "/tmp/graft_stream_ckpt/" + nonce)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.streaming.StreamTune.dropScratch("/tmp/graft_stream_ckpt/" + nonce)
      require(TxLog.latestVersion(s, silver).contains(2L),
        "two bronze versions must land as exactly two silver epochs")
      TxLog.read(s, silver)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("event_type")
    }),

    // CDC replication end-to-end (the DLT APPLY CHANGES INTO loop): a
    // replica log consumes the source's row-precise typed change feed
    // and applies every micro-batch with TxLog.applyChanges — deletes
    // MASK matched keys (merge-on-read), inserts append, and the
    // batch high-water rides the same commit, exactly-once on both
    // halves across a restart with new source commits in between. The
    // helper requires replica ≡ source bit-for-bit, 4 versions, and
    // the checkpoint-global high-water. Oracle: the source's final
    // state recomputed from events.
    "stream_txlog_replica" -> ((s, dir) =>
      graft.streaming.StreamingOps.cdcReplicaPipeline(s, dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("event_type")),

    // Row-precise CDF streaming (Delta readChangeFeed with deletion
    // vectors): the stream tags every row _commit_version AND
    // _change_type, and a MOR delete — invisible to the plain insert
    // feed, which diffs file sets — ships exactly its masked rows as
    // 'delete' markers to the downstream consumer. The fixture is
    // commit → MOR-delete(band clicks) → append; the readback
    // aggregates the feed per (version, change_type). The oracle
    // recomputes all four slices from events.
    "stream_txlog_cdf" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txcdf_events"
      TxLog.drop(s, base)
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      TxLog.commit(
        ev.where(col("event_id") >= 200)
          .repartitionByRange(4, col("event_id")),
        base, None, Some("event_id"))
      TxLog.deleteRangeMor(s, base, "event_id", morLo, morHi,
        residual = col("event_type") === "click")
      TxLog.append(ev.where(col("event_id") < 100), base, Some("event_id"))
      val outDir = Ingest.fixtureDir(dir) + "/txcdf_out"
      TxLog.drop(s, outDir)
      val nonce = "graft_txlog_cdf_" + System.nanoTime()
      val ckpt = "/tmp/graft_stream_ckpt/" + nonce
      val q = s.readStream.format("graft.sources.TxLogSource")
        .option("changeFeedTypes", "true")
        .option("maxVersionsPerTrigger", "1")
        .load(base)
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.streaming.StreamTune.dropScratch(ckpt)
      s.read.parquet(outDir)
        .groupBy(col("_commit_version").cast("int").as("commit_version"),
          col("_change_type").as("change_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("commit_version", "change_type")
    }),

    // Streaming FROM the manifest log (the Delta streaming-source
    // analog, via the custom DSv2 TxLogSource): each committed version
    // is one micro-batch (offset = version, checkpoint-resumable), a
    // batch's rows are the files that version ADDED (manifest diff —
    // never a table rescan), and changeFeed tags rows with their
    // commit version. The seed + two appends drain under AvailableNow
    // in version-sized batches into a parquet sink; the oracle
    // recomputes each version's aggregate from its id slice.
    // Bounded initial-snapshot backfill (Delta maxFilesPerTrigger with
    // (reservoirVersion, index) offsets): at 100 TB "version 1" IS the
    // table, so a stream starting from scratch must chunk the snapshot
    // across micro-batches — the offsets carry an intra-version file
    // index. The require pins that the drain actually took multiple
    // bounded batches; the oracle checks no row was lost or doubled.
    "stream_txlog_backfill" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txbackfill_events"
      TxLog.drop(s, base)
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      TxLog.commit(ev.repartitionByRange(8, col("event_id")), base, None,
        Some("event_id"))
      val outDir = Ingest.fixtureDir(dir) + "/txbackfill_out"
      TxLog.drop(s, outDir)
      val nonce = "graft_txlog_backfill_" + System.nanoTime()
      val ckpt = "/tmp/graft_stream_ckpt/" + nonce
      val q = s.readStream.format("graft.sources.TxLogSource")
        .option("maxFilesPerTrigger", "3")
        .load(base)
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val batches = new java.io.File(s"$ckpt/offsets").listFiles()
        .count(!_.getName.startsWith("."))
      require(batches == 3,
        s"8 files at 3/trigger must drain in 3 bounded batches, got $batches")
      graft.streaming.StreamTune.dropScratch(ckpt)
      s.read.parquet(outDir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("event_id")).as("n_ids"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("event_type")
    }),

    "stream_txlog_source" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txstream_events"
      TxLog.drop(s, base)
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      TxLog.commit(
        ev.where(col("event_id") >= 200)
          .repartitionByRange(4, col("event_id")),
        base, None, Some("event_id"))
      TxLog.append(ev.where(col("event_id") < 100), base, Some("event_id"))
      TxLog.append(ev.where(col("event_id").between(100, 199)),
        base, Some("event_id"))
      // fixed output dir, dropped up front (repeated invocations must
      // not accumulate fixture copies under /tmp); the CHECKPOINT is
      // nonce-fresh so each invocation re-streams from version 0
      val outDir = Ingest.fixtureDir(dir) + "/txstream_out"
      TxLog.drop(s, outDir)
      val nonce = "graft_txlog_stream_" + System.nanoTime()
      val ckpt = "/tmp/graft_stream_ckpt/" + nonce
      val q = s.readStream.format("graft.sources.TxLogSource")
        .option("changeFeed", "true")
        .option("maxVersionsPerTrigger", "1")
        .load(base)
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.streaming.StreamTune.dropScratch(ckpt)
      s.read.parquet(outDir)
        .groupBy(col("_commit_version").cast("int").as("commit_version"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("commit_version")
    }),

    // The full medallion hop as a log-to-log stream (the reference's
    // Delta→Delta bronze→silver cadence): TxLogSource consumes the
    // bronze log version-per-batch, the transform drops error events,
    // and appendOnce lands the silver log exactly-once per micro-batch
    // — including across a restart with new bronze commits in between
    // (the helper pins 3 bronze versions → exactly 3 silver versions
    // and the checkpoint-global batch high-water). The oracle is the
    // cleaned events aggregate.
    "stream_txlog_medallion" -> ((s, dir) =>
      graft.streaming.StreamingOps.logToLogPipeline(s, dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("event_type")))

  val oracles: Map[String, String] = Map(
    "stream_txlog_lineage" ->
      """WITH t AS (SELECT cast(o_orderkey AS BIGINT) AS k,
                           cast(o_orderkey % 50 AS INTEGER) +
                             CASE WHEN o_orderkey BETWEEN 200 AND 400
                                  THEN 1000 ELSE 0 END AS v
                    FROM orders WHERE o_orderkey < 1800)
         SELECT v, count(*) AS n, cast(sum(k) AS BIGINT) AS sum_k
         FROM t GROUP BY 1 ORDER BY 1""",
    "stream_txlog_sink" ->
      """SELECT event_type, count(*) AS n,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events GROUP BY event_type ORDER BY event_type""",
    "stream_txlog_replica" ->
      s"""SELECT event_type, count(*) AS n,
                cast(sum(cast(
                  CASE WHEN event_id BETWEEN 650 AND 800
                            AND event_type = 'purchase'
                            AND event_id >= 200
                       THEN value * 2 ELSE value END
                  AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events
         WHERE (event_id >= 200
                AND NOT (event_id BETWEEN 200 AND 449
                         AND event_type = 'click')
                AND NOT (event_id BETWEEN 300 AND 600
                         AND event_type = 'view'))
            OR event_id < 100
         GROUP BY event_type ORDER BY event_type""",
    "stream_txlog_cdf" ->
      s"""SELECT cast(1 AS INTEGER) AS commit_version,
                'insert' AS change_type, count(*) AS n,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events WHERE event_id >= 200
         UNION ALL
         SELECT cast(2 AS INTEGER), 'delete', count(*),
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE)
         FROM events WHERE event_id BETWEEN $morLo AND $morHi
           AND event_type = 'click'
         UNION ALL
         SELECT cast(3 AS INTEGER), 'insert', count(*),
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE)
         FROM events WHERE event_id < 100
         ORDER BY commit_version, change_type""",
    "stream_txlog_backfill" ->
      """SELECT event_type, count(*) AS n,
                count(DISTINCT event_id) AS n_ids,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events
         GROUP BY event_type ORDER BY event_type""",
    "stream_txlog_source" ->
      """SELECT cast(1 AS INTEGER) AS commit_version, count(*) AS n,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events WHERE event_id >= 200
         UNION ALL
         SELECT cast(2 AS INTEGER), count(*),
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE)
         FROM events WHERE event_id < 100
         UNION ALL
         SELECT cast(3 AS INTEGER), count(*),
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE)
         FROM events WHERE event_id BETWEEN 100 AND 199
         ORDER BY commit_version""",
    "stream_txlog_medallion" ->
      """SELECT event_type, count(*) AS n,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events WHERE event_type <> 'error'
         GROUP BY event_type ORDER BY event_type""")
}
