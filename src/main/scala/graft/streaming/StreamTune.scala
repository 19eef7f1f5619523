package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-partition sizing for stateful streaming queries.
  *
  * The number of state-store instances a stateful operator runs is
  * pinned to `spark.sql.shuffle.partitions` at FIRST checkpoint, and
  * every micro-batch pays one store open/commit per partition per
  * store (a stream-stream join keeps four stores per partition). That
  * cost is pure fixed overhead when a partition holds a few thousand
  * state rows: the bench's stream-stream outer join dropped 15.3 s →
  * 5.4 s just by sizing 32 → 8 partitions at sf0.1, with identical
  * results (BENCH_NOTES.md round 9). Inheriting the session-wide
  * shuffle default — sized for the BATCH shuffles of the biggest
  * join — is the wrong knob for state.
  *
  * Policy: ~[[targetRowsPerPartition]] state rows per partition,
  * floored at [[minPartitions]] (multi-partition state semantics stay
  * exercised even at toy scale), capped at the session's
  * `spark.sql.shuffle.partitions` (the cluster-sized knob: a 1000-
  * executor deployment that sets shuffle partitions in the thousands
  * gets thousands of state partitions the moment its state-row
  * estimate warrants them). Shuffle VOLUME does not need more reduce
  * tasks than this: windowed aggregates map-side combine to
  * tasks × groups before the exchange, and join/dedup state is
  * bounded by the watermark horizon — state rows, not raw input
  * rows, is the scaling variable.
  */
object StreamTune {

  /** ~50 MB of ~200-byte state rows — comfortable for the HDFS-backed
    * store, conservative for RocksDB. */
  val targetRowsPerPartition = 250000L

  /** Never fewer than 4: state merge/expiry must keep running against
    * multiple physical stores in every test context. */
  val minPartitions = 4

  def statePartitions(spark: SparkSession, estStateRows: Long): Int = {
    val cap = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val want = math.ceil(estStateRows.max(0L).toDouble /
      targetRowsPerPartition).toLong
    math.min(cap.toLong, math.max(minPartitions.toLong, want)).toInt
  }

  /** Run `body` (which must contain the stream's `.start()` — the
    * conf is captured there, and for foreachBatch sinks each batch
    * plans under it too, so `awaitTermination` belongs inside) with
    * shuffle partitions sized for `estStateRows`.
    *
    * CAVEAT (same scope as the RocksDB provider swap in
    * TransformWithStateOps): the conf is SESSION-global for the
    * window — safe because the harness runs queries sequentially;
    * concurrent-stream callers must isolate via `newSession()`. */
  def withStatePartitions[A](spark: SparkSession, estStateRows: Long)
                            (body: => A): A = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
      statePartitions(spark, estStateRows).toString)
    try body finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  // Row-count cache for the state estimates: one parquet count per
  // (path) per JVM — the bench re-invokes each query 3×, the count
  // job is metadata-cheap but not free.
  private val counts = scala.collection.mutable.Map[String, Long]()

  /** Rows in the events table at `sfDir` — the upper bound for every
    * event-derived state estimate (sessions ≤ events, buffered join
    * rows ≤ events within the horizon, dedup keys ≤ events). */
  def eventRows(spark: SparkSession, sfDir: String): Long = synchronized {
    counts.getOrElseUpdate(sfDir,
      graft.sources.Tables.load(spark, sfDir, "events").count())
  }

  /** Best-effort post-termination cleanup of a finished stream's
    * nonce-scoped scratch dirs (checkpoints, source fixtures — NEVER
    * the output a returned DataFrame still reads). Every harness
    * invocation creates fresh nonce dirs, so without this the bench's
    * 3 reps × ~15 streaming queries leak hundreds of MB of dead
    * checkpoints per run. Guarded to the engine's own /tmp namespaces
    * so a bad path can't delete anything else. */
  def dropScratch(paths: String*): Unit = paths.foreach { p =>
    if (p.startsWith("/tmp/graft_")) {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      try rm(new java.io.File(p))
      catch { case _: Exception => () } // scratch cleanup is advisory
    }
  }
}
