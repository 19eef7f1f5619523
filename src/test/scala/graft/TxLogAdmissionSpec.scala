package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TxLog
import graft.sources.{TxLogMicroBatchStream, TxLogOffset, TxLogScan}

/** File-granular admission control for the DSv2 log stream source
  * (`maxFilesPerTrigger`, Delta's (reservoirVersion, index) offsets):
  * the control that matters at 100 TB, where "version 1" IS the whole
  * table — a stream starting from scratch must backfill the initial
  * snapshot in bounded micro-batches, not ingest it whole. */
class TxLogAdmissionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import org.apache.spark.sql.connector.read.streaming.ReadLimit

  private def seed(base: String, nFiles: Int, n: Int, tag: String,
                   offset: Int = 0): Unit = {
    import spark.implicits._
    val df = (offset until offset + n)
      .map(i => (i, s"$tag-$i")).toDF("k", "s").repartition(nFiles)
    if (TxLog.latestVersion(spark, base).isEmpty)
      TxLog.commit(df, base, None)
    else TxLog.append(df, base)
  }

  private def mbs(base: String, maxFiles: Option[Long]): TxLogMicroBatchStream =
    new TxLogMicroBatchStream(
      new TxLogScan(TxLog.read(spark, base).schema, base,
        changeFeed = false, maxVersionsPerTrigger = None,
        startingVersion = 0L, maxFilesPerTrigger = maxFiles),
      base, maxVersionsPerTrigger = None, startingVersion = 0L,
      maxFilesPerTrigger = maxFiles)

  test("offset serialization: complete offsets keep the legacy form " +
    "(existing checkpoints resume), partial ones carry the index " +
    "with the raw-semantics stamp; UNstamped partials (pre-r12 " +
    "survivor indexing) are refused loudly") {
    val base = "/tmp/graft_txadm/ser"
    TxLog.drop(spark, base)
    seed(base, 2, 10, "a")
    val s = mbs(base, Some(1L))
    assert(new TxLogOffset(3L).json() == """{"version":3}""")
    assert(new TxLogOffset(3L, 2L).json() ==
      """{"version":3,"index":2,"raw":true}""")
    assert(s.deserializeOffset("""{"version":3}""") == new TxLogOffset(3L))
    assert(s.deserializeOffset("""{"version":3,"index":2,"raw":true}""") ==
      new TxLogOffset(3L, 2L))
    // a pre-r12 partial offset counted stats-SURVIVING files: replay
    // under raw indexing could skip or re-deliver — refuse, loudly
    val e = intercept[IllegalStateException] {
      s.deserializeOffset("""{"version":3,"index":2}""")
    }
    assert(e.getMessage.contains("earlier build"), e.getMessage)
  }

  test("the budget walk chunks within and across versions, resumes " +
    "from a partial position, and always makes progress") {
    val base = "/tmp/graft_txadm/walk"
    TxLog.drop(spark, base)
    seed(base, 3, 30, "v1")            // version 1: 3 files
    seed(base, 3, 30, "v2", 30)        // version 2: 3 files
    val s = mbs(base, Some(4L))
    // fresh start, budget 4: finishes v1 (3 files) + 1 file into v2
    val o1 = s.latestOffset(new TxLogOffset(0L), ReadLimit.maxFiles(4))
      .asInstanceOf[TxLogOffset]
    assert(o1.version == 2L && o1.index == 1L, s"${o1.json()}")
    // the planned slice for (0 -> partial) is exactly those 4 files
    assert(s.planInputPartitions(new TxLogOffset(0L), o1).length == 4)
    // resume from the partial position: the remaining 2 files of v2
    val o2 = s.latestOffset(o1, ReadLimit.maxFiles(4))
      .asInstanceOf[TxLogOffset]
    assert(o2.version == 2L && o2.index == -1L, s"${o2.json()}")
    assert(s.planInputPartitions(o1, o2).length == 2)
    // drained: no movement, so Spark schedules no batch
    assert(s.latestOffset(o2, ReadLimit.maxFiles(4)) == o2)
    // unlimited from a partial position flushes the remainder
    assert(s.latestOffset(o1, ReadLimit.allAvailable()) ==
      new TxLogOffset(2L))
    // the two slices partition the stream: no file lost, none twice
    val all = s.planInputPartitions(new TxLogOffset(0L), new TxLogOffset(2L))
    assert(all.length == 6)
  }

  test("end-to-end: a 6-file initial snapshot drains under " +
    "maxFilesPerTrigger=2 in 3 checkpointed micro-batches, rows " +
    "exactly once; a restart picks up only new versions") {
    val base = "/tmp/graft_txadm/e2e"
    val out = "/tmp/graft_txadm/e2e_out"
    val ckpt = "/tmp/graft_txadm/e2e_ckpt"
    Seq(base, out, ckpt).foreach(TxLog.drop(spark, _))
    seed(base, 6, 120, "snap")
    def run(): Unit = {
      val q = spark.readStream.format("graft.sources.TxLogSource")
        .option("maxFilesPerTrigger", 2)
        .load(base)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run()
    val got = spark.read.parquet(out)
    assert(got.count() == 120 &&
      got.select("k").distinct().count() == 120)
    val offsets = new java.io.File(s"$ckpt/offsets").listFiles()
      .filterNot(_.getName.startsWith(".")).map(_.getName).sorted
    assert(offsets.length == 3, s"3 bounded batches: ${offsets.toSeq}")
    // restart with one more 2-file version: exactly one more batch
    seed(base, 2, 20, "inc", 120)
    run()
    assert(spark.read.parquet(out).count() == 140)
    assert(new java.io.File(s"$ckpt/offsets").listFiles()
      .filterNot(_.getName.startsWith(".")).length == 4)
  }

  test("guards: maxFilesPerTrigger is streaming-only, exclusive with " +
    "maxVersionsPerTrigger, and version-atomic CDF rejects it") {
    val base = "/tmp/graft_txadm/guard"
    TxLog.drop(spark, base)
    seed(base, 1, 5, "g")
    val batch = intercept[Exception] {
      spark.read.format("graft.sources.TxLogSource")
        .option("maxFilesPerTrigger", 2).load(base).collect()
    }
    assert(batch.getMessage.contains("streaming-only"))
    // scan-build vetoes surface on the stream thread; read the error
    // through BOTH channels (awaitTermination's rethrow races the
    // error registration on a plan-time failure)
    def streamError(opts: Map[String, String]): String = {
      val q = opts.foldLeft(
          spark.readStream.format("graft.sources.TxLogSource")) {
          case (r, (k, v)) => r.option(k, v)
        }.load(base)
        .writeStream.format("noop")
        .trigger(Trigger.AvailableNow()).start()
      val viaAwait =
        try { q.awaitTermination(); None }
        catch { case e: Throwable => Some(e.getMessage) }
      viaAwait.orElse(q.exception.map(_.getMessage))
        .getOrElse("stream succeeded")
    }
    assert(streamError(Map("maxFilesPerTrigger" -> "2",
      "maxVersionsPerTrigger" -> "1")).contains("not both"))
    assert(streamError(Map("maxFilesPerTrigger" -> "2",
      "changeFeedTypes" -> "true")).contains("version"))
  }

  test("the offset index is predicate-independent: a scan with pushed " +
    "filters walks the same offsets as an unfiltered one (a Spark " +
    "upgrade changing pushdown must never re-interpret an in-flight " +
    "checkpoint), and stats pruning still applies after slicing") {
    import org.apache.spark.sql.sources.{Filter, GreaterThan}
    val base = "/tmp/graft_txadm/predfree"
    TxLog.drop(spark, base)
    import spark.implicits._
    // range-split files so per-file k stats are disjoint and a pushed
    // range filter genuinely prunes some of them
    def ranged(offset: Int): org.apache.spark.sql.DataFrame =
      (offset until offset + 30).map(i => (i, s"s$i")).toDF("k", "s")
        .repartitionByRange(3, col("k"))
    TxLog.commit(ranged(0), base, None, statsCol = Some("k"))
    TxLog.append(ranged(30), base, statsCol = Some("k"))
    val schema = TxLog.read(spark, base).schema
    def stream(filters: Array[Filter]) = new TxLogMicroBatchStream(
      new TxLogScan(schema, base, changeFeed = false,
        maxVersionsPerTrigger = None, startingVersion = 0L,
        pushed = filters, maxFilesPerTrigger = Some(2L)),
      base, maxVersionsPerTrigger = None, startingVersion = 0L,
      maxFilesPerTrigger = Some(2L))
    val plain = stream(Array.empty)
    val filtered = stream(Array(GreaterThan("k", 39)))
    // identical offset walks: the index counts RAW manifest files
    var oPlain: TxLogOffset = new TxLogOffset(0L)
    var oFilt: TxLogOffset = new TxLogOffset(0L)
    for (_ <- 1 to 4) {
      oPlain = plain.latestOffset(oPlain, ReadLimit.maxFiles(2))
        .asInstanceOf[TxLogOffset]
      oFilt = filtered.latestOffset(oFilt, ReadLimit.maxFiles(2))
        .asInstanceOf[TxLogOffset]
      assert(oPlain == oFilt, s"${oPlain.json()} vs ${oFilt.json()}")
    }
    assert(oPlain == new TxLogOffset(2L)) // both drained all 6 files
    // pruning still bites AFTER slicing: the filtered stream ships
    // fewer partitions over the same offset range, and never a file
    // whose stats disprove k > 39
    val full = filtered.planInputPartitions(
      new TxLogOffset(0L), new TxLogOffset(2L))
    assert(full.length < 6 && full.nonEmpty)
    val rows = 60 - 40 // k in 40..59 survive
    val gotRows = spark.readStream.format("graft.sources.TxLogSource")
      .load(base).where(col("k") > 39)
    val ckpt = s"$base/_ck_${System.nanoTime()}"
    val q = gotRows.writeStream.format("memory").queryName("predfree")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("predfree").count() == rows)
  }

  test("an admission budget above Int.MaxValue clamps instead of " +
    "overflowing to a negative budget that admits nothing") {
    val base = "/tmp/graft_txadm/clamp"
    TxLog.drop(spark, base)
    seed(base, 2, 10, "c")
    val s = mbs(base, Some(Long.MaxValue))
    val lim = s.getDefaultReadLimit
    val mf = lim.asInstanceOf[
      org.apache.spark.sql.connector.read.streaming.ReadMaxFiles]
    assert(mf.maxFiles() == Int.MaxValue)
    // and the walk under the clamped budget admits the whole backlog
    val o = s.latestOffset(new TxLogOffset(0L), lim)
      .asInstanceOf[TxLogOffset]
    assert(o == new TxLogOffset(1L), o.json())
  }
}
