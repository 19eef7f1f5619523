package graft

import org.apache.hadoop.fs.Path
import graft.operators.{TxLog, TxLogPlan}

/** Columnar-checkpoint scale probe (the r13 "Missing #1" done-gate):
  * a 1,000,000-entry table — fabricated at the manifest layer; the
  * planning verbs never open data files — must support
  *
  *   1. snapshot resolution as a DataFrame (no driver entry list),
  *      with cost INDEPENDENT of how many versions the log holds
  *      (one checkpoint scan + O(changed) delta lines);
  *   2. a skipping scan that collects ONLY the survivors of the
  *      range prune (the kept working set, not the table);
  *   3. VACUUM LITE planning whose reclaim set flows straight from
  *      the anti-join into the executor delete fan-out — the driver
  *      holds counters, never the dead list.
  *
  * Prints one summary line per measurement; exits nonzero on any
  * violated bound. */
object TxCkptProbeMain {
  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val base = "/tmp/graft_ckpt_probe/t"
    TxLog.drop(spark, base)
    val f = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(new Path(s"$base/_log"))

    def writeLog(name: String, lines: Seq[String]): Unit = {
      val out = f.create(new Path(s"$base/_log/$name"), true)
      try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
    }

    val N = 1000000L
    // v1: the checkpoint IS the snapshot (fabricated 10^6-entry
    // history; the manifest file is the required placeholder commit)
    writeLog("v00000000000000000001.txt",
      Seq("#delta", "#op\tWRITE", "#protocol\t1\t1"))
    val (_, tCkpt) = timed {
      val lines = spark.range(N).selectExpr(
        "concat('data/synth/p', lpad(cast(id as string), 7, '0'), " +
          "'\\t100\\tlong\\tk\\t', cast(id * 100 as string), '\\t', " +
          "cast(id * 100 + 99 as string)) as line")
      TxLogPlan.writeCheckpointParquetDF(spark, base, 1L,
        Seq("#op\tCKPT", "#protocol\t1\t1"), lines)
    }
    println(f"CKPT_WRITE_1M_SEC=$tCkpt%.2f")

    // v2..v31: 30 delta commits — 5 adds + 2 removes each, plus 60
    // touchable files so the reclaim fan-out has real deletes to count
    (2 to 31).foreach { v =>
      val j = v - 2
      val removes = Seq(2 * j, 2 * j + 1).map(i =>
        f"-\tdata/synth/p$i%07d")
      Seq(2 * j, 2 * j + 1).foreach { i =>
        f.mkdirs(new Path(s"$base/data/synth"))
        f.create(new Path(f"$base/data/synth/p$i%07d"), true).close()
      }
      val adds = (0 until 5).map(s =>
        s"+\tdata/rt/q${v}_$s\t100\tlong\tk\t${200000000L + v * 1000 + s * 100}" +
          s"\t${200000000L + v * 1000 + s * 100 + 99}")
      writeLog(f"v$v%020d.txt",
        Seq("#delta", "#op\tWRITE", s"#ict\t${1000 + v}",
          "#protocol\t1\t1") ++ removes ++ adds)
    }

    val expect = N + 30L * 5 - 30L * 2
    // 1) resolution cost is version-independent: v5 (3 deltas) vs
    //    v31 (30 deltas) — both one checkpoint scan + tiny local deltas
    val (c5, t5) = timed(TxLogPlan.snapshotDF(spark, base, 5L).count())
    val (c31, t31) = timed(TxLogPlan.snapshotDF(spark, base, 31L).count())
    println(f"RESOLVE_V5_SEC=$t5%.2f ROWS=$c5")
    println(f"RESOLVE_V31_SEC=$t31%.2f ROWS=$c31")
    require(c31 == expect, s"snapshot v31: got $c31, want $expect")
    require(c5 == N + 4 * 5 - 4 * 2, s"snapshot v5: got $c5") // deltas v2..v5
    require(t31 < 60 && t31 < t5 * 5 + 5,
      f"resolution must not scale with version count: $t5%.2f -> $t31%.2f")

    // 2) skipping scan: k in [50_000_000, 50_000_999] hits ~10 of the
    //    10^6 files; only the survivors reach the driver
    val (surv, tScan) = timed(TxLogPlan.pruneEntriesForScan(spark, base,
      31L, Seq(("k", "50000000", "50000999"))).get)
    println(f"SKIP_SCAN_SEC=$tScan%.2f SURVIVORS=${surv.size}")
    require(surv.nonEmpty && surv.size <= 12,
      s"narrow range must keep ~10 files of 10^6, got ${surv.size}")

    // 2b) typed-stats native prune I/O: the same narrow band filtered
    //     through the checkpoint's NATIVE min/max columns. The
    //     comparisons push into the parquet scan, so row-group/page
    //     stats skip checkpoint bytes — the scan node must EMIT under
    //     10% of the 10^6 entries (the line-UDF path necessarily
    //     deserializes all of them).
    {
      import org.apache.spark.sql.functions.{col, lit}
      val mn = TxLogPlan.sminName("k"); val mx = TxLogPlan.smaxName("k")
      val fullCkpt = TxLogPlan.readCheckpointDFFull(spark, base, 1L)
      require(fullCkpt.columns.contains(mn),
        s"typed stats columns missing: ${fullCkpt.columns.mkString(",")}")
      val nativeDF = fullCkpt.where(col(mn).isNull ||
        (col(mx) >= lit(50000000L) && col(mn) <= lit(50000999L)))
      val qe = nativeDF.queryExecution
      val (kept, tNat) = timed(qe.executedPlan.executeCollect().length)
      val scanRows = qe.executedPlan.collectLeaves()
        .flatMap(_.metrics.get("numOutputRows")).map(_.value).sum
      println(f"TYPED_PRUNE_SEC=$tNat%.2f KEPT=$kept SCAN_ROWS=$scanRows")
      require(kept >= 10 && kept <= 12,
        s"native prune must keep the band's ~10 files, got $kept")
      require(scanRows > 0 && scanRows < N / 10,
        s"pushed typed filters must skip checkpoint I/O: the scan " +
          s"emitted $scanRows of $N entries (>=10%)")
    }

    // 3) VACUUM LITE: drop v1..v26 — dead = the 52 paths removed by
    //    deltas v2..v27 (the 8 later removals stay referenced by the
    //    kept head v27); the fan-out counts real deletes
    val ((kept, reclaimed), tVac) = timed(
      TxLog.vacuumLite(spark, base, keepLast = 5))
    println(f"VACUUM_LITE_SEC=$tVac%.2f RECLAIMED=$reclaimed KEPT=${kept.size}")
    require(kept == Seq(27L, 28L, 29L, 30L, 31L), s"kept $kept")
    require(reclaimed == 52, s"reclaim exactly the dropped-only 52 " +
      s"files, got $reclaimed")

    // post-vacuum: the kept head re-based on a columnar checkpoint and
    // the table still resolves completely
    require(f.exists(TxLogPlan.pqDirPath(base, 27L)), "columnar re-base")
    val (cAfter, tAfter) = timed(
      TxLogPlan.snapshotDF(spark, base, 31L).count())
    println(f"RESOLVE_POST_VACUUM_SEC=$tAfter%.2f ROWS=$cAfter")
    require(cAfter == expect,
      s"post-vacuum snapshot: got $cAfter, want $expect (vacuum " +
        "reclaims BYTES, never entries of surviving versions)")

    // 4) add-only commit cost is O(new files), never O(table): a real
    //    append to the 10^6-entry table publishes its delta without
    //    resolving the previous snapshot on the driver
    val (vApp, tApp) = timed(TxLog.append(
      spark.range(5).selectExpr("id as k", "cast(id as string) as s"),
      base, Some("k")))
    println(f"APPEND_1M_SEC=$tApp%.2f V=$vApp")
    require(tApp < 30, f"append must stay O(new) at 10^6 entries: $tApp%.2f s")
    val (cFinal, _) = timed(TxLogPlan.snapshotDF(spark, base, vApp).count())
    require(cFinal > expect, s"the append's files joined the snapshot: $cFinal")

    // 5) OPTIMIZE planning at 10^6 entries: candidate selection runs
    //    executor-side and collects ONLY the candidates (none here —
    //    every synthetic file is above the threshold)
    val (smallSel, tSel) = timed(graft.operators.TxLogPlan
      .smallEntriesForCompact(spark, base, vApp, 50L, None))
    println(f"COMPACT_SELECT_SEC=$tSel%.2f CANDIDATES=${smallSel.map(_.size)}")
    require(smallSel.exists(_.size <= 5),
      "the bin-packer's working set is the candidates, not the table")

    // 6) RESTORE at 10^6 entries: the two snapshots diff as
    //    DataFrames; only the churn since the target version is
    //    collected, and the published manifest declares exactly it
    val (vRest, tRest) = timed(TxLog.restore(spark, base, 28L))
    println(f"RESTORE_1M_SEC=$tRest%.2f V=$vRest")
    require(tRest < 30, f"restore must collect churn, not the table: $tRest%.2f")
    val (cRest, _) = timed(TxLogPlan.snapshotDF(spark, base, vRest).count())
    val expect28 = N + 27L * 5 - 27L * 2 // deltas v2..v28
    require(cRest == expect28, s"restored snapshot: $cRest vs $expect28")

    // 7) metadata COUNT(*) at 10^6 entries: the pushed aggregate runs
    //    as one DataFrame aggregate over the checkpoint — no entry
    //    list, no data file opened
    TxLog.cachePurge(base)
    // explicit schema: inference would open footers, and the pushed
    // count must prove it opens NONE (the synthetic files don't exist)
    val (cnt, tCnt) = timed(spark.read
      .format("graft.sources.TxLogSource")
      .schema("k LONG, s STRING").load(base).count())
    println(f"COUNT_STAR_1M_SEC=$tCnt%.2f N=$cnt")
    require(cnt == expect28 * 100L,
      s"metadata count: $cnt vs ${expect28 * 100L}")
    require(tCnt < 30, f"COUNT(*) must stay metadata-only: $tCnt%.2f s")

    // 8) STREAMING planning at 10^6 entries: a micro-batch's added
    //    set derives from the delta commit's own `+` lines — O(batch
    //    files) driver-side — with one DISTRIBUTED point lookup for
    //    replace detection. The pin: after planning, the previous
    //    snapshot was never resolved onto the driver (the snapshot
    //    cache stays cold), which is exactly what the legacy two-
    //    full-resolutions diff could not avoid.
    val (vStr, _) = timed(TxLog.append(
      spark.range(7).coalesce(1)
        .selectExpr("id + 1000000000 as k", "cast(id as string) as s"),
      base, Some("k")))
    TxLog.cachePurge(base)
    val (addedStr, tAdd) = timed(
      graft.sources.TxLogSource.addedEntries(spark, base, vStr))
    println(f"STREAM_PLAN_ADD_SEC=$tAdd%.2f ADDED=${addedStr.size}")
    require(addedStr.size == 1, s"one coalesced file, got ${addedStr.size}")
    require(TxLog.cachedSnapshot(spark, base, vStr - 1).isEmpty,
      "streaming planning must not resolve the previous snapshot " +
        "driver-side (the cache would be warm if it had)")
    require(tAdd < 15, f"per-batch planning stalled: $tAdd%.2f s")

    // a MOR delete re-references the SAME path with a DV — a replace,
    // not an add: the fast path must exclude it via the point lookup,
    // still without a driver-side snapshot resolution
    val (vMor, _) = timed(TxLog.deleteRangeMor(spark, base, "k",
      1000000000L, 1000000002L))
    TxLog.cachePurge(base)
    val (addedMor, tMor) = timed(
      graft.sources.TxLogSource.addedEntries(spark, base, vMor))
    println(f"STREAM_PLAN_MOR_SEC=$tMor%.2f ADDED=${addedMor.size}")
    require(addedMor.isEmpty,
      s"a DV re-reference is not an added file, got ${addedMor.size}")
    require(TxLog.cachedSnapshot(spark, base, vMor - 1).isEmpty,
      "the replace lookup must stay distributed")

    // end-to-end: a real micro-batch stream positioned just before
    // the append delivers exactly its 7 rows (the MOR version adds no
    // files), planning every batch through the bounded path above
    val outDir = "/tmp/graft_ckpt_probe/stream_out"
    val ckDir = "/tmp/graft_ckpt_probe/stream_ck"
    f.delete(new Path(outDir), true); f.delete(new Path(ckDir), true)
    val (_, tStream) = timed {
      val q = spark.readStream.format("graft.sources.TxLogSource")
        .schema("k LONG, s STRING")
        .option("startingVersion", vStr - 1)
        .load(base)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000L)
      q.stop()
    }
    val streamed = spark.read.schema("k LONG, s STRING").parquet(outDir)
    val got = streamed.count()
    println(f"STREAM_E2E_SEC=$tStream%.2f ROWS=$got")
    require(got == 7L, s"the stream must deliver the append's 7 rows, got $got")

    println("CKPT_PROBE_OK")
    spark.stop()
  }
}
