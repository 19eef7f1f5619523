package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Ivf, Skew}
import graft.sources.Tables

class IvfSkewSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  test("salted aggregation equals plain groupBy exactly") {
    val ev = Tables.load(spark, sfDir, "events")
    val salted = Skew.saltedCountSum(ev, Seq("event_type"), "value",
      saltOn = col("event_id"), saltBuckets = 8)
    val plain = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("IVF assignment puts every vector in exactly one cell") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val assigned = Ivf.assign(e, "vec_id", "embedding", seedEvery = 50)
    assert(assigned.count() == e.count())
    assert(assigned.select("vec_id").distinct().count() == e.count())
  }

  test("IVF search: at most k rows per query, ranks contiguous, no self-match") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val out = Ivf.search(e, e.where(col("vec_id") % 50 === 0),
      "vec_id", "embedding", seedEvery = 50, nProbe = 2, k = 3).collect()
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.values.forall(_.length <= 3))
    byQ.values.foreach { rows =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rows.length))
    }
    assert(out.forall(r => r.getAs[Long]("query_id") != r.getAs[Long]("neighbor_id")))
  }

  test("skew task-share law: 80%-hot key bounded by the skew-safe dedup") {
    // Round-8 verdict #6: tie the salted/skew-safe story to MEASURED
    // task behavior. Plant a key carrying 80% of sf0.1 events, then
    // read per-task shuffle-read record counts off a SparkListener:
    //  - the HAZARD is real: an unlimited window partitioned by the
    //    hot key funnels ~80% of all rows through one task (this is
    //    what latestByKey would do without WindowGroupLimit's rn=1
    //    map-side limit — asserted via a window aggregate the
    //    optimizer cannot limit);
    //  - the MITIGATION holds: latestByKeySkewSafe reduces the hot
    //    key map-side to one max row, and the wide side either joins
    //    a BROADCAST of the tiny per-key maxima (the measured plan
    //    here — zero wide-side shuffle) or shuffles on (key, ord)
    //    (large key cardinality) — in both plans no task reads more
    //    than a smidgen of the total.
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    // 32 real reduce partitions for the share math: the suite default
    // (4) would make even perfect spreading a 25% share, and AQE's
    // small-data coalescing would merge this tiny shuffle back into a
    // handful of tasks — at real scale partition counts are data-sized
    // and neither pin is needed
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevCoalesce =
      spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
    val hot = Tables.load(spark, "/root/testdata/sf0.1", "events")
      .select(
        when(col("event_id") % 10 < 8, lit(77777L)).otherwise(col("user_id"))
          .as("user_id"),
        col("event_id"), col("ts"), col("value"))
    val total = hot.count().toDouble

    def maxTaskShare(run: => Unit): Double = {
      val records = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val listener = new SparkListener {
        override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) records.add(m.shuffleReadMetrics.recordsRead)
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        run
        // listener bus is async: wait for the task-end stream to drain
        var last = -1
        var stable = 0
        while (stable < 4) { // 4 * 250ms of no new events
          Thread.sleep(250)
          if (records.size == last) stable += 1 else { stable = 0; last = records.size }
        }
      } finally spark.sparkContext.removeSparkListener(listener)
      import scala.jdk.CollectionConverters._
      records.asScala.foldLeft(0L)(math.max).toDouble / total
    }

    val hazard = maxTaskShare {
      // running count per key — no group limit possible: every row of
      // the hot key must reach one task
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      hot.withColumn("__rn", count(lit(1)).over(w))
        .write.format("noop").mode("overwrite").save()
    }
    val mitigated = maxTaskShare {
      graft.operators.Dedup.latestByKeySkewSafe(hot, Seq("user_id"),
          struct(col("ts"), col("event_id")))
        .write.format("noop").mode("overwrite").save()
    }
    info(f"max task share: unlimited-window=$hazard%.3f skew-safe=$mitigated%.3f")
    assert(hazard >= 0.6,
      s"hot-key hazard did not materialize (max share $hazard) — fixture broken?")
    assert(mitigated <= 0.10,
      s"skew-safe dedup concentrated a task at $mitigated of all rows")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoalesce)
    }
  }

  test("IVF recall@3 law: seeded and trained quantizers vs brute force") {
    // The r8 witnesses prove the train→index→probe CHAIN runs; this
    // law bounds result QUALITY so a future ANN edit can't silently
    // degrade to garbage neighbors (round-8 verdict #4). recall@3 =
    // |IVF top-3 ∩ exact top-3| / |exact top-3| over the
    // deterministic query subset, nProbe=2.
    val e = Tables.load(spark, sfDir, "embeddings").cache()
    val q = e.where(col("vec_id") % 50 === 0)
    val exact = graft.operators.Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recallOf(ivf: org.apache.spark.sql.DataFrame): Double = {
      val got = ivf.select("query_id", "neighbor_id").as[(Long, Long)]
        .collect().toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    def seededAt(nProbe: Int): Double = recallOf(
      Ivf.search(e, q, "vec_id", "embedding", 50, nProbe, 3))
    val centers = graft.operators.Similarity.groupCentroids(e, "label", "embedding")
      .groupBy("label")
      .agg(expr("transform(array_sort(collect_list(struct(dim, centroid))), x -> x.centroid)")
        .as("__sv"))
      .select(col("label").cast("long").as("seed_id"), col("__sv"))
    def trainedAt(nProbe: Int): Double = recallOf(
      Ivf.searchWith(e, q, "vec_id", "embedding", centers, nProbe, 3))
    // count the seeds by the ACTUAL seed rule (Ivf.seeds selects
    // vec_id % seedEvery == 1) — deriving it as count/50 would break
    // the full-probe law whenever the fixture isn't an exact multiple
    val nSeedCells = e.where(col("vec_id") % 50 === 1).count().toInt.max(1)
    val nTrainedCells = centers.count().toInt
    val (s2, s4, sAll) = (seededAt(2), seededAt(4), seededAt(nSeedCells))
    val (t2, t4, tAll) = (trainedAt(2), trainedAt(4), trainedAt(nTrainedCells))
    info(s"recall@3 seeded: nProbe2=$s2 nProbe4=$s4 all($nSeedCells)=$sAll")
    info(s"recall@3 trained: nProbe2=$t2 nProbe4=$t4 all($nTrainedCells)=$tAll")
    e.unpersist()
    // fixed floors under the measured values (seeded .43, trained .37
    // at nProbe=2 on this fixture — recorded in BENCH_NOTES §r9): a
    // broken probe order, cell assignment, or centroid layout lands
    // near zero, not near the floor
    assert(s2 >= 0.35, s"seeded recall@3 (nProbe=2) degraded: $s2")
    assert(t2 >= 0.30, s"trained recall@3 (nProbe=2) degraded: $t2")
    // structural laws, not tuned numbers: more probes never hurt, and
    // probing EVERY cell is exhaustive search — identical top-3 to
    // brute force (same score, same tie-break)
    assert(s2 <= s4 && s4 <= sAll, s"seeded recall not monotone: $s2 $s4 $sAll")
    assert(t2 <= t4 && t4 <= tAll, s"trained recall not monotone: $t2 $t4 $tAll")
    assert(sAll == 1.0, s"seeded full-probe must equal brute force: $sAll")
    assert(tAll == 1.0, s"trained full-probe must equal brute force: $tAll")
  }

  test("persisted IVF index: train once + incremental append serves " +
    "the same results as an in-query quantizer over the same centers, " +
    "and recall vs brute force survives the persistence round-trip") {
    import graft.operators.TxLog
    val e = Tables.load(spark, sfDir, "embeddings").cache()
    val q = e.where(col("vec_id") % 50 === 0)
    val centersBase = "/tmp/graft_ivfp/centers"
    val assignBase = "/tmp/graft_ivfp/assign"
    TxLog.drop(spark, centersBase); TxLog.drop(spark, assignBase)
    val initial = e.where(col("vec_id") % 5 =!= 0)
    val newBatch = e.where(col("vec_id") % 5 === 0)
    val centers0 = graft.operators.Similarity
      .groupCentroids(initial, "label", "embedding")
      .groupBy("label")
      .agg(expr("transform(array_sort(collect_list(struct(dim, centroid))), x -> x.centroid)")
        .as("sv"))
      .select(col("label").cast("long").as("seed_id"), col("sv"))
    TxLog.commit(centers0, centersBase, None)
    val frozen = TxLog.read(spark, centersBase)
      .select(col("seed_id"), col("sv").as("__sv"))
    TxLog.commit(Ivf.assignTo(initial, "vec_id", "embedding", frozen),
      assignBase, None, Some("vec_id"))
    TxLog.appendOnce(Ivf.assignTo(newBatch, "vec_id", "embedding", frozen),
      assignBase, appId = "ivfp-law", batchId = 1L,
      statsCol = Some("vec_id"))
    // idempotent maintenance: a replayed batch is a no-op
    assert(TxLog.appendOnce(
      Ivf.assignTo(newBatch, "vec_id", "embedding", frozen),
      assignBase, appId = "ivfp-law", batchId = 1L,
      statsCol = Some("vec_id")) == 2L)
    val persisted = Ivf.searchAssigned(e, q, "vec_id", "embedding",
      frozen, TxLog.read(spark, assignBase), nProbe = 2, k = 3)
    // equivalence: the persisted index answers exactly like assigning
    // the whole corpus in-query against the SAME frozen centers
    val inQuery = Ivf.searchWith(e, q, "vec_id", "embedding", frozen,
      nProbe = 2, k = 3)
    assert(persisted.exceptAll(inQuery).isEmpty &&
      inQuery.exceptAll(persisted).isEmpty,
      "persisted and in-query assignment must answer identically")
    // recall vs brute force: a floor at the working nProbe, monotone
    // in probes, and EXACT at full probe (exhaustive ≡ brute force) —
    // the structural laws a quantizer swap cannot silently break
    val exact = graft.operators.Similarity
      .bruteForceTopK(e, q, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recallAt(nProbe: Int): Double = {
      val got = Ivf.searchAssigned(e, q, "vec_id", "embedding", frozen,
          TxLog.read(spark, assignBase), nProbe, 3)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val nCells = frozen.count().toInt
    val (r2, r4, rAll) = (recallAt(2), recallAt(4), recallAt(nCells))
    info(s"persisted-IVF recall@3: nProbe2=$r2 nProbe4=$r4 all($nCells)=$rAll")
    assert(r2 >= 0.25, s"persisted-IVF recall degraded: $r2")
    assert(r2 <= r4 && r4 <= rAll, s"recall not monotone: $r2 $r4 $rAll")
    assert(rAll == 1.0, s"full-probe must equal brute force: $rAll")
    e.unpersist()
  }
}
