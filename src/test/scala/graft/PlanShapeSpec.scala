package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression pins for the round-6 operators — the
  * BENCH_NOTES audits as assertions, so a refactor that silently
  * reintroduces a window sort / extra exchange / cartesian product
  * fails the suite instead of the 100 TB deployment. */
class PlanShapeSpec extends AnyFunSuite {
  import SparkTestBase._

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("llm_dedup_keep_best plans with aggregates only — zero Window operators") {
    val p = planOf("llm_dedup_keep_best")
    assert(!p.contains("Window"), s"window crept back into keep_best:\n$p")
  }

  test("w8_scd2_dimension: both window passes share ONE user-key exchange") {
    val p = planOf("w8_scd2_dimension")
    val windows = "(?m)^\\s*[+:*\\-\\s]*Window ".r.findAllIn(p).size
    assert(windows == 2, s"expected 2 Window ops, found $windows:\n$p")
    val keyExchanges = "Exchange hashpartitioning\\(user_id".r.findAllIn(p).size
    assert(keyExchanges == 1,
      s"expected exactly 1 user_id exchange (reused by both windows), found $keyExchanges:\n$p")
  }

  test("a11_grouping_sets is one Expand pass, not a union of aggregates") {
    val p = planOf("a11_grouping_sets")
    assert("Expand".r.findAllIn(p).size == 1, s"expected a single Expand:\n$p")
    assert(!p.contains("Union"), s"grouping sets must not plan as a UNION:\n$p")
  }

  test("a15_cube is one Expand pass over a single aggregate") {
    val p = planOf("a15_cube")
    assert("Expand".r.findAllIn(p).size == 1, s"expected a single Expand:\n$p")
    assert(!p.contains("Union"), s"cube must not plan as a UNION:\n$p")
  }

  test("j17_lateral_topk decorrelates: WindowGroupLimit prune, no nested loop") {
    val p = planOf("j17_lateral_topk")
    assert(!p.contains("CartesianProduct"), s"cartesian in lateral join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested loop in lateral join:\n$p")
    // the per-nation LIMIT must prune map-side (top-k heap before the
    // exchange), not re-execute the subquery per outer row
    assert(p.contains("WindowGroupLimit"),
      s"lateral LIMIT should decorrelate to WindowGroupLimit:\n$p")
  }

  test("a18_filtered_aggs stays a HashAggregate — no SortAggregate demotion") {
    val p = planOf("a18_filtered_aggs")
    assert(p.contains("HashAggregate"), s"expected hash aggregate:\n$p")
    // a struct-valued aggregate buffer would silently demote this to
    // SortAggregate (partial sort of every scan partition at 100 TB)
    assert(!p.contains("SortAggregate"), s"hash agg demoted to sort agg:\n$p")
    assert(!p.contains("Window"), s"conditional aggs must not window:\n$p")
  }

  test("w12_distinct_count_window: both windows share ONE customer exchange") {
    val p = planOf("w12_distinct_count_window")
    val keyExchanges = "Exchange hashpartitioning\\(o_custkey".r.findAllIn(p).size
    assert(keyExchanges == 1,
      s"expected exactly 1 o_custkey exchange shared by both windows:\n$p")
  }

  test("j18_interval_overlap_join bands on the day key — no cartesian") {
    val p = planOf("j18_interval_overlap_join")
    assert(!p.contains("CartesianProduct"), s"cartesian in interval join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested loop in interval join:\n$p")
  }

  test("llm_containment_pairs stays on the inverted index — no cartesian") {
    val p = planOf("llm_containment_pairs")
    assert(!p.contains("CartesianProduct"), s"cartesian in containment:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested loop in containment:\n$p")
  }

  test("j19_salted_skew_join: the shuffle-join key carries the salt") {
    // force the shuffle-join path (a broadcast would make salting moot)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = planOf("j19_salted_skew_join")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"expected a shuffle join under broadcast=-1:\n$p")
      assert(p.contains("__salt"), s"join key must include the salt:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("u4_set_ops_all plans multiset ops without cartesian/nested-loop joins") {
    val p = planOf("u4_set_ops_all")
    assert(!p.contains("CartesianProduct"), s"cartesian in set ops:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested loop in set ops:\n$p")
  }

  test("f12_explode_tokens generates inside the scan stage — no pre-sort shuffle") {
    val p = planOf("f12_explode_tokens")
    assert(p.contains("Generate"), s"expected a Generate operator:\n$p")
    // exactly one exchange: the rangepartitioning for the output sort
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected only the output-sort exchange:\n$p")
  }

  test("o4_topk_limit plans as TakeOrderedAndProject, never a full sort") {
    val p = planOf("o4_topk_limit")
    assert(p.contains("TakeOrderedAndProject"),
      s"expected bounded-heap top-k operator:\n$p")
    assert(!"(?m)^\\s*[+:*\\-\\s]*Sort ".r.findAllIn(p).hasNext,
      s"global Sort crept into the top-k plan:\n$p")
  }

  test("llm_fuzzy_pairs blocks via equi-join — no cartesian/nested-loop") {
    val p = planOf("llm_fuzzy_pairs")
    assert(!p.contains("CartesianProduct"), s"cartesian in fuzzy pairs:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested loop in fuzzy pairs:\n$p")
  }

  test("j16_null_safe_join still plans as a hash join, and the NULL row matches") {
    val p = planOf("j16_null_safe_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"null-safe equality fell off the hash-join path:\n$p")
    val out = SparkEntry.queries("j16_null_safe_join")(spark, sfDir)
    import org.apache.spark.sql.functions.col
    assert(out.where(col("k") === -1).count() == 1,
      "the NULL<=>NULL row must survive the join")
  }

  test("llm_semdedup never degenerates to a cartesian/nested-loop join") {
    val p = planOf("llm_semdedup")
    assert(!p.contains("CartesianProduct"), s"cartesian product in semdedup:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested loop in semdedup:\n$p")
  }

  test("s19_orc_roundtrip: predicate reaches the ORC scan, columns pruned") {
    val p = planOf("s19_orc_roundtrip")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,25.0)]"),
      s"l_quantity predicate not pushed into the ORC scan:\n$p")
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_returnflag:string>"),
      s"ORC scan reads more than the 3 referenced columns:\n$p")
  }

  test("binaryFile metadata query never reads blob content") {
    // the 100 TB media-corpus contract behind multimodal_binary_ingest:
    // a listing/length query over petabytes of blobs must stay a
    // metadata operation — content pruned out of the scan schema
    val dir = graft.sources.Ingest.fixtureDir(sfDir) + "/bmp_probe"
    val p = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(p)
    (1L to 3L).foreach { id =>
      java.nio.file.Files.write(p.resolve(s"media-$id.bmp"),
        graft.operators.Multimodal.encodeBmp(id, 3, 2))
    }
    val plan = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bmp").load(dir)
      .select("length").queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<length:bigint>"),
      s"length-only query read more than metadata:\n$plan")
    assert(!plan.contains("content"),
      s"blob content survived column pruning:\n$plan")
  }

  test("llm_paragraph_dedup: aggregate winner election, no self-join blowup") {
    val p = planOf("llm_paragraph_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"paragraph dedup degenerated to an all-pairs join:\n$p")
    // winners are elected by a (deliberate, struct-buffer) sort
    // aggregate on the fingerprint — never a Window over the corpus
    assert(!p.contains("Window"), s"winner election fell back to a Window:\n$p")
    // reassembly stays an ObjectHashAggregate on the doc key
    assert(p.contains("ObjectHashAggregate"),
      s"doc reassembly lost its hash aggregate:\n$p")
  }

  test("f6_unicode_silver_chain: broadcast star + projection, one sort exchange") {
    // The unicode silver chain is expression-dense but shuffle-light:
    // three broadcast dim joins feed a pure projection; the ONLY
    // hash/range exchange is the registry output's global sort.
    // Unicode LIKE/initcap must not push anything off the codegen path
    // into extra shuffles.
    val p = planOf("f6_unicode_silver_chain")
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    assert(bhj == 3, s"expected 3 broadcast dim joins, found $bhj:\n$p")
    // non-broadcast exchanges: Tables.scaled's round-robin + the
    // output sort's range partitioning — and nothing else
    val shuffles = "(?<!Broadcast)Exchange ".r.findAllIn(p).size
    assert(shuffles == 2,
      s"unicode silver chain grew unexpected shuffles ($shuffles):\n$p")
    assert(!p.contains("SortMergeJoin"), s"dim join fell to SMJ:\n$p")
  }

  test("llm_domain_stats: blocklist is a broadcast anti-join, never a corpus shuffle") {
    val p = planOf("llm_domain_stats")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"blocklist must apply as a broadcast anti-join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"2-row blocklist shuffled the corpus:\n$p")
  }

  test("llm_vocab_oov: the vocab probe is a broadcast join on the token stream") {
    val p = planOf("llm_vocab_oov")
    assert(p.contains("BroadcastHashJoin"),
      s"top-K vocab must broadcast to the eval token stream:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"bounded vocab shuffled the token stream:\n$p")
  }

  test("llm_dup_span_stats: span presence via window min/max — no join at all") {
    val p = planOf("llm_dup_span_stats")
    assert(!p.contains("Join"), s"dup-span coverage must not join:\n$p")
    assert(p.contains("Window"), s"span window disappeared:\n$p")
  }

  test("llm_classifier_score: scoring is scan-stage only — no join, no aggregate, one sort exchange") {
    val p = planOf("llm_classifier_score")
    assert(!p.contains("Join"), s"classifier inference must not join:\n$p")
    assert(!p.contains("HashAggregate") && !p.contains("SortAggregate"),
      s"classifier inference must not aggregate:\n$p")
    // the ONLY exchange is the harness's output ordering
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, // rangepartitioning for the sort (+AQE read)
      s"classifier scoring should add no shuffle beyond the output sort:\n$p")
  }

  test("quality_observed_metrics: metrics ride the pass via CollectMetrics, no second scan") {
    // the observed frame's plan carries a CollectMetrics node over the
    // single scan — assert on the observed lineage itself
    val obs = org.apache.spark.sql.Observation()
    val df = graft.sources.Tables.load(spark, sfDir, "orders").observe(obs,
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("CollectMetrics"), s"observe lost its metrics node:\n$p")
    assert("FileScan|BatchScan".r.findAllIn(p).size == 1,
      s"metrics must not add a scan:\n$p")
    assert(obs.get("n").asInstanceOf[Long] > 0)
  }
}
