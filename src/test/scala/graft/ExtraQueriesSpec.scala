package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.{RegistryExtra, RegistryLlm}

/** Semantic laws for the round-6 operator batch — properties the
  * DuckDB hash-compare alone would not articulate (tiling of SCD2
  * validity ranges, grid completeness of the gap-fill, the semantic-
  * dedup survivor invariant, sliding-window double counting). */
class ExtraQueriesSpec extends AnyFunSuite {
  import SparkTestBase._

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  test("w8_scd2_dimension: per-user validity ranges tile, one current row") {
    val out = run("w8_scd2_dimension").cache()
    // every range is non-empty and well-formed
    assert(out.where(col("valid_from_us") >= col("valid_to_us")).count() == 0)
    // exactly one open (current) row per user
    val perUser = out.groupBy("user_id")
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n_cur"))
    assert(perUser.where(col("n_cur") =!= 1).count() == 0)
    // ranges chain: each next valid_from equals the previous valid_to
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("valid_from_us")
    val chained = out.withColumn("__next_from", lead("valid_from_us", 1).over(w))
      .where(col("__next_from").isNotNull)
    assert(chained.where(col("valid_to_us") =!= col("__next_from")).count() == 0)
    // consecutive rows always change the attribute value
    val attrChain = out.withColumn("__next_attr", lead("attr_value", 1).over(w))
      .where(col("__next_attr").isNotNull)
    assert(attrChain.where(col("attr_value") === col("__next_attr")).count() == 0)
    out.unpersist()
  }

  test("a18_filtered_aggs: conditional aggregates agree with recomputation") {
    val out = run("a18_filtered_aggs").cache()
    val orders = graft.sources.Tables.load(spark, sfDir, "orders")
    // n_finished recomputed the long way
    val recount = orders.where(col("o_orderstatus") === "F")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n2"))
    val mism = out.join(recount, "o_orderpriority")
      .where(col("n_finished") =!= col("n2")).count()
    assert(mism == 0)
    // booleans agree with their set-level definitions
    val sets = orders.groupBy("o_orderpriority").agg(
      count(when(col("o_totalprice") <= 0, 1)).as("n_nonpos"),
      count(when(col("o_totalprice") > 400000d, 1)).as("n_jumbo"))
    val bad = out.join(sets, "o_orderpriority")
      .where(col("all_positive") =!= (col("n_nonpos") === 0) ||
        col("any_jumbo") =!= (col("n_jumbo") > 0)).count()
    assert(bad == 0)
    out.unpersist()
  }

  test("w11_forward_fill: LOCF laws — identity on observed, carry on gaps") {
    import org.apache.spark.sql.expressions.Window
    val out = run("w11_forward_fill").cache()
    // where a value was observed, fill is the identity
    assert(out.where(col("observed").isNotNull &&
      col("filled_price") =!= col("observed")).count() == 0)
    // where null, fill equals the previous row's fill (or stays null
    // before the first observation) — previous in the FILL order,
    // which is (o_orderdate, o_orderkey), so join the date back
    val dated = out.join(
      graft.sources.Tables.load(spark, sfDir, "orders")
        .select("o_orderkey", "o_orderdate"),
      "o_orderkey")
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val lagged = dated.withColumn("__prev", lag("filled_price", 1).over(w))
    assert(lagged.where(col("observed").isNull &&
      !(col("filled_price") <=> col("__prev"))).count() == 0)
    // both cases non-vacuous
    assert(out.where(col("observed").isNull).count() > 0)
    assert(out.where(col("observed").isNotNull).count() > 0)
    out.unpersist()
  }

  test("j17_lateral_topk agrees with the window-rank formulation") {
    import org.apache.spark.sql.expressions.Window
    val out = run("j17_lateral_topk")
    val c = graft.sources.Tables.load(spark, sfDir, "customer")
    val n = graft.sources.Tables.load(spark, sfDir, "nation")
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val expect = c.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= 2)
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .select("n_name", "c_custkey", "c_acctbal")
    assert(out.exceptAll(expect).count() == 0)
    assert(expect.exceptAll(out).count() == 0)
  }

  test("llm_url_normalize_dedup: canonicals are normalized and partition the corpus") {
    val out = run("llm_url_normalize_dedup").cache()
    val nDocs = graft.sources.Tables.load(spark, sfDir, "documents").count()
    // every source URL lands in exactly one canonical group
    val total = out.agg(sum("n_urls")).head().getLong(0)
    assert(total == nDocs)
    // canonical form: query params stripped, host lowercased
    assert(out.where(col("canonical_url").contains("?") ||
      col("canonical_url") =!= lower(col("canonical_url"))).count() == 0)
    // variants never exceed members; keeper ids are plausible
    assert(out.where(col("n_raw_variants") > col("n_urls")).count() == 0)
    assert(out.where(col("kept_doc_id") < 0).count() == 0)
    out.unpersist()
  }

  test("o5_recursive_cte: levels double down a binary tree from the root") {
    val out = run("o5_recursive_cte").cache()
    val rows = out.orderBy("depth").collect()
    assert(rows.head.getAs[Long]("n_nodes") == 1L) // the root
    // a full level has exactly 2^depth nodes, and levels stay full
    // until the key space runs out (customer keys are dense from 1)
    rows.takeWhile(r => r.getAs[Long]("n_nodes") ==
      (1L << r.getAs[Int]("depth"))) match {
      case full => assert(full.length >= 3, "at least 3 full levels expected")
    }
    out.unpersist()
  }

  test("a19_bitwise_aggs: mask bits reconstruct distinct-type counts") {
    val out = run("a19_bitwise_aggs").cache()
    val events = graft.sources.Tables.load(spark, sfDir, "events")
    val expect = events.groupBy((col("user_id") % 100).as("user_bucket"))
      .agg(countDistinct("event_type").as("nd"))
    val bad = out.join(expect, "user_bucket")
      .where(col("n_types") =!= col("nd")).count()
    assert(bad == 0)
    // common_mask can only keep bits present in the union mask
    assert(out.where((col("common_mask").bitwiseAND(col("type_mask"))) =!=
      col("common_mask")).count() == 0)
    out.unpersist()
  }

  test("f14_map_ops: map pipeline agrees with the relational recomputation") {
    val out = run("f14_map_ops")
    val events = graft.sources.Tables.load(spark, sfDir, "events")
    val expect = events.where(col("user_id") < 200)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= 3)
      .select(col("user_id"), col("event_type"),
        (col("cnt") * 10 + length(col("event_type"))).as("score"))
    assert(out.exceptAll(expect).count() == 0)
    assert(expect.exceptAll(out).count() == 0)
  }

  test("stream_upsert_merge equals the batch latest-per-user reduction") {
    import org.apache.spark.sql.expressions.Window
    val out = run("stream_upsert_merge")
    val events = graft.sources.Tables.load(spark, sfDir, "events")
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    val expect = events.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select("user_id", "event_id", "event_type", "value")
    assert(out.exceptAll(expect).count() == 0)
    assert(expect.exceptAll(out).count() == 0)
  }

  test("w12_distinct_count_window agrees with groupBy countDistinct") {
    val out = run("w12_distinct_count_window")
    val orders = graft.sources.Tables.load(spark, sfDir, "orders")
      .where(col("o_custkey") <= 100)
    val expect = orders.groupBy("o_custkey")
      .agg(countDistinct("o_orderdate").as("nd"))
    val bad = out.join(expect, "o_custkey")
      .where(col("n_distinct_dates") =!= col("nd")).count()
    assert(bad == 0)
    // one row per order, value constant within the customer
    assert(out.count() == orders.count())
    assert(out.select("o_custkey", "n_distinct_dates").distinct().count() ==
      expect.count())
  }

  test("llm_bigram_perplexity: per-doc totals tie to the corpus LM") {
    val out = run("llm_bigram_perplexity").cache()
    // NLL is nonnegative (P <= 1 always) and bigram totals match a
    // direct recount of each doc's bigrams
    assert(out.where(col("nll_micro") < 0).count() == 0)
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val recount = docs.select(col("doc_id"),
        size(graft.functions.TextFns.ngrams(col("text"), 2)).as("n2"))
      .where(col("n2") > 0)
    val bad = out.join(recount, "doc_id")
      .where(col("n_bigrams") =!= col("n2")).count()
    assert(bad == 0)
    assert(out.count() == recount.count())
    out.unpersist()
  }

  test("llm_shuffle_shards: dense positions, bucket-derived assignment") {
    val out = run("llm_shuffle_shards").cache()
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    assert(out.count() == docs.count())
    // shard is exactly the shared md5 bucket mod 8 (growth-stable)
    val bad = out.where(col("shard") =!=
      (graft.operators.TextAnalysis.stableBucket(col("doc_id")) % 8)).count()
    assert(bad == 0)
    // positions are dense 1..n within every shard
    val perShard = out.groupBy("shard").agg(count(lit(1)).as("n"),
      min("pos").as("mn"), max("pos").as("mx"),
      countDistinct("pos").as("ndp"))
    assert(perShard.where(col("mn") =!= 1 || col("mx") =!= col("n") ||
      col("ndp") =!= col("n")).count() == 0)
    out.unpersist()
  }

  test("llm_containment_pairs finds every planted subset-duplicate") {
    val out = run("llm_containment_pairs").cache()
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    // planted pairs whose truncated half still carries >= 1 shingle
    // (>= 8 tokens) must all be detected; shorter docs have no
    // shingle evidence to find
    val planted = docs
      .where(col("doc_id") % 25 === 0 &&
        size(graft.functions.TextFns.tokens(col("text"))) >= 8)
      .select(col("doc_id").as("id_a"), (col("doc_id") + 20000).as("id_b"))
    assert(planted.count() > 0)
    val missed = planted.join(out, Seq("id_a", "id_b"), "left_anti").count()
    assert(missed == 0, s"$missed planted subset-dups missed")
    assert(out.where(col("containment") < 0.9).count() == 0)
    out.unpersist()
  }

  test("llm_bpe_pair_stats matches a driver-side recount at tiny scale") {
    val out = run("llm_bpe_pair_stats").collect()
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select("text").collect().map(_.getString(0))
    val counts = scala.collection.mutable.Map[String, Long]()
    docs.foreach { t =>
      t.trim.split("\\s+").filter(_.length >= 2).foreach { w =>
        w.sliding(2).foreach { p => counts(p) = counts.getOrElse(p, 0L) + 1L }
      }
    }
    val expectTop = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val gotTop = out.map(r => (r.getAs[String]("pair"), r.getAs[Long]("n"))).toSeq
    assert(gotTop == expectTop)
  }

  test("j18_interval_overlap_join: overlaps are genuine and bounded") {
    val out = run("j18_interval_overlap_join").cache()
    assert(out.count() > 0)
    // overlap is nonnegative (zero for degenerate point-sessions
    // touching the window) and can never exceed the 12h window
    assert(out.where(col("overlap_us") < 0 ||
      col("overlap_us") > 43200000000L).count() == 0)
    assert(out.where(col("overlap_us") > 0).count() > 0)
    // only banded days carry windows
    assert(out.where(dayofmonth(col("day")) % 3 =!= 0).count() == 0)
    out.unpersist()
  }

  test("j19_salted_skew_join: salting is semantically invisible") {
    val out = run("j19_salted_skew_join")
    val ev = graft.sources.Tables.load(spark, sfDir, "events")
      .withColumn("k",
        when(pmod(col("user_id"), lit(10)) < 8, 0L).otherwise(col("user_id")))
    val dim = ev.select("k").distinct()
      .withColumn("grp", concat(lit("grp_"), (col("k") % 7).cast("string")))
    val plain = ev.join(dim, "k")
      .groupBy("grp")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
    assert(out.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(out).count() == 0)
  }

  test("llm_quality_mad: at least half of each language sits within med±mad") {
    val out = RegistryLlm.defs("llm_quality_mad")(spark, sfDir).cache()
    assert(out.where(col("mad_score") < 0).count() == 0)
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val scored = docs.select(col("lang"),
      graft.operators.TextAnalysis.qualityScore(col("text"))
        .cast("double").as("q"))
    val within = scored.join(out, "lang")
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        count(when(abs(col("q") - col("median_score")) <=
          col("mad_score") + 1e-9, 1)).as("n_in"))
    // the defining MAD property: >= half the mass within med ± mad
    assert(within.where(col("n_in") * 2 < col("n")).count() == 0)
    out.unpersist()
  }

  test("llm_oversample_balance: every class reaches the majority count") {
    val out = RegistryLlm.defs("llm_oversample_balance")(spark, sfDir).cache()
    val target = out.agg(max("n_orig")).head().getLong(0)
    assert(out.where(col("n_after") =!= target).count() == 0,
      "all classes must balance to the majority count")
    // oversampling only repeats existing docs, never invents or drops
    assert(out.where(col("n_distinct") =!= col("n_orig")).count() == 0)
    assert(out.where(col("n_after") < col("n_orig")).count() == 0)
    out.unpersist()
  }

  test("f15_array_set_ops: set identities hold against recomputed halves") {
    val out = run("f15_array_set_ops")
    val ws = graft.functions.TextFns.tokens(col("text"))
    val half = floor(size(ws) / 2).cast("int")
    val a = array_distinct(slice(ws, lit(1), half))
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), size(a).as("n_a"))
    // A = (A ∩ B) ⊎ (A \ B), and overlap is exactly "shared nonempty"
    val joined = out.join(docs, "doc_id")
    assert(joined.where(col("n_shared") + col("n_only_first") =!= col("n_a"))
      .count() == 0)
    assert(joined.where(col("halves_overlap") =!= (col("n_shared") > 0))
      .count() == 0)
    assert(joined.where(col("n_union") < col("n_shared")).count() == 0)
  }

  test("llm_ngram_novelty: totals reconcile with the corpus df profile") {
    val out = RegistryLlm.defs("llm_ngram_novelty")(spark, sfDir).cache()
    assert(out.where(col("novelty_micro") < 0 ||
      col("novelty_micro") > 1000000L).count() == 0)
    // every df==1 shingle contributes exactly one novel posting
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val nSingletons = docs
      .select(explode(graft.functions.TextFns.shingles(col("text"), 3)).as("sh"))
      .groupBy("sh").count().where(col("count") === 1).count()
    val totalNovel = out.agg(sum("n_novel")).head().getLong(0)
    assert(totalNovel == nSingletons)
    out.unpersist()
  }

  test("stream_threshold_emit: tiers are dense and reconcile with totals") {
    val out = run("stream_threshold_emit").cache()
    // positive values → monotone cumulative sums → every tier from 1
    // to the final tier is crossed exactly once per user
    val perUser = out.groupBy("user_id").agg(count(lit(1)).as("n"),
      min("tier").as("mn"), max("tier").as("mx"),
      countDistinct("tier").as("nd"))
    assert(perUser.where(col("mn") =!= 1 || col("mx") =!= col("n") ||
      col("nd") =!= col("n")).count() == 0)
    // the final tier equals the floor of each user's exact cent total
    val events = graft.sources.Tables.load(spark, sfDir, "events")
    val totals = events.groupBy("user_id")
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      .select(col("user_id"), (col("cents") / 100000L).cast("long").as("final_tier"))
      .where(col("final_tier") >= 1)
    val got = out.groupBy("user_id").agg(max("tier").as("mx"))
    assert(got.join(totals, "user_id")
      .where(col("mx") =!= col("final_tier")).count() == 0)
    assert(got.count() == totals.count())
    out.unpersist()
  }

  test("llm_curation_funnel: stages shrink monotonically from 2x the corpus") {
    val out = RegistryLlm.defs("llm_curation_funnel")(spark, sfDir)
      .orderBy("ord").collect()
    val ns = out.map(_.getAs[Long]("n"))
    val corpus = graft.sources.Tables.load(spark, sfDir, "documents").count()
    assert(ns.head == 2 * corpus, "raw stage must hold corpus + planted dups")
    assert(ns(1) <= corpus, "exact dedup must at least remove the planted dups")
    assert(ns.sliding(2).forall(p => p(1) <= p(0)), "funnel must be nonincreasing")
    assert(ns.last > 0, "the pipeline must keep something")
  }

  test("o6_null_ordering: nulls land where each direction pins them") {
    val out = run("o6_null_ordering").cache()
    assert(out.where(col("mode") === "asc_nulls_last" && col("v").isNull)
      .count() == 0, "asc_nulls_last top-k must be null-free")
    assert(out.where(col("mode") === "desc_nulls_first" && col("v").isNotNull)
      .count() == 0, "desc_nulls_first top-k must be all nulls here")
    assert(out.count() == 10)
    out.unpersist()
  }

  test("w13_funnel_pattern: step counts are a monotone funnel") {
    val out = run("w13_funnel_pattern").cache()
    assert(out.where(col("n_step1") > col("n_sessions") ||
      col("n_step2") > col("n_step1") ||
      col("n_step3") > col("n_step2")).count() == 0)
    // the pattern genuinely matches somewhere and genuinely fails
    // somewhere (otherwise the subsequence logic proved nothing)
    assert(out.agg(sum("n_step3")).head().getLong(0) > 0)
    assert(out.where(col("n_step1") < col("n_sessions")).count() > 0)
    out.unpersist()
  }

  test("o3_gap_fill_calendar: complete grid with genuine zero-filled gaps") {
    val out = run("o3_gap_fill_calendar").cache()
    val nTypes = out.select("event_type").distinct().count()
    val nDays = out.select("day").distinct().count()
    assert(out.count() == nTypes * nDays, "grid must be dense")
    assert(out.where(col("n_events") === 0).count() > 0, "gaps must exist")
    out.unpersist()
  }

  test("llm_semdedup: survivors have no within-cluster pair above tau") {
    val out = run("llm_semdedup").cache()
    val n = out.count()
    assert(n > 0 && n < 500 + 1) // some survivors; at most the corpus
    // no surviving pair within the same label with cosine >= tau where
    // the higher id should have been dropped
    val joined = out.as("a").join(out.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .join(graft.sources.Tables.load(spark, sfDir, "embeddings")
          .select(col("vec_id").as("ida"), col("embedding").as("va")),
        col("a.vec_id") === col("ida"))
      .join(graft.sources.Tables.load(spark, sfDir, "embeddings")
          .select(col("vec_id").as("idb"), col("embedding").as("vb")),
        col("b.vec_id") === col("idb"))
      .withColumn("cs", graft.operators.Similarity.cosine(col("va"), col("vb")))
    assert(joined.where(col("cs") >= 0.4).count() == 0)
    out.unpersist()
  }

  test("llm_dedup_keep_best: representative maximizes quality in its cluster") {
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val scored = docs.select(col("doc_id"),
      graft.operators.TextAnalysis.qualityScore(col("text")).as("qs"))
    val out = run("llm_dedup_keep_best").cache()
    // exactly one row per cluster, members sum to the corpus size
    assert(out.select("cluster_id").distinct().count() == out.count())
    val total = out.agg(sum("n_members")).head().getLong(0)
    assert(total == docs.count())
    // kept quality equals its own doc's score (join-back sanity)
    val mismatch = out.join(scored, out("kept_doc_id") === scored("doc_id"))
      .where(col("kept_quality") =!= col("qs")).count()
    assert(mismatch == 0)
    out.unpersist()
  }

  test("stream_sliding_window: every event lands in exactly two windows") {
    val out = run("stream_sliding_window")
    val counted = out.agg(sum("n_events")).head().getLong(0)
    val raw = graft.sources.Tables.load(spark, sfDir, "events").count()
    assert(counted == 2 * raw)
  }

  test("llm_incremental_neardup: every sufficiently-long repost is caught") {
    val out = run("llm_incremental_neardup").cache()
    // every planted repost pairs with its own original…
    val selfPairs = out.where(col("batch_id") - 30000 === col("hist_id"))
    // …whenever the original has >= 8 distinct bigrams: appending two
    // tokens adds 2 shingles, so J = S/(S+2) >= 0.8 ⇔ S >= 8.
    val expected = graft.sources.Tables.load(spark, sfDir, "documents")
      .where(col("doc_id") < 250 && col("doc_id") % 10 === 1)
      .select(size(array_distinct(
        graft.functions.TextFns.shingles(col("text"), 2))).as("s"))
      .where(col("s") >= 8).count()
    assert(selfPairs.count() == expected)
    assert(expected > 0, "fixture must plant catchable reposts")
    out.unpersist()
  }

  test("llm_quality_buckets: four nonempty quartile buckets partition the corpus") {
    val out = run("llm_quality_buckets").cache()
    val n = graft.sources.Tables.load(spark, sfDir, "documents").count()
    assert(out.count() == n)
    val sizes = out.groupBy("bucket").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == Set(0, 1, 2, 3), s"buckets: $sizes")
    assert(sizes.values.sum == n)
    out.unpersist()
  }

  test("stream_stream_join equals the batch time-range join") {
    val out = run("stream_stream_join")
    val ev = graft.sources.Tables.load(spark, sfDir, "events")
    val c = ev.where(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"))
    val batch = c.join(p, col("cu") === col("pu") &&
        col("pts") >= col("cts") &&
        col("pts") <= col("cts") + expr("interval 1 day"))
      .count()
    assert(out.agg(sum("n_pairs")).head().getLong(0) == batch)
  }

  test("a12_unpivot inverts a10-style widening: value totals preserved") {
    val out = run("a12_unpivot")
    val total = out.agg(sum("n")).head().getLong(0)
    val raw = graft.sources.Tables.load(spark, sfDir, "orders").count()
    assert(total == raw)
  }

  test("shingles are exactly the distinct view of ngrams (random corpora)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val words = Vector("a", "b", "ab", "cd", "the", "x")
    val texts = Seq.fill(200)(
      Seq.fill(rnd.nextInt(12))(words(rnd.nextInt(words.size))).mkString(" "))
    val bad = texts.toDF("text").where(
      !(graft.functions.TextFns.shingles(col("text"), 2) ===
        array_distinct(graft.functions.TextFns.ngrams(col("text"), 2))))
    assert(bad.count() == 0)
  }

  test("struct-max argmax equals sort-based mode on random groups") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val data = Seq.fill(500)((rnd.nextInt(5), rnd.nextInt(8).toDouble))
    val expected = data.groupBy(_._1).map { case (g, xs) =>
      val counts = xs.groupBy(_._2).map { case (v, o) => (v, o.size) }
      // max count, min value on ties — the a14 contract
      val best = counts.toSeq.maxBy { case (v, c) => (c, -v) }
      (g, best._1, best._2.toLong)
    }.toSet
    val got = data.toDF("g", "v")
      .groupBy("g", "v").agg(count(lit(1)).as("c"))
      .groupBy("g")
      .agg(max(struct(col("c"), (-col("v")).as("nv"))).as("m"))
      .select(col("g"), (-col("m.nv")).as("v"), col("m.c"))
      .as[(Int, Double, Long)].collect().toSet
    assert(got == expected)
  }

  test("a15_cube: subtotal tiers are mutually consistent") {
    val out = run("a15_cube").cache()
    val detailSum = out.where(col("gid") === 0)
      .agg(sum("n_orders")).head.getLong(0)
    val grand = out.where(col("gid") === 3)
      .agg(sum("n_orders")).head.getLong(0)
    val statusTier = out.where(col("gid") === 1)
      .agg(sum("n_orders")).head.getLong(0)
    val prioTier = out.where(col("gid") === 2)
      .agg(sum("n_orders")).head.getLong(0)
    assert(detailSum == grand && statusTier == grand && prioTier == grand)
    out.unpersist()
  }

  test("f12_explode_tokens positions are 1-based and strictly increasing per doc") {
    val out = run("f12_explode_tokens").cache()
    assert(out.where(col("pos") < 1).count() == 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val nonInc = out.withColumn("__prev", lag("pos", 1).over(w))
      .where(col("__prev").isNotNull && col("pos") <= col("__prev"))
    assert(nonInc.count() == 0)
    // every surviving token respects the generator-side predicate
    assert(out.where(length(col("token")) <= 7).count() == 0)
    out.unpersist()
  }

  test("u4_set_ops_all: multiplicity law n_a = intersect_all + except_all per key") {
    val orders = graft.sources.Tables.load(spark, sfDir, "orders")
    val aCounts = orders.where(col("o_totalprice") < 150000)
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_a"))
    val out = run("u4_set_ops_all")
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(sum("n").as("n_sum"))
    // A row of `a` lands in exactly one of INTERSECT ALL / EXCEPT ALL.
    val joined = aCounts.join(out, Seq("o_orderstatus", "o_orderpriority"), "full")
    assert(joined.where(coalesce(col("n_a"), lit(0L)) =!=
      coalesce(col("n_sum"), lit(0L))).count() == 0)
  }

  test("a16_percentile_cont percentiles are ordered and bracketed by min/max") {
    val out = run("a16_percentile_cont").cache()
    assert(out.where(col("p25") > col("p50") || col("p50") > col("p75"))
      .count() == 0)
    val bounds = graft.sources.Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(min("l_quantity").as("qmin"), max("l_quantity").as("qmax"))
    val j = out.join(bounds, "l_returnflag")
    assert(j.where(col("p25") < col("qmin") || col("p75") > col("qmax"))
      .count() == 0)
    out.unpersist()
  }

  test("stream_session_window agrees with batch sessionization") {
    // same 30-minute gap: the streaming session count and per-user
    // event totals must equal the batch gaps-and-islands formulation
    val sf01 = "/root/testdata/sf0.01"
    val stream = SparkEntry.queries("stream_session_window")(spark, sf01)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
    val batch = SparkEntry.queries("w4_sessionization")(spark, sf01)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty)
  }

  test("w10_range_frame_window frame always contains the row itself") {
    val out = run("w10_range_frame_window").cache()
    assert(out.where(col("n_nearby") < 1).count() == 0)
    val orders = graft.sources.Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val j = out.join(orders, "o_orderkey")
    assert(j.where(col("nearby_total") < col("o_totalprice") - 1e-6).count() == 0)
    out.unpersist()
  }

  test("llm_fuzzy_pairs respects ordering, distance cap, and length band") {
    val sf01 = "/root/testdata/sf0.01"
    val out = SparkEntry.queries("llm_fuzzy_pairs")(spark, sf01).cache()
    assert(out.where(col("id_a") >= col("id_b")).count() == 0)
    assert(out.where(col("dist") > 8 || col("dist") < 0).count() == 0)
    val d = graft.sources.Tables.load(spark, sf01, "documents")
      .select(col("doc_id"), col("n_chars"))
    val j = out.join(d.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("n_chars", "len_a"), "id_a")
      .join(d.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("n_chars", "len_b"), "id_b")
    assert(j.where(abs(col("len_a") - col("len_b")) > 50).count() == 0)
    assert(out.count() > 0, "planted near-dups should surface fuzzy pairs")
    out.unpersist()
  }

  test("s18_cdc_apply: deletes gone, inserts present, latest update wins") {
    val sf01 = "/root/testdata/sf0.01"
    val base = graft.sources.Tables.load(spark, sf01, "customer")
      .select(col("c_custkey"), col("c_acctbal"))
    val out = SparkEntry.queries("s18_cdc_apply")(spark, sf01).cache()
    // deleted keys (k % 100 == 0) absent
    assert(out.where(col("c_custkey") % 100 === 0 &&
      col("c_custkey") < 1000000).count() == 0)
    // inserted keys present, one per source key with k % 100 == 2
    val nIns = base.where(col("c_custkey") % 100 === 2).count()
    assert(out.where(col("c_custkey") >= 1000000).count() == nIns)
    // updated keys carry the SECOND update (+2000), not the first
    val upd = out.where(col("c_custkey") % 100 === 1 &&
        col("c_custkey") < 1000000)
      .join(base.withColumnRenamed("c_acctbal", "orig"), "c_custkey")
    assert(upd.where(col("c_acctbal") =!= col("orig") + 2000).count() == 0)
    // row-count ledger: base - deletes + inserts
    val nBase = base.count()
    val nDel = base.where(col("c_custkey") % 100 === 0).count()
    assert(out.count() == nBase - nDel + nIns)
    out.unpersist()
  }

  test("a17_moments agrees with the builtin moment aggregates to 1e-9") {
    val got = run("a17_moments").collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val ref = graft.sources.Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(avg("l_quantity").as("m"), stddev_samp("l_quantity").as("sd"),
        corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    ref.foreach { case (k, (m, sd, c)) =>
      val (gm, gsd, gc) = got(k)
      assert(math.abs(gm - m) <= 1e-9 * math.abs(m))
      assert(math.abs(gsd - sd) <= 1e-9 * math.abs(sd))
      assert(math.abs(gc - c) <= 1e-6 * math.abs(c).max(1e-3))
    }
  }

  test("generation-scoped caches: re-invocation does not accumulate lineages") {
    // The four CacheScope queries cache an intermediate the RETURNED
    // frame still references; a bench loop re-running them must hold
    // at most ONE live generation each, not one per invocation.
    val names = Seq("llm_bigram_perplexity", "llm_curation_funnel",
      "llm_ngram_novelty", "llm_tfidf_top_terms")
    names.foreach(n => run(n).collect())
    val after1 = spark.sparkContext.getPersistentRDDs.size
    names.foreach(n => run(n).collect())
    val after2 = spark.sparkContext.getPersistentRDDs.size
    assert(after2 <= after1,
      s"cached lineages accumulate across invocations: $after1 -> $after2")
  }

  test("j10_full_outer_join keeps unmatched rows from both sides") {
    // sf0.001's supplier/customer tables are too small to populate
    // either filter; the asymmetry the test asserts exists at sf0.01.
    val out = SparkEntry.queries("j10_full_outer_join")(
      spark, "/root/testdata/sf0.01").cache()
    assert(out.where(col("n_rich_suppliers") === 0).count() > 0)
    assert(out.where(col("n_debtor_customers") === 0).count() > 0)
    assert(out.count() > 0)
    out.unpersist()
  }
}
