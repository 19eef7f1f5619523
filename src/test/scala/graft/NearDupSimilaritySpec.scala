package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{NearDup, Similarity}
import graft.sources.Tables

class NearDupSimilaritySpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  test("minhash-LSH pairs == exact inverted-index jaccard pairs on real corpus") {
    val docs = Tables.load(spark, sfDir, "documents")
    val exact = NearDup.jaccardPairs(docs, "doc_id", "text", n = 2, tau = 0.8)
    val lsh = NearDup.minhashLshPairs(docs, "doc_id", "text", n = 2, tau = 0.8)
    assert(exact.exceptAll(lsh).isEmpty && lsh.exceptAll(exact).isEmpty)
    assert(exact.count() > 0) // corpus has planted near-dups
  }

  test("shingles of a doc shorter than n tokens are empty, not an error") {
    val docs = Seq((1L, "one two"), (2L, "a b c d e")).toDF("doc_id", "text")
    val pairs = NearDup.jaccardPairs(docs, "doc_id", "text", n = 4, tau = 0.1)
    assert(pairs.count() == 0)
  }

  test("simhash pairs respect the hamming bound and i<j ordering") {
    val docs = Tables.load(spark, sfDir, "documents")
    val pairs = NearDup.simhashPairs(docs, "doc_id", "text", maxHd = 3).collect()
    assert(pairs.forall(r => r.getAs[Long]("id_a") < r.getAs[Long]("id_b")))
    assert(pairs.forall(r => r.getAs[Int]("hamming") <= 3))
  }

  test("brute-force top-k: k rows per query, no self-match, cosine sane") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val out = Similarity.bruteForceTopK(e, e.where(col("vec_id") < 3),
      "vec_id", "embedding", k = 4)
    val grouped = out.collect().groupBy(_.getAs[Long]("query_id"))
    assert(grouped.size == 3 && grouped.values.forall(_.length == 4))
    assert(out.where(col("query_id") === col("neighbor_id")).count() == 0)
    assert(out.agg(max(abs(col("cos_sim")))).head.getDouble(0) <= 1.0001)
  }

  test("sq8 quantization: codes are genuine tinyint in [-127, 127], " +
    "quantized cosine tracks exact cosine, and top-1 recall vs brute " +
    "force is high on the real corpus") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val q = Similarity.sq8Quantize(e, "vec_id", "embedding")
    assert(q.schema("codes").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ByteType, containsNull = false) ||
      q.schema("codes").dataType.asInstanceOf[
        org.apache.spark.sql.types.ArrayType].elementType ==
        org.apache.spark.sql.types.ByteType,
      s"codes must be 1-byte (the 4x memory cut IS the feature): " +
        s"${q.schema("codes").dataType}")
    val bounds = q.select(
      max(expr("aggregate(codes, cast(-128 as int), " +
        "(acc, x) -> greatest(acc, cast(x as int)))")).as("hi"),
      min(expr("aggregate(codes, cast(128 as int), " +
        "(acc, x) -> least(acc, cast(x as int)))")).as("lo")).head
    assert(bounds.getInt(0) <= 127 && bounds.getInt(1) >= -127, bounds)
    // error + recall law against the exact ranking
    val queries = e.where(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(e, queries, "vec_id",
      "embedding", k = 1).collect()
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos_sim"))).toMap
    val approx = Similarity.sq8TopK(e, queries, "vec_id",
      "embedding", k = 1).collect()
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("qcos_sim"))).toMap
    assert(approx.keySet == exact.keySet)
    val hits = approx.count { case (qid, (nid, _)) => exact(qid)._1 == nid }
    assert(hits >= (exact.size * 0.8).toInt,
      s"sq8 top-1 recall too low: $hits/${exact.size}")
    approx.foreach { case (qid, (_, qcs)) =>
      assert(math.abs(qcs - exact(qid)._2) < 0.05,
        s"quantized cosine drifted: q=$qid $qcs vs ${exact(qid)._2}")
    }
  }

  test("retrievalEval computes textbook metrics on a hand-checked " +
    "fixture (recall, precision, MRR, binary nDCG)") {
    val truth = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "A"), (5L, "B"))
      .toDF("id", "label")
    // ranked list for query 1 (label A; relevant = ids 2 and 4):
    // rank1=3(B) rank2=2(A) rank3=5(B) rank4=4(A)
    val results = Seq((1L, 3L, 1), (1L, 2L, 2), (1L, 5L, 3), (1L, 4L, 4))
      .toDF("query_id", "neighbor_id", "rank")
    val m = Similarity.retrievalEval(results, truth, "id", "label",
      k = 3, mrrDepth = 4).head
    assert(m.getAs[Long]("n_relevant") == 2L)
    assert(m.getAs[Double]("recall_at_3") == 0.5)      // 1 of 2 in top-3
    assert(m.getAs[Double]("precision_at_3") == 0.3333)
    assert(m.getAs[Double]("mrr_at_4") == 0.5)         // first rel at 2
    // dcg = 1/log2(3); idcg = 1/log2(2) + 1/log2(3) → 0.38685…
    assert(math.abs(m.getAs[Double]("ndcg_at_3") - 0.3869) <= 1e-4,
      s"ndcg: $m")
  }

  test("cosine of a vector with itself is 1") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val c = df.select(Similarity.cosine(col("a"), col("b")).as("c"))
      .head.getDouble(0)
    assert(c == 1.0)
  }

  test("sign-LSH near-dup pairs are a verified subset of all-pairs cosine") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val lsh = Similarity.signLshPairs(e, "vec_id", "embedding", tau = 0.3)
    // every reported pair really has cos >= tau (exact verification ran)
    assert(lsh.where(col("cos_sim") < 0.3).count() == 0)
    // and candidates obey id_a < id_b
    assert(lsh.where(col("id_a") >= col("id_b")).count() == 0)
  }
}
