package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Cluster

/** Connected-components laws for the dup-cluster operator. */
class ClusterSpec extends AnyFunSuite {
  val spark = SparkTestBase.spark
  import spark.implicits._

  test("transitive chain collapses to one cluster with min-id canonical") {
    // 1-2, 2-3, 3-4: diameter-3 chain — needs >1 propagation round.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val cc = Cluster.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("disjoint components stay disjoint; singletons are their own cluster") {
    val docs = (1L to 8L).toDF("doc_id")
    val pairs = Seq((5L, 6L), (7L, 8L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Cluster.dupClusters(docs, "doc_id", pairs, "id_a", "id_b")
      .orderBy("doc_id")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, true), (2L, 2L, true), (3L, 2L, false), (4L, 4L, true),
      (5L, 5L, true), (6L, 5L, false), (7L, 7L, true), (8L, 7L, false)))
  }

  test("non-convergence within maxIter fails loudly instead of returning split components") {
    // A 6-node chain needs ~5 propagation rounds; maxIter=2 must throw.
    val chain = (1L to 5L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalArgumentException] {
      Cluster.connectedComponents(chain, "id_a", "id_b", maxIter = 2).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("edge order does not matter (labels flow against edge direction too)") {
    val pairs = Seq((9L, 1L), (9L, 5L)).toDF("id_a", "id_b") // star centered high
    val cc = Cluster.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(9L -> 1L, 1L -> 1L, 5L -> 1L))
  }
}
