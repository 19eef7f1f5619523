package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ivf, Similarity, TxLog}
import graft.sources.Tables

/** OPTIMIZE-for-ANN laws (VERDICT r12 next-round #5): the persisted
  * IVF's maintenance verb measures per-cell drift and retrains +
  * reassigns ONLY drifted cells' members — Σ|drifted| work, never
  * corpus×K — and recall recovers after the quantizer has gone stale
  * under ingest. */
class IvfMaintainSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private lazy val e =
    Tables.load(spark, SparkTestBase.sfDir, "embeddings")

  private def trainOn(df: DataFrame) =
    Similarity.groupCentroids(df, "label", "embedding")
      .groupBy("label")
      .agg(expr("transform(array_sort(collect_list(struct(dim, centroid))), x -> x.centroid)")
        .as("sv"))
      .select(col("label").cast("long").as("seed_id"), col("sv"))

  private def recallAt3(assignBase: String, centersBase: String): Double = {
    val queries = e.where(col("vec_id") % 25 === 0)
    val truth = Similarity.bruteForceTopK(e, queries,
        "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id")
    val got = Ivf.searchAssigned(e, queries, "vec_id", "embedding",
        TxLog.read(spark, centersBase)
          .select(col("seed_id"), col("sv").as("__sv")),
        TxLog.read(spark, assignBase), nProbe = 2, k = 3)
      .select("query_id", "neighbor_id")
    val hit = truth.intersect(got).count().toDouble
    hit / truth.count()
  }

  test("maintain retrains + reassigns ONLY drifted cells, undrifted " +
    "assignments byte-identical; drift decreases; recall@3 recovers " +
    "after the quantizer went stale under ingest") {
    val centersBase = "/tmp/graft_ivfmaint/centers"
    val assignBase = "/tmp/graft_ivfmaint/assign"
    Seq(centersBase, assignBase).foreach(TxLog.drop(spark, _))
    // the stale-quantizer shape: centers trained when only HALF the
    // label space existed; the full corpus then crams the unseen
    // labels into the nearest old cells
    TxLog.commit(trainOn(e.where(col("label") < 5)), centersBase, None)
    val frozen = TxLog.read(spark, centersBase)
      .select(col("seed_id"), col("sv").as("__sv"))
    TxLog.commit(Ivf.assignTo(e, "vec_id", "embedding", frozen),
      assignBase, None, Some("vec_id"))
    val before = recallAt3(assignBase, centersBase)
    val preAssign = TxLog.read(spark, assignBase).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val preDrift = Ivf.cellDrift(e, "vec_id", "embedding", frozen,
        TxLog.read(spark, assignBase))
      .select("cell", "drift").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val (cells, members) = Ivf.maintain(spark, e, "vec_id", "embedding",
      centersBase, assignBase, maxDrift = 0.02)
    assert(cells >= 1, s"fixture must drift (preDrift: $preDrift)")
    val driftedCells = preDrift.filter(_._2 > 0.02).keySet
    assert(cells == driftedCells.size)
    // work bound: only drifted cells' members were touched
    val driftedMembers = preAssign.count { case (_, c) =>
      driftedCells(c) }
    assert(members == driftedMembers,
      s"reassigned $members, drifted membership $driftedMembers")
    // undrifted cells' assignments are BYTE-IDENTICAL
    val postAssign = TxLog.read(spark, assignBase).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    preAssign.foreach { case (id, c) =>
      if (!driftedCells(c))
        assert(postAssign(id) == c, s"undrifted member $id moved")
    }
    // one merge commit per table: O(drifted), not a rebuild
    assert(TxLog.latestVersion(spark, centersBase).contains(2L))
    assert(TxLog.latestVersion(spark, assignBase).contains(2L))
    // drift DECREASED on every retrained cell (measured against the
    // UPDATED centers + assignments)
    val postDrift = Ivf.cellDrift(e, "vec_id", "embedding",
        TxLog.read(spark, centersBase)
          .select(col("seed_id"), col("sv").as("__sv")),
        TxLog.read(spark, assignBase))
      .select("cell", "drift").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    driftedCells.foreach { c =>
      postDrift.get(c).foreach(d =>
        assert(d < preDrift(c),
          s"cell $c drift must decrease: ${preDrift(c)} -> $d"))
    }
    // recall recovers (never regresses)
    val after = recallAt3(assignBase, centersBase)
    assert(after >= before, s"recall must not regress: $before -> $after")
    // fixpoint: at a threshold above the residual drift, maintain is
    // a no-op (no phantom churn)
    val residual = postDrift.values.foldLeft(0.0)(math.max)
    val (c2, m2) = Ivf.maintain(spark, e, "vec_id", "embedding",
      centersBase, assignBase, maxDrift = residual + 0.001)
    assert(c2 == 0L && m2 == 0L, "maintain above residual drift no-ops")
    assert(TxLog.latestVersion(spark, centersBase).contains(2L),
      "a no-op maintain publishes nothing")
  }
}
