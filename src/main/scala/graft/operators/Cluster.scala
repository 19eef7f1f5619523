package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over the near-duplicate pair graph — the
  * step that turns pairwise detections ([[NearDup]]) into actionable
  * dedup: every document gets a cluster id (the minimum doc id
  * reachable through dup edges) and the cluster minimum is the
  * canonical representative to KEEP; everything else is the drop set.
  * The reference stops at latest-wins dedup on an exact key; at LLM
  * corpus scale near-dup clusters are transitive chains (a~b, b~c
  * with a,c below threshold) and pair output alone under-deletes.
  *
  * Algorithm: iterative min-label propagation. Each round every node
  * takes the min of its own label and its neighbors' labels — one
  * shuffle (edge⋈label join + groupBy min) per round, converging in
  * O(graph diameter) rounds. Dup clusters are near-cliques (diameter
  * 2-3 in practice), so the loop is short; `maxIter` bounds the
  * pathological chain. The per-round driver action is a single scalar
  * (changed-label count) — labels themselves never leave executors.
  * At 1000-executor scale the same loop holds: each round is a
  * key-partitioned shuffle of |E|+|V| rows, no broadcast of anything
  * unbounded. (The alternating large-star/small-star variant halves
  * round count on high-diameter graphs; for near-clique dup graphs
  * plain propagation reaches fixpoint in fewer total shuffles.)
  */
object Cluster {

  /** (node, cluster_id) for every node appearing in `pairs`, where
    * cluster_id = min node id in the connected component. */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 25): DataFrame = {
    // Materialize the pair detector's output ONCE before anything
    // forks the lineage: edges unions two branches of it and the
    // label frame derives from edges — without this pin, the first
    // loop action would recompute the (expensive) detector once per
    // un-cached branch.
    val fwd = pairs.select(col(aCol).as("src"), col(bCol).as("dst")).cache()
    fwd.count()
    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().cache()
    // Seed each node with min(self, direct neighbors) — one aggregate
    // over the edge list instead of an identity init. Costs nothing
    // extra (the identity init also scanned edges) and saves a full
    // propagation round; near-clique dup graphs then converge in one
    // confirming round.
    var labels = edges
      .select(col("src").as("node"), least(col("src"), col("dst")).as("label"))
      .groupBy("node").agg(min("label").as("label"))
    var prevCache: Option[DataFrame] = None
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val nbrMin = edges.join(labels, edges("dst") === labels("node"))
        .groupBy(edges("src").as("nb_node"))
        .agg(min("label").as("nbr_min"))
      val stepped = labels.join(nbrMin, labels("node") === nbrMin("nb_node"), "left")
        .select(col("node"), col("label"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("next_label"))
        .cache()
      // One action per round: the changed-count scan populates the
      // cache for every partition as a side effect.
      changed = stepped.where(col("next_label") < col("label")).count()
      prevCache.foreach(_.unpersist())
      prevCache = Some(stepped)
      labels = stepped.select(col("node"), col("next_label").as("label"))
      i += 1
    }
    // Fail LOUDLY on non-convergence: returning partially-propagated
    // labels would silently split components (wrong dedup decisions).
    // Dup graphs converge in 2-4 rounds; hitting this means a
    // pathological chain — raise maxIter, don't weaken the check.
    require(changed == 0,
      s"connectedComponents did not converge within $maxIter rounds " +
        s"($changed labels still changing); raise maxIter")
    // The final labels are already materialized: the last round's
    // changed-count action scanned every partition of the cached
    // `stepped`, and `labels` is a pure projection of it — a separate
    // count here would be one redundant job per clustering call.
    // Releasing the loop-only inputs (fwd, edges) is safe for the same
    // reason; if the final cache is ever evicted, recompute is slower
    // but still correct.
    val out = labels.withColumnRenamed("label", "cluster_id")
    fwd.unpersist()
    edges.unpersist()
    out
  }

  /** Cluster assignment for a whole corpus: docs absent from the pair
    * graph are their own singleton cluster; `is_canonical` marks the
    * one row per cluster to keep. */
  def dupClusters(docs: DataFrame, idCol: String, pairs: DataFrame,
                  aCol: String, bCol: String): DataFrame = {
    val cc = connectedComponents(pairs, aCol, bCol)
    docs.select(col(idCol))
      .join(cc, docs(idCol) === cc("node"), "left")
      .select(col(idCol),
        coalesce(col("cluster_id"), col(idCol)).as("cluster_id"))
      .withColumn("is_canonical", col(idCol) === col("cluster_id"))
  }
}
