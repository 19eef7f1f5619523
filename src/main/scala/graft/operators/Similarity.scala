package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`) — the
  * builder-prompt ANN family.
  *
  *  - [[cosine]]: cosine similarity of two vectors via higher-order
  *    functions (`zip_with` + `aggregate`), computed in double
  *    precision after an explicit float→double cast so results are
  *    bit-reproducible across engines (modulo final rounding).
  *  - [[bruteForceTopK]]: baseline exact top-k — broadcast the (small)
  *    query set against the corpus; one pass over the corpus per
  *    batch of queries, ranked with a per-query window. The corpus is
  *    never self-joined.
  *  - [[signLshPairs]]: the scale path for all-pairs similarity:
  *    deterministic sign-pattern LSH. Each of `bands` projections
  *    takes `bitsPerBand` consecutive dimensions and buckets vectors
  *    by the sign pattern; only pairs sharing a bucket in >=1 band are
  *    scored. Bucketing is a pure function of the data (no RNG), so an
  *    oracle can reproduce the identical candidate set. Recall for a
  *    pair at angle θ is 1-(1-(1-θ/π)^bitsPerBand)^bands — raise
  *    `bands` for higher recall. Candidate volume is
  *    Σ_buckets |bucket|² instead of N².
  */
object Similarity {

  /** Per-group vector centroids — the k-means/IVF training step (a
    * cluster assignment's mean vector) and the per-domain embedding
    * profile. One posexplode (64× row fan-out, still narrow) feeding
    * a map-side-combinable groupBy(group, dim) aggregate; components
    * are fixed to integer micro-units BEFORE summation so partial-agg
    * order cannot perturb the result, and the mean is exact integer
    * half-up division (engine-portable to the bit). */
  def groupCentroids(df: org.apache.spark.sql.DataFrame,
                     groupCol: String, vecCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    graft.sources.Tables.scaled(df)
      .select(col(groupCol), posexplode(col(vecCol)).as(Seq("dim", "__v")))
      .withColumn("dim", col("dim").cast("long"))
      .withColumn("__u",
        round(col("__v").cast("double") * 1000000).cast("long"))
      .groupBy(groupCol, "dim")
      .agg(sum("__u").as("__su"), count(lit(1)).as("n_vecs"))
      .withColumn("centroid",
        expr("""cast((2 * __su + cast(sign(__su) as bigint) * n_vecs)
                     div (2 * n_vecs) as double) / 1000000.0"""))
      .select(col(groupCol), col("dim"), col("centroid"), col("n_vecs"))
  }

  /** Cosine similarity in double precision, rounded to `digits` so the
    * last-ulp differences of engine-specific summation order vanish.
    * Dot products run on the codegen'd [[graft.functions.DotProduct]]
    * expression (same left-to-right summation as the higher-order
    * `aggregate(zip_with(...))` formulation, so results are identical
    * — just without per-element lambda dispatch). */
  def cosine(a: Column, b: Column, digits: Int = 4): Column =
    graft.functions.VectorFns.cosine(a, b, digits)

  /** Exact cosine top-k: for every row of `queries`, the k most
    * similar rows of `corpus` (self-matches excluded). Output:
    * (query_id, neighbor_id, cos_sim, rank). Ties broken by neighbor
    * id for determinism. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv")))
    val scored = graft.sources.Tables.scaled(
        corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv")))
      .join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
  }

  /** Int8 SCALAR QUANTIZATION (the SQ8 of Faiss/Milvus, per-vector
    * max-abs variant): each vector compresses to one `tinyint` code
    * per dimension — a 4× memory cut against float32 that is what
    * lets a 100 TB embedding corpus serve from RAM-adjacent storage.
    * `code_i = floor(x_i / s + 0.5)` with `s = max|x| / 127`
    * (`floor(+0.5)` instead of round() because its half-handling is
    * identical in every engine — the codes must be bit-reproducible
    * for the oracle). The crucial property for search: cosine over
    * the CODES needs no dequantization at all — the per-vector scales
    * cancel in the ratio, so quantized cosine is pure small-integer
    * arithmetic (every intermediate exact in a double; max code
    * product 127² and realistic dims keep sums ≪ 2^53).
    *
    * Output: (idCol, codes array<tinyint>, __scale) — the scale rides
    * for consumers that need approximate raw dots (dot ≈ s_a·s_b·Σ). */
  def sq8Quantize(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    graft.sources.Tables.scaled(df.select(col(idCol), col(vecCol)))
      .withColumn("__scale", expr(
        s"""greatest(aggregate($vecCol, cast(0.0 as double),
           |  (acc, x) -> greatest(acc, abs(cast(x as double)))) / 127.0d,
           |  1e-30d)""".stripMargin))
      .withColumn("codes", expr(
        s"""transform($vecCol, x ->
           |  cast(floor(cast(x as double) / __scale + 0.5d) as tinyint))"""
          .stripMargin))
      .drop(vecCol)

  /** Approximate top-k over SQ8 codes: quantize corpus and queries,
    * rank by integer-cosine (scales cancel — see [[sq8Quantize]]),
    * same broadcast-queries shape as [[bruteForceTopK]]. At corpus
    * scale the win is bandwidth: the scan reads 1-byte codes instead
    * of 4-byte floats, and the dot is small-int multiply-adds.
    * Output: (query_id, neighbor_id, qcos_sim, rank). */
  def sq8TopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(sq8Quantize(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"),
        col("codes").cast("array<double>").as("__qc")))
    val c = sq8Quantize(corpus, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"),
        col("codes").cast("array<double>").as("__cc"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("qcos_sim", cosine(col("__qc"), col("__cc")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("qcos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "qcos_sim", "rank")
  }

  /** Retrieval-quality evaluation — the eval harness every
    * training-data retrieval stack needs (recall/precision@k, MRR,
    * nDCG), computed against a RELEVANCE oracle (here: label
    * equality — the standard proxy when no judgment set exists).
    * `results` is any ranked retrieval output (query_id, neighbor_id,
    * rank); `truth` maps id → label. One broadcast join per side plus
    * one per-query aggregate — the eval costs O(results), never a
    * corpus pass. Metrics are rounded to 4dp so engine-specific FP
    * summation order (and libm log2 ulps) cannot leak into the
    * oracle compare. nDCG uses binary relevance: DCG = Σ rel/log2(r+1)
    * over the top `k`, IDCG = the perfect prefix of min(R, k). */
  def retrievalEval(results: DataFrame, truth: DataFrame,
                    idCol: String, labelCol: String,
                    k: Int, mrrDepth: Int): DataFrame = {
    val q = truth.select(col(idCol).as("query_id"),
      col(labelCol).as("__ql"))
    val n = truth.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("__nl"))
    val totals = truth.groupBy(col(labelCol).as("__ql"))
      .agg(count(lit(1)).as("__cnt"))
    val j = results
      .join(broadcast(q), "query_id")
      .join(broadcast(n), "neighbor_id")
      .withColumn("rel", (col("__ql") === col("__nl")).cast("int"))
    val per = j.groupBy("query_id", "__ql").agg(
      sum(when(col("rank") <= k, col("rel")).otherwise(0))
        .cast("long").as("__hits_k"),
      min(when(col("rel") === 1 && col("rank") <= mrrDepth, col("rank")))
        .as("__first_rel"),
      sum(when(col("rank") <= k,
          col("rel").cast("double") / log2(col("rank") + 1.0))
        .otherwise(0.0)).as("__dcg"))
    per.join(broadcast(totals), "__ql")
      .withColumn("n_relevant", (col("__cnt") - 1).cast("long"))
      .withColumn("__m", least(col("n_relevant"), lit(k.toLong)))
      .withColumn("__idcg", when(col("__m") >= 1, expr(
        "aggregate(sequence(1L, __m), cast(0.0 as double), " +
          "(acc, i) -> acc + 1.0d / log2(cast(i as double) + 1.0d))"))
        .otherwise(lit(0.0)))
      .select(
        col("query_id"), col("n_relevant"),
        round(when(col("n_relevant") > 0,
          col("__hits_k").cast("double") / col("n_relevant"))
          .otherwise(0.0), 4).as(s"recall_at_$k"),
        round(col("__hits_k").cast("double") / k, 4)
          .as(s"precision_at_$k"),
        round(coalesce(lit(1.0) / col("__first_rel"), lit(0.0)), 4)
          .as(s"mrr_at_$mrrDepth"),
        round(when(col("__idcg") > 0.0, col("__dcg") / col("__idcg"))
          .otherwise(0.0), 4).as(s"ndcg_at_$k"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): pairwise cosine comparison is confined WITHIN
    * pre-assigned clusters (a k-means cell id, here the `clusterCol`),
    * and ANY row with a lower-id >=tau partner is dropped — whether or
    * not that partner itself survived. This transitive-drop policy is
    * deliberately NOT the sequential keep-greedy (which would need an
    * iterative driver loop): on a similarity CHAIN a~b~c with a!~c it
    * drops both b and c where sequential greedy would keep c — a
    * conservative over-delete, chosen because it is expressible as
    * ONE join + anti-join and therefore deterministic and
    * oracle-checkable. The within-cluster confinement is what makes
    * the method tractable at corpus scale: pair work is Σ|cluster|²,
    * never N², and the self-join shuffles once on the cluster key.
    *
    * Returns the SURVIVORS (df rows minus dropped ids). */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    clusterCol: String, tau: Double): DataFrame = {
    val base = graft.sources.Tables.scaled(
        df.select(col(idCol).as("__id"), col(vecCol).as("__v"),
          col(clusterCol).as("__c")))
      .cache() // self-joined: one materialization, two readers
    val dropped = base.as("a")
      .join(base.as("b"),
        col("a.__c") === col("b.__c") && col("a.__id") < col("b.__id"))
      .withColumn("__cs", cosine(col("a.__v"), col("b.__v")))
      .where(col("__cs") >= tau)
      .select(col("b.__id")).distinct()
    df.join(dropped, df(idCol) === dropped("__id"), "left_anti")
  }

  /** Deterministic sign-LSH near-duplicate pairs: candidates =
    * vectors sharing the sign pattern of >=1 band of dimensions;
    * verified with exact cosine >= tau. Output (id_a, id_b, cos_sim),
    * id_a < id_b. */
  def signLshPairs(df: DataFrame, idCol: String, vecCol: String,
                   tau: Double, bands: Int = 3, bitsPerBand: Int = 8): DataFrame = {
    val base = graft.sources.Tables.scaled(
      df.select(col(idCol).as("__id"), col(vecCol).as("__v")))
    val banded = base.select(col("__id"), col("__v"),
      explode(array((0 until bands).map { b =>
        val bits = (0 until bitsPerBand).map { i =>
          when(element_at(col("__v"), b * bitsPerBand + i + 1) >= 0f,
            lit(1L << i)).otherwise(0L)
        }.reduce(_ + _)
        struct(lit(b).as("band"), bits.as("bkey"))
      }: _*)).as("bb"))
      .select(col("__id"), col("__v"), col("bb.band"), col("bb.bkey"))
      .cache() // self-joined: one materialization, two readers
    banded.as("x").join(banded.as("y"), Seq("band", "bkey"))
      .where(col("x.__id") < col("y.__id"))
      .select(col("x.__id").as("id_a"), col("y.__id").as("id_b"),
        col("x.__v").as("__va"), col("y.__v").as("__vb"))
      .distinct()
      .withColumn("cos_sim", cosine(col("__va"), col("__vb")))
      .where(col("cos_sim") >= tau)
      .select("id_a", "id_b", "cos_sim")
  }
}
