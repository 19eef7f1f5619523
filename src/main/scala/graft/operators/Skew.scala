package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salting for skewed aggregation (builder brief: "salting for skew,
  * AQE for runtime re-plan"). A hot grouping key concentrates all its
  * rows in one reducer; salting splits each key into `saltBuckets`
  * sub-keys for the first (heavy) aggregation, then combines the
  * per-salt partials in a second (tiny) aggregation. Works for any
  * algebraic aggregate (count/sum/min/max decompose); the combine
  * stage touches only keys × buckets rows.
  *
  * AQE's skew-join handling covers the JOIN side of skew at runtime;
  * this operator covers the AGGREGATION side where the engine can't
  * re-plan on its own (the hot key is still one reduce group).
  */
object Skew {

  /** Salted equi-JOIN for a skewed probe side: the fact rows spread
    * over `saltBuckets` sub-keys via a deterministic salt, the (small)
    * build side replicates once per bucket (explode of a literal
    * range — `saltBuckets`× its size, fine for a dimension), and the
    * join key becomes (key, salt) so the hot key's rows land on
    * `saltBuckets` reducers instead of one. Semantically identical to
    * the plain inner join — the salt matches exactly one replica per
    * row. `saltOn` must be non-null (a null salt would silently drop
    * a fact row the plain join keeps); use a key/id column.
    *
    * This is the MANUAL mitigation for engines/paths where AQE's
    * runtime skew-join split can't see the skew (e.g. the skewed side
    * feeds from an exchange AQE already coalesced, or the join is
    * inside a cached subtree); prefer AQE where it applies. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltOn: Column, saltBuckets: Int = 8): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(saltOn), lit(saltBuckets.toLong)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Salted count+sum per key. `saltOn` must be a deterministic
    * expression spreading rows within a key (e.g. a unique id). */
  def saltedCountSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     saltOn: Column, saltBuckets: Int = 16): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(xxhash64(saltOn), lit(saltBuckets.toLong)))
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__n"),
        sum(col(valueCol).cast("decimal(18,6)")).as("__s"))
    partial.groupBy(keyCols.map(col): _*)
      .agg(sum(col("__n")).as("n"),
        sum(col("__s")).cast("double").as("sum_value"))
  }
}
