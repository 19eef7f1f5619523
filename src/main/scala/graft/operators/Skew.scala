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
