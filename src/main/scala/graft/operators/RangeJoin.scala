package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range join — pairs of rows whose timestamps fall within a
  * tolerance of each other (builder brief's "range join" family).
  *
  * The naive formulation `a JOIN b ON |a.ts - b.ts| <= tol` is a
  * non-equi join Spark plans as a nested loop. The scale shape here:
  * quantize time into buckets of width `tol` and equi-join on
  * (key, bucket), with each LEFT row probing its own and the two
  * adjacent buckets — every within-tolerance pair shares or straddles
  * a bucket boundary, so candidates are complete, and candidate
  * volume is Σ per-bucket |l|·|r| instead of |L|·|R|. The exact
  * tolerance predicate then filters candidates.
  */
object RangeJoin {

  /** Pairs (leftId, rightId) with same `key`, |leftTs-rightTs| <= tol
    * seconds. Output: key, left id, right id, gap_seconds. */
  def withinTolerance(left: DataFrame, right: DataFrame, key: String,
                      leftTs: String, leftId: String,
                      rightTs: String, rightId: String,
                      tolSeconds: Long): DataFrame = {
    require(tolSeconds > 0,
      "tolSeconds must be positive (bucket width; div-by-zero otherwise)")
    val lEpoch = unix_timestamp(col(leftTs))
    val rEpoch = unix_timestamp(col(rightTs))
    val l = left.select(col(key).as("__k"), col(leftId).as("left_id"),
        lEpoch.as("__lts"),
        explode(array(lit(-1L), lit(0L), lit(1L))).as("__probe"))
      .withColumn("__bucket", expr(s"__lts div $tolSeconds") + col("__probe"))
    val r = right.select(col(key).as("__k"), col(rightId).as("right_id"),
        rEpoch.as("__rts"))
      .withColumn("__bucket", expr(s"__rts div $tolSeconds"))
    l.join(r, Seq("__k", "__bucket"))
      .where(abs(col("__lts") - col("__rts")) <= tolSeconds)
      .select(col("__k").as(key), col("left_id"), col("right_id"),
        (col("__rts") - col("__lts")).as("gap_seconds"))
      .distinct()
  }
}
