package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator Spark's built-ins don't provide directly
  * (builder brief's custom-operator family). Implemented by
  * COMPOSITION (preference (a) in the brief's ladder): tag-union both
  * sides, sort within key by event time, and carry the most recent
  * right-side payload forward with `last_value(..., ignoreNulls)` —
  * ONE shuffle on the key and a per-partition sort, instead of the
  * naive inequality join (which Spark would plan as a broadcast
  * nested loop and a 100 TB cross-product).
  *
  * Matching is inclusive: a right row at exactly the left row's
  * timestamp is visible; ties among right rows resolve to the highest
  * `rightId` (deterministic).
  */
object AsOf {

  /** For every left row, attach the payload (id) of the latest right
    * row with rightTs <= leftTs for the same key. Output: left's key,
    * id, ts + `asof_<rightId>` (NULL when no right row precedes). */
  def lastBefore(left: DataFrame, right: DataFrame, key: String,
                 leftTs: String, leftId: String,
                 rightTs: String, rightId: String): DataFrame = {
    // Preserve the callers' id types — a fixed cast would silently
    // NULL non-numeric ids and corrupt the match output.
    val lidType = left.schema(left.schema.fieldIndex(leftId)).dataType
    val ridType = right.schema(right.schema.fieldIndex(rightId)).dataType
    val l = left.select(col(key).as("__k"), col(leftTs).as("__ts"),
      lit(1).as("__side"), col(leftId).as("__lid"),
      lit(null).cast(ridType).as("__rid"))
    val r = right.select(col(key).as("__k"), col(rightTs).as("__ts"),
      lit(0).as("__side"), lit(null).cast(lidType).as("__lid"),
      col(rightId).as("__rid"))
    // Right rows sort BEFORE left rows at equal ts (inclusive match);
    // among right rows, ascending id so last_value picks the max.
    val w = Window.partitionBy("__k")
      .orderBy(col("__ts").asc, col("__side").asc, col("__rid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__rid"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(col("__k").as(key), col("__lid").as(leftId),
        col("__ts").as(leftTs), col("__asof").as(s"asof_$rightId"))
  }
}
