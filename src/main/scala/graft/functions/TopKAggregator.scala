package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k typed Aggregator (the brief's custom-sketch family,
  * via `org.apache.spark.sql.expressions.Aggregator`): keeps the k
  * highest-scoring (score, id) pairs per group with O(k) state, fully
  * map-side-combinable — the scalable replacement for sort+limit or a
  * whole-partition window when only the top k rows per key matter.
  * Deterministic: ties resolve to the smaller id, exactly matching
  * `row_number() OVER (ORDER BY score DESC, id ASC) <= k`.
  */
class TopKAggregator(k: Int)
  extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, s"k must be positive, got $k")

  // java.lang.Double.compare ranks NaN above every double — the same
  // NaN-greatest ordering Spark's DESC sort uses, keeping the
  // equivalence to the window formulation even for NaN scores.
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val cmp = java.lang.Double.compare(a._1, b._1)
    cmp > 0 || (cmp == 0 && a._2 < b._2)
  }

  private def insert(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    if (buf.length >= k && better(buf.last, in)) buf
    else {
      val (front, back) = buf.span(better(_, in))
      ((front :+ in) ++ back).take(k)
    }

  override def zero: Seq[(Double, Long)] = Vector.empty
  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    insert(buf, in)
  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.foldLeft(a)(insert)
  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
