package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Encoders
import graft.functions.TopKAggregator

class TopKAggregatorSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private val topk = udaf(new TopKAggregator(2),
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))

  test("keeps k best with smaller-id tiebreak, across partition merges") {
    val df = Seq(
      (1L, 5.0, 10L), (1L, 5.0, 11L), (1L, 9.0, 12L), (1L, 1.0, 13L),
      (2L, 3.0, 20L)
    ).toDF("k", "score", "id").repartition(4) // force buffer merges
    val out = df.groupBy("k").agg(topk(col("score"), col("id")).as("top"))
      .select(col("k"), col("top")).as[(Long, Seq[(Double, Long)])]
      .collect().toMap
    assert(out(1L) == Seq((9.0, 12L), (5.0, 10L))) // tie 5.0: id 10 < 11 wins
    assert(out(2L) == Seq((3.0, 20L)))
  }

  test("NaN ranks first, matching Spark's NaN-greatest DESC ordering") {
    val df = Seq((1L, Double.NaN, 1L), (1L, 5.0, 2L), (1L, 7.0, 3L))
      .toDF("k", "score", "id")
    val out = df.groupBy("k").agg(topk(col("score"), col("id")).as("top"))
      .select("top").as[Seq[(Double, Long)]].head()
    assert(out.map(_._2) == Seq(1L, 3L)) // NaN first, then 7.0
    assert(out.head._1.isNaN)
  }

  test("k = 0 is rejected at construction") {
    intercept[IllegalArgumentException] { new TopKAggregator(0) }
  }

  test("empty groups never appear; k larger than group size returns all") {
    val df = Seq((1L, 2.0, 1L)).toDF("k", "score", "id")
    val out = df.groupBy("k").agg(topk(col("score"), col("id")).as("top"))
      .select("top").as[Seq[(Double, Long)]].head()
    assert(out == Seq((2.0, 1L)))
  }
}
