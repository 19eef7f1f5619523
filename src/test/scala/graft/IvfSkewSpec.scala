package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Ivf, Skew}
import graft.sources.Tables

class IvfSkewSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  test("salted aggregation equals plain groupBy exactly") {
    val ev = Tables.load(spark, sfDir, "events")
    val salted = Skew.saltedCountSum(ev, Seq("event_type"), "value",
      saltOn = col("event_id"), saltBuckets = 8)
    val plain = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("IVF assignment puts every vector in exactly one cell") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val assigned = Ivf.assign(e, "vec_id", "embedding", seedEvery = 50)
    assert(assigned.count() == e.count())
    assert(assigned.select("vec_id").distinct().count() == e.count())
  }

  test("IVF search: at most k rows per query, ranks contiguous, no self-match") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val out = Ivf.search(e, e.where(col("vec_id") % 50 === 0),
      "vec_id", "embedding", seedEvery = 50, nProbe = 2, k = 3).collect()
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.values.forall(_.length <= 3))
    byQ.values.foreach { rows =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rows.length))
    }
    assert(out.forall(r => r.getAs[Long]("query_id") != r.getAs[Long]("neighbor_id")))
  }

  test("IVF recall against brute force is nontrivial at nProbe=2") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val q = e.where(col("vec_id") % 50 === 0)
    val exact = graft.operators.Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Ivf.search(e, q, "vec_id", "embedding", 50, 2, 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    assert(recall > 0.0, s"IVF found none of the exact top-3 (recall=$recall)")
  }
}
