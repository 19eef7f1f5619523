package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.functions.{TextFns, TopKAggregator}
import graft.operators.Upsert

/** Property-based laws for the operator cores, via raw ScalaCheck
  * (the scalatest bridge isn't on the offline classpath). Spark-side
  * equivalents are covered by the oracle-checked registry queries;
  * these fuzz the pure logic across arbitrary inputs. */
class PropertySpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private def check(name: String, prop: Prop, n: Int = 60): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$name: $res")
  }

  test("TopKAggregator == sort-take(k) for arbitrary inputs, any merge split") {
    val agg = new TopKAggregator(3)
    val rows = Gen.listOf(Gen.zip(Gen.chooseNum(-100.0, 100.0), Gen.chooseNum(0L, 50L)))
    check("topk", Prop.forAll(rows, Gen.chooseNum(0, 100)) { (xs0, cut) =>
      val xs = xs0.distinct
      val expected = xs.sortBy { case (s, id) => (-s, id) }.take(3)
      val (a, b) = xs.splitAt(cut % (xs.length + 1))
      val bufA = a.foldLeft(agg.zero)(agg.reduce)
      val bufB = b.foldLeft(agg.zero)(agg.reduce)
      agg.finish(agg.merge(bufA, bufB)) == expected
    })
  }

  test("merge law: result keys = target ∪ source keys; source wins on overlap") {
    val kv = Gen.listOf(Gen.zip(Gen.chooseNum(0L, 20L), Gen.alphaStr.map(_.take(5))))
    check("merge", Prop.forAll(kv, kv) { (t0, s0) =>
      val t = t0.toMap.toList // precondition: unique keys per side
      val sv = s0.toMap.toList
      val out = Upsert.merge(t.toDF("k", "v"), sv.toDF("k", "v"), Seq("k"))
        .as[(Long, String)].collect().toMap
      out.keySet == (t.map(_._1) ++ sv.map(_._1)).toSet &&
        sv.forall { case (k, v) => out(k) == v } &&
        t.filterNot(x => sv.exists(_._1 == x._1))
          .forall { case (k, v) => out(k) == v }
    }, n = 12) // each case runs Spark jobs; keep the count bounded
  }

  test("rolling fingerprint: fold equivalence for arbitrary ASCII strings") {
    def expected(s: String): Long =
      s.foldLeft(0L)((acc, ch) => (acc * 131 + ch.toLong) % 1000000007L)
    val strs = Gen.nonEmptyListOf(Gen.asciiPrintableStr.map(_.take(40)))
    check("fingerprint", Prop.forAll(strs) { xs =>
      val got = xs.toDF("text")
        .select(TextFns.rollingFingerprint(col("text"))).as[Long].collect().toSeq
      got == xs.map(expected)
    }, n = 12)
  }
}
