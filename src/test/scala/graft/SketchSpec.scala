package graft

import org.scalatest.funsuite.AnyFunSuite

/** Laws for Spark's mergeable sketch layer (`df.stat`): the
  * approximate companions to the exact count witnesses (a3–a5, a14)
  * and the HLL++ sketch already in the registry
  * (`a5_approx_distinct`). All three sketches build in ONE pass with
  * map-side merge (internally treeAggregate of mergeable sketch
  * buffers) — the data itself never shuffles, which is what makes
  * them the 100 TB profile/audit tool: constant-size driver result
  * regardless of input size. Fixed seeds / fixed fixture ⇒ the
  * assertions are deterministic, not flaky-probabilistic. */
class SketchSpec extends AnyFunSuite {
  import SparkTestBase._

  private lazy val ev = graft.sources.Tables.load(spark, sfDir, "events")

  test("count-min sketch never undercounts; overcount bounded by eps*n") {
    val n = ev.count()
    val eps = 0.01
    val cms = ev.stat.countMinSketch("user_id", eps, 0.99, 42)
    val exact = ev.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val overs = exact.map { case (k, c) =>
      val est = cms.estimateCount(k.asInstanceOf[Object])
      assert(est >= c, s"CMS undercounted key $k: $est < $c")
      est - c
    }
    // per-key Markov bound is probabilistic; the MAX over this fixed
    // (seed, fixture) pair is deterministic and must sit within the
    // standard eps*n envelope
    assert(overs.max <= (eps * n).toLong + 1,
      s"CMS overcount ${overs.max} exceeded eps*n = ${(eps * n).toLong}")
  }

  test("bloom filter has zero false negatives, fpp-bounded false positives") {
    val ids = ev.select("event_id").collect().map(_.getLong(0))
    val bloom = ev.stat.bloomFilter("event_id", ids.length.toLong, 0.01)
    ids.foreach(id => assert(bloom.mightContain(id),
      s"bloom false negative for inserted id $id"))
    // disjoint probe set: ids are small positives, so +1e12 never collides
    val falsePos = ids.count(id => bloom.mightContain(id + 1000000000000L))
    assert(falsePos <= math.max(5, ids.length / 20),
      s"bloom false-positive count $falsePos far above the 1% target")
  }

  test("approxQuantile (Greenwald-Khanna) respects the rank-error bound") {
    val rel = 0.01
    val approx = ev.stat.approxQuantile("value",
      Array(0.25, 0.5, 0.75), rel)
    val n = ev.count()
    val sorted = ev.select("value").na.drop()
      .orderBy("value").collect().map(_.getDouble(0))
    Array(0.25, 0.5, 0.75).zip(approx).foreach { case (q, a) =>
      // the GK guarantee is on RANK: the returned value's rank is
      // within rel*n of ceil(q*n)
      val rank = sorted.count(_ <= a)
      val target = math.ceil(q * sorted.length)
      assert(math.abs(rank - target) <= rel * n + 1,
        s"quantile $q: value $a at rank $rank vs target $target")
    }
  }

  test("freqItems returns every item above the support threshold") {
    val n = ev.count()
    val support = 0.1
    val found = ev.stat.freqItems(Array("event_type"), support)
      .collect()(0).getSeq[String](0).toSet
    val mandatory = ev.groupBy("event_type").count()
      .collect().filter(_.getLong(1) > support * n).map(_.getString(0)).toSet
    assert(mandatory.subsetOf(found),
      s"freqItems missed heavy items: ${mandatory.diff(found)}")
  }
}
