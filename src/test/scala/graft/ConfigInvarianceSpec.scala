package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Config-scale invariance law (VERDICT r9 next-round #5): the engine
  * targets a 1000-executor cluster but every other law runs at one
  * partition count — any result that silently depends on
  * `spark.sql.shuffle.partitions` (merge order, per-partition
  * sampling, shard assignment: the a17/a13 bug class) would pass
  * every fixed-conf gate and then diverge on a real cluster. This
  * spec re-runs a representative query slice at 4 and 256 shuffle
  * partitions and requires IDENTICAL canonical results — same
  * column-sorted, row-sorted rendering the driver's oracle hash uses.
  *
  * Slice choice: one broadcast star join, the windowed dedup, a
  * banded near-dup (multi-shuffle), the order-sensitive aggregates
  * that were the historical bug class (string_agg, moments), the
  * percentile cutoffs, md5-bucket shard assignment, and one
  * watermarked stream (its state-store partition sizing rides
  * StreamTune, independent of the session conf — the law pins that
  * independence too). */
class ConfigInvarianceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val slice = Seq(
    "j1_star_join_agg",
    "w1_dedup_latest",
    "llm_minhash_pairs",
    "a13_string_agg",
    "a17_moments",
    "llm_quality_percentiles",
    "llm_shuffle_shards",
    "stream_daily_counts",
    // the merge-on-read path: mask computation (row_index positions),
    // the DV anti-join, and the sidecar repartition must all be
    // partition-count independent
    "s39_mor_delete",
    // BM25: per-term conditional aggregation and TakeOrdered top-k
    "llm_bm25_search")

  private def render(v: Any): String = v match {
    case null => "∅"
    case a: Array[Byte] => a.map(b => f"$b%02x").mkString
    case a: Array[_] => a.map(render).mkString("[", ",", "]")
    case s: scala.collection.Seq[_] => s.map(render).mkString("[", ",", "]")
    case r: org.apache.spark.sql.Row => r.toSeq.map(render).mkString("(", ",", ")")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => render(k) + "->" + render(x) }
        .toSeq.sorted.mkString("{", ",", "}")
    case x => x.toString
  }

  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect().toSeq
      .map(_.toSeq.map(render).mkString("")).sorted
  }

  private def at(parts: Int, name: String): Seq[String] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try canon(SparkEntry.queries(name)(spark, SparkTestBase.sfDir))
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  slice.foreach { name =>
    test(s"$name: identical results at shuffle.partitions=4 and =256") {
      val lo = at(4, name)
      val hi = at(256, name)
      assert(lo.nonEmpty, s"$name returned no rows — vacuous law")
      assert(lo == hi,
        s"$name diverges with partition count:\n  only@4: " +
          s"${(lo.toSet -- hi.toSet).take(3)}\n  only@256: " +
          s"${(hi.toSet -- lo.toSet).take(3)}")
    }
  }
}
