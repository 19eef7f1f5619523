package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc perf probe: `sbt "Test/runMain graft.PerfProbeMain"`.
  * Times plan variants at sf0.1 to localize bench hotspots. */
object PerfProbeMain {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"PROBE $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    import graft.sources.Tables
    import graft.models.RealEstate

    val raw = RealEstate.rawListings(Tables.load(spark, dir, "orders"),
      Tables.load(spark, dir, "customer"), Tables.load(spark, dir, "nation"),
      Tables.load(spark, dir, "region"))
    time("raw_only")(raw)
    val silver = RealEstate.silver(raw)
    time("silver_no_sort")(silver)
    time("silver_sorted")(silver.orderBy("property_id"))
    time("silver_again_warm")(silver)
    val docs = Tables.load(spark, dir, "documents")
    import graft.operators.NearDup
    time("jaccard4_pairs")(NearDup.jaccardPairs(docs, "doc_id", "text", 4, 0.5))
    // candidate volume for jaccard
    val post = docs.select(col("doc_id").as("id"),
      explode(graft.functions.TextFns.shingles(col("text"), 4)).as("sh"))
    val dfreq = post.groupBy("sh").count()
    println("PROBE postings=" + post.count() + " distinct_shingles=" + dfreq.count())
    println("PROBE sum_df2=" + dfreq.agg(sum(col("count") * col("count"))).head.get(0))
    time("minhash_pairs")(NearDup.minhashLshPairs(docs, "doc_id", "text", 2, 0.8))
    time("f2_normalize")(Tables.load(spark, dir, "customer").select(
      col("c_custkey"), initcap(lower(col("c_name"))).as("a"),
      trim(regexp_replace(concat(lit("  "), col("c_name"), lit("   x  ")), "\\s+", " ")).as("b"),
      lower(col("c_mktsegment")).as("c")).orderBy("c_custkey"))
    spark.stop()
  }
}
