package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc probe: `sbt "Test/runMain graft.LlmPerfProbeMain"` — times
  * the LLM-family bench hotspots and their shared sub-stages at sf0.1
  * to localize where the seconds go. */
object LlmPerfProbeMain {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = f.count()
      println(f"PROBE $name%-32s rows=$n%8d ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    for (_ <- 1 to 2) {
      time("llm_quality_filter")(SparkEntry.queries("llm_quality_filter")(spark, dir))
      time("llm_dedup_keep_best")(SparkEntry.queries("llm_dedup_keep_best")(spark, dir))
      time("llm_containment_pairs")(SparkEntry.queries("llm_containment_pairs")(spark, dir))
      time("llm_tfidf_top_terms")(SparkEntry.queries("llm_tfidf_top_terms")(spark, dir))
      time("multimodal_binary_ingest")(SparkEntry.queries("multimodal_binary_ingest")(spark, dir))
    }
    // sub-stages
    val d = graft.sources.Tables.load(spark, dir, "documents")
    time("sub:repetitionStats")(graft.operators.TextAnalysis.repetitionStats(d, "doc_id", "text"))
    time("sub:qualityScore")(d.select(graft.operators.TextAnalysis.qualityScore(
      org.apache.spark.sql.functions.col("text")).as("q")))
    time("sub:minhashPairs")(graft.operators.NearDup.minhashLshPairs(d, "doc_id", "text", 2, 0.8))
    spark.stop()
  }
}
