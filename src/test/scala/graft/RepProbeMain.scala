package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Component timings for repetitionStats (why 4.6s vs 0.7s peers?). */
object RepProbeMain {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val d = graft.sources.Tables.load(spark, dir, "documents")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    time("warm-scan")(d.count())
    val toks = graft.sources.Tables.scaled(d)
      .select(col("doc_id"), explode(graft.functions.TextFns.tokens(col("text"))).as("__t"))
    time("explode-count")(toks.count())
    time("tokAgg")(toks.groupBy("doc_id", "__t").agg(count(lit(1)).as("__c"))
      .groupBy("doc_id").agg(max("__c"), sum("__c")).count())
    val tri = d.select(col("doc_id"),
      size(graft.functions.TextFns.shingles(col("text"), 3)).as("__td"),
      greatest(size(graft.functions.TextFns.tokens(col("text"))) - 2, lit(0)).as("__tt"))
    time("tri-expr")(tri.count())
    time("full-count")(graft.operators.TextAnalysis.repetitionStats(d, "doc_id", "text").count())
    time("full-noop") {
      val df = graft.operators.TextAnalysis.repetitionStats(d, "doc_id", "text").orderBy("doc_id")
      df.write.format("noop").mode("overwrite").save(); df.count()
    }
    time("tri-noop") {
      val df = d.select(col("doc_id"),
        size(graft.functions.TextFns.shingles(col("text"), 3)).cast("long").as("td"))
      df.write.format("noop").mode("overwrite").save(); df.count()
    }
    spark.stop()
  }
}
