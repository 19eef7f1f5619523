package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc probe: llm_fuzzy_pairs timing stability + candidate volume. */
object FuzzyProbeMain {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    import org.apache.spark.sql.functions._
    val d = graft.sources.Tables.load(spark, dir, "documents")
    // candidate volume before the levenshtein
    val side = d.select(col("doc_id").as("__id"), col("lang").as("__st"),
      col("n_chars").as("__len"))
    val bk = floor(col("__len") / 100).cast("long")
    val probes = side.withColumn("__bk", explode(array(bk - 1, bk, bk + 1)))
    val build = side.withColumn("__bk", bk)
    val cands = probes.as("a").join(build.as("b"), Seq("__st", "__bk"))
      .where(col("a.__id") < col("b.__id") &&
        abs(col("a.__len") - col("b.__len")) <= 50).count()
    println(s"PROBE candidates=$cands")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("llm_fuzzy_pairs")(spark, dir).count()
      println(f"PROBE rep$i rows=$n ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
