package graft
import org.apache.spark.sql.SparkSession

/** Round-9 probe: stream_session_window benched 1.99 s (r7, reps=1)
  * then 7.12 s (r8, median of 3) with byte-identical code. Isolate:
  * run it alone, then in the bench's alphabetical neighborhood
  * (stream_paged_json_source directly precedes it since r8), at
  * sf0.1 under bench-identical session settings.
  * `sbt "Test/runMain graft.SessionWindowProbeMain"` */
object SessionWindowProbeMain {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(q: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $name%-44s $s%8.2f s")
      s
    }
    // bench does a codegen warmup + prepare
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    SparkEntry.prepare(spark, dir)
    // isolated: 3 reps of session_window alone
    (1 to 3).foreach(i => time(s"isolated_rep$i")("stream_session_window"))
    // neighborhood order as the bench runs it
    (1 to 3).foreach { i =>
      time(s"paged_json_rep$i")("stream_paged_json_source")
      time(s"after_paged_rep$i")("stream_session_window")
    }
    spark.stop()
  }
}
