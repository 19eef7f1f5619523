package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc probe: `sbt "Test/runMain graft.StreamJoinProbeMain"`.
  * Times the stream-stream joins at sf0.1 under different state
  * partition counts to split micro-batch fixed cost from state-store
  * commit volume (partitions × 4 stores × batches for a join).
  */
object StreamJoinProbeMain {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String, parts: Int)(q: String): Unit = {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, dir).count()
      println(f"PROBE $name%-36s parts=$parts%2d rows=$n%7d ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    for (p <- Seq(32, 32, 8, 2)) {
      time("stream_stream_outer_join", p)("stream_stream_outer_join")
      time("stream_stream_join", p)("stream_stream_join")
    }
    spark.stop()
  }
}
