package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc probe: `sbt "Test/runMain graft.IntervalBenchProbeMain"` —
  * measures BroadcastIntervalJoinExec against Spark's default
  * BroadcastNestedLoopJoin on the point-in-interval shape as the
  * build side grows. The custom exec probes O(log n + matches) per
  * row; the nested loop compares every probe row against every
  * interval. */
object IntervalBenchProbeMain {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val nProbe = 2000000
    val probes = spark.range(nProbe.toLong)
      .select(col("id").as("pid"), (col("id") * 37L % 100000000L).as("p"))
      .cache()
    probes.count()

    def intervals(n: Int): DataFrame =
      (0 until n).map { k =>
        val lo = (k.toLong * 99991L) % 100000000L
        (k.toLong, lo, lo + 5000L)
      }.toDF("iid", "lo", "hi")

    def run(df: => DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = df.count()
      ((System.nanoTime() - t0) / 1e9, n)
    }

    for (nIv <- Seq(100, 1000, 10000)) {
      val iv = intervals(nIv)
      def joined = probes.join(broadcast(iv),
        col("p") >= col("lo") && col("p") <= col("hi"))
      spark.experimental.extraStrategies = Nil
      val (tNlj, rowsN) = run(joined)
      graft.plans.IntervalJoinStrategy.install(spark)
      val (tTree, rowsT) = run(joined)
      spark.experimental.extraStrategies = Nil
      require(rowsN == rowsT, s"row mismatch: $rowsN vs $rowsT")
      println(f"PROBE intervals=$nIv%6d rows=$rowsN%9d  nestedLoop=$tNlj%7.2f s  intervalTree=$tTree%6.2f s  speedup=${tNlj / tTree}%5.1fx")
    }
    spark.stop()
  }
}
