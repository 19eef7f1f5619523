package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Timing probe: planted-skew fact⋈dim sort-merge join, unmitigated
  * vs AQE runtime skew-split vs manual salting (Skew.saltedJoin) —
  * the BENCH_NOTES comparison behind the AqeSkewSpec witness. */
object AqeSkewProbeMain {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // 30M-row fact, 90% on one hot key; 997-key dim (too big to
    // broadcast under the disabled threshold)
    def fact = spark.range(0, 30000000L).select(
      when(col("id") % 10 < 9, 0L).otherwise(col("id") % 997).as("k"),
      col("id").as("v"))
    def dim = spark.range(0, 997).select(col("id").as("k"), (col("id") * 7).as("w"))
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)).as("n"), sum(col("v") + col("w")).as("chk"))
    def time(name: String)(f: => Array[org.apache.spark.sql.Row]): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $name%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f s  " +
        s"n=${r.head.getLong(0)} chk=${r.head.get(1)}")
    }
    def confs(kv: (String, String)*): Unit =
      kv.foreach { case (c, v) => spark.conf.set(c, v) }
    confs("spark.sql.autoBroadcastJoinThreshold" -> "-1")
    // warm-up
    agg(fact.join(dim, "k")).collect()
    (1 to 3).foreach { i =>
      confs("spark.sql.adaptive.skewJoin.enabled" -> "false")
      time(s"unmitigated-$i")(agg(fact.join(dim, "k")).collect())
      confs("spark.sql.adaptive.skewJoin.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8388608",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8388608",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0")
      time(s"aqe-split-$i")(agg(fact.join(dim, "k")).collect())
      confs("spark.sql.adaptive.skewJoin.enabled" -> "false")
      time(s"salted-$i")(agg(
        graft.operators.Skew.saltedJoin(fact, dim, "k", col("v"), 32)).collect())
    }
    spark.stop()
  }
}
