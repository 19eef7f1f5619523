package graft

import org.apache.spark.sql.SparkSession

/** Isolated 3-rep timing probe for s19_orc_roundtrip (VERDICT r9
  * "what's wrong" #1: 1.16 s → 4.10 s in the driver bench with zero
  * code change). Mirrors Bench's session shape at sf0.1 so the number
  * is comparable to BENCH_r{N}.json; component timings split the ORC
  * write from the read+agg so a reproduced regression points at the
  * guilty half.
  */
object OrcProbeMain {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val q = SparkEntry.queries("s19_orc_roundtrip")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    // warm the scan cache exactly like Bench's warm-up does
    time("warm-lineitem")(graft.sources.Tables.load(spark, dir, "lineitem").count())
    (1 to 3).foreach { i => time(s"s19-full-rep$i")(q(spark, dir).count()) }
    // component split: write vs read+agg
    import org.apache.spark.sql.functions._
    val path = graft.sources.Ingest.fixtureDir(dir) + "/lineitem_orc"
    (1 to 3).foreach { i =>
      time(s"s19-write-rep$i") {
        graft.sources.Tables.load(spark, dir, "lineitem")
          .select("l_orderkey", "l_partkey", "l_quantity",
            "l_extendedprice", "l_returnflag")
          .write.mode("overwrite").orc(path)
        0L
      }
      time(s"s19-read-rep$i") {
        spark.read.orc(path).where(col("l_quantity") > 25)
          .groupBy("l_returnflag").agg(count(lit(1)).as("n")).count()
      }
    }
    spark.stop()
  }
}
