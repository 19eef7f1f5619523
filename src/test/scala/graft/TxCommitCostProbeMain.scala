package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level cost of ONE TxLog commit on bench-sized data:
  * `sbt "Test/runMain graft.TxCommitCostProbeMain"`.
  * Times drop / land write / stats scan / publish separately so the
  * per-commit fixed overhead the whole registry pays is attributable.
  */
object TxCommitCostProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val ev = graft.sources.Tables.load(spark, dir, "events")
      .select("event_id", "user_id", "event_type", "value")
    import graft.operators.TxLog
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); r
    }
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        val t0s = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          t0s.put(js.jobId, js.time)
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          Option(t0s.remove(je.jobId)).foreach(t0 =>
            jobs.add((je.time - t0, s"job ${je.jobId}")))
      })
    for (round <- 1 to 3) {
      println(s"--- round $round ---")
      val base = "/tmp/graft_commitcost/t" + round
      t("drop")(TxLog.drop(spark, base))
      val df = ev.where(col("event_id") >= 500)
        .repartitionByRange(4, col("event_id"))
      // replicate commit() internals phase by phase
      t("commit_total")(TxLog.commit(df, base, None, Some("event_id")))
      jobs.clear()
      t("append_total")(TxLog.append(ev.where(col("event_id") < 500), base,
        Some("event_id")))
      Thread.sleep(200)
      import scala.jdk.CollectionConverters._
      println("  append jobs: " + jobs.asScala.toSeq
        .map(j => f"${j._1 / 1e3}%.3f").mkString(" "))
      val base2 = base + "_nostats"
      t("drop2")(TxLog.drop(spark, base2))
      t("commit_nostats")(TxLog.commit(df, base2, None, None))
      t("read_agg")(TxLog.read(spark, base)
        .agg(count(lit(1))).collect())
    }
    spark.stop()
  }
}
