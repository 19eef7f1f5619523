package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Wall-clock of the land-time footer-stats harvest vs file count
  * (diagnostic, VERDICT r15 #2 "done" evidence): commits the SAME
  * rows split into 16 / 64 / 256 files and times the driver-side
  * post-write phase (commit wall minus the write job, measured via a
  * job listener). With the bounded-pool harvest the per-file footer
  * open cost amortizes across threads, so the post-write driver time
  * should stay near-flat as the file count grows 16x. */
object FooterHarvestProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
    val jobMs = new java.util.concurrent.atomic.AtomicLong()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, js.time)
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        Option(starts.remove(je.jobId)).foreach(t0 =>
          jobMs.addAndGet(je.time - t0): Unit)
    })
    val ev = graft.sources.Tables.load(spark, "/root/testdata/sf0.1", "events")
      .select("event_id", "user_id", "event_type", "value")
    spark.range(1000000).selectExpr("sum(id*2)").collect() // warm JIT
    (1 to 2).foreach { pass =>
      println(s"== pass $pass ==")
      for (n <- Seq(16, 64, 256)) {
        val base = s"/tmp/graft_footer_probe/n$n"
        graft.operators.TxLog.drop(spark, base)
        jobMs.set(0L)
        val t0 = System.nanoTime()
        graft.operators.TxLog.commit(
          ev.repartition(n), base, None, Some("event_id"))
        Thread.sleep(200) // listener drain
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"  files=$n%4d commit=$wall%6.3f s jobTime=${jobMs.get / 1e3}%6.3f s driverSide=${wall - jobMs.get / 1e3}%6.3f s")
      }
    }
    spark.stop()
  }
}
