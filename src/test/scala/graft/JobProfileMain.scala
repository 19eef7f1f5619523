package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB wall-time decomposition of registry queries:
  * `sbt "Test/runMain graft.JobProfileMain <query> [query ...]"`.
  *
  * Runs each named query once at sf0.1 (noop sink, same as the bench)
  * with a listener recording every Spark job's duration and call site,
  * then prints jobs in submission order plus the query's driver-side
  * gap (wall − Σjob) — the number that tells fixture-machinery cost
  * (manifest I/O, planning, fs ops) apart from executor work.
  */
object JobProfileMain {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        jobs.put(js.jobId, (js.time, site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (t0, site) =>
          done.add((je.jobId, je.time - t0, site))
        }
      }
    })

    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    SparkEntry.prepare(spark, dir)

    for (q <- args) {
      done.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      import scala.jdk.CollectionConverters._
      val ds = done.asScala.toSeq.sortBy(_._1)
      println(s"==== $q wall=${"%.2f".format(wall)}s jobs=${ds.size} " +
        s"jobSum=${"%.2f".format(ds.map(_._2).sum / 1e3)}s " +
        s"gap=${"%.2f".format(wall - ds.map(_._2).sum / 1e3)}s ====")
      ds.foreach { case (id, ms, site) =>
        println(f"  job $id%4d ${ms / 1e3}%7.3f s  $site")
      }
    }
    spark.stop()
  }
}
