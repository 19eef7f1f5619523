package graft

import org.apache.spark.sql.SparkSession

/** ANSI-mode hardening sweep: run EVERY registry query under
  * `spark.sql.ansi.enabled=true` (the driver's entry() session has
  * ANSI on; Verify's does not — this closes the gap so no query is
  * one strict-cast away from a runtime error).
  * `sbt "Test/runMain graft.AnsiSweepMain [sfDir]"` → prints
  * ANSI_SWEEP failed=N; N must be 0. */
object AnsiSweepMain {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (a.nonEmpty) a(0) else "/root/testdata/sf0.001"
    var failed = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      try fn(spark, dir).write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          failed += 1
          println(s"ANSI_FAIL $n: ${e.getClass.getSimpleName} " +
            String.valueOf(e.getMessage).take(300))
      }
    }
    println(s"ANSI_SWEEP failed=$failed of ${SparkEntry.queries.size}")
    spark.stop()
  }
}
