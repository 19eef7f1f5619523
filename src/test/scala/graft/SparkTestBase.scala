package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (forked test JVM). ANSI is
  * left ON — the driver's entry() session has it on, so operators must
  * be ANSI-safe (try_cast for lenient parses). */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}
