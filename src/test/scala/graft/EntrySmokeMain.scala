package graft
import org.apache.spark.sql.SparkSession

/** Manual smoke runner for the driver's entry() contract:
  * `sbt "Test/runMain graft.EntrySmokeMain"`. Mirrors the driver's
  * default-session conditions (ANSI on, no special confs). */
object EntrySmokeMain {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    println("ENTRY_ROWS=" + df.count())
    df.show(3, truncate = false)
    spark.stop()
  }
}
