package graft
import org.apache.spark.sql.SparkSession

/** Dumps jaccardPairs with a FORCED tiny stop-shingle cap (maxDf=2)
  * so tools/cap_check.py can diff it against the capped DuckDB oracle
  * with the same forced cap — proves the oracle mirror is semantically
  * exact where the filter is actually live, not just green because the
  * auto cap never fires at test SFs. */
object CapProbeMain {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = a.headOption.getOrElse("/root/testdata/sf0.01")
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    graft.operators.NearDup
      .jaccardPairs(docs, "doc_id", "text", n = 4, tau = 0.5, maxDf = 2)
      .orderBy("id_a", "id_b")
      .write.mode("overwrite").parquet("/tmp/cap_probe.parquet")
    spark.stop()
  }
}
