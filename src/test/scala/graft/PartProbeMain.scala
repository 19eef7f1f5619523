package graft
import org.apache.spark.sql.SparkSession
object PartProbeMain {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    for (t <- Seq("orders","lineitem","events","documents","customer")) {
      val df = graft.sources.Tables.load(spark, dir, t)
      println(s"PARTS $t -> ${df.rdd.getNumPartitions}")
    }
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1m")
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    println("PARTS lineitem@1m -> " + spark.read.parquet(s"$dir/lineitem.parquet").rdd.getNumPartitions)
    spark.stop()
  }
}
