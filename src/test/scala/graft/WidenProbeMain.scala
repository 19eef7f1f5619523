package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
object WidenProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val d = "/tmp/widenprobe/t1"
    Seq((1, java.sql.Date.valueOf("2024-03-05"), 2.5f, 100L))
      .toDF("i", "dt", "f", "l").write.mode("overwrite").parquet(d)
    def tryRead(s: StructType, label: String): Unit =
      try {
        val r = spark.read.schema(s).parquet(d).collect()(0)
        println(s"PROBE OK   $label -> ${r.toSeq}")
      } catch { case e: Throwable =>
        println(s"PROBE FAIL $label -> ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}")
      }
    def base(t: DataType, col: String = "i") = StructType(Seq(
      StructField("i", if (col == "i") t else IntegerType),
      StructField("dt", if (col == "dt") t else DateType),
      StructField("f", if (col == "f") t else FloatType),
      StructField("l", if (col == "l") t else LongType)))
    tryRead(base(LongType), "int->long")
    tryRead(base(DoubleType), "int->double")
    tryRead(base(DecimalType(10, 0)), "int->decimal(10,0)")
    tryRead(base(DecimalType(12, 2)), "int->decimal(12,2)")
    tryRead(base(TimestampNTZType, "dt"), "date->timestamp_ntz")
    tryRead(base(TimestampType, "dt"), "date->timestamp")
    tryRead(base(DoubleType, "f"), "float->double")
    tryRead(base(DecimalType(20, 0), "l"), "long->decimal(20,0)")
    tryRead(base(DoubleType, "l"), "long->double")
    spark.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
    println("PROBE --- vectorized OFF ---")
    tryRead(base(DoubleType), "int->double")
    tryRead(base(DecimalType(12, 2)), "int->decimal(12,2)")
    tryRead(base(TimestampNTZType, "dt"), "date->timestamp_ntz")
    tryRead(base(DecimalType(20, 0), "l"), "long->decimal(20,0)")
    spark.conf.set("spark.sql.parquet.enableVectorizedReader", "true")
  }
}
