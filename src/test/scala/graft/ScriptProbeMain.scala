package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc probe: Spark 4.1 SQL scripting surface. */
object ScriptProbeMain {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.scripting.enabled", "true")
    spark.range(100).createOrReplaceTempView("t")
    val df = spark.sql("""
      BEGIN
        DECLARE total BIGINT DEFAULT 0;
        DECLARE i INT DEFAULT 0;
        WHILE i < 5 DO
          SET total = total + (SELECT count(*) FROM t WHERE id % 5 = i);
          SET i = i + 1;
        END WHILE;
        SELECT total AS n_rows;
      END""")
    df.show()
    spark.stop()
  }
}
