package graft

import org.apache.spark.sql.SparkSession

/** One-off plan check: does the DSv2 txlog batch scan run COLUMNAR
  * (ColumnarToRow above BatchScan) on an unmasked snapshot, and fall
  * back to rows when deletion vectors are present? */
object ColumnarCheckMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    val base = "/tmp/graft_colcheck/t"
    graft.operators.TxLog.drop(spark, base)
    graft.operators.TxLog.commit(
      spark.range(100000).selectExpr("id AS k", "cast(id%7 as double) AS v"),
      base, None, Some("k"))
    val df = spark.read.format("graft.sources.TxLogSource").load(base)
    val plan = df.where("k between 10 and 500")
      .queryExecution.executedPlan.toString
    println("COLUMNAR=" + plan.contains("ColumnarToRow"))
    println("SUM=" + df.agg(org.apache.spark.sql.functions.sum("v"))
      .head.getDouble(0))
    graft.operators.TxLog.deleteRangeMor(spark, base, "k", 0, 5)
    val df2 = spark.read.format("graft.sources.TxLogSource").load(base)
    println("COLUMNAR_MASKED=" +
      df2.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    println("COUNT_MASKED=" + df2.count())
  }
}
