package graft
object CountMain {
  def main(a: Array[String]): Unit = {
    println(s"QUERIES=${SparkEntry.queries.size} ORACLES=${SparkEntry.oracleSql.size}")
  }
}
