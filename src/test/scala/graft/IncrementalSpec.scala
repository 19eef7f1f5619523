package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Incremental

class IncrementalSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private val src = Seq(
    (Some(1L), "a"), (Some(2L), "b"), (None: Option[Long], "c")
  ).toDF("k", "v")

  test("NOT IN: empty existing set keeps every src row, even NULL keys") {
    val existing = Seq.empty[Option[Long]].toDF("ek")
    assert(Incremental.notInExisting(src, existing, "k", "ek").count() == 3)
  }

  test("NOT IN: a NULL in the existing set yields zero rows (UNKNOWN)") {
    val existing = Seq(Some(9L), None: Option[Long]).toDF("ek")
    assert(Incremental.notInExisting(src, existing, "k", "ek").count() == 0)
  }

  test("NOT IN: non-empty set drops matches AND NULL-key src rows") {
    val existing = Seq(1L).toDF("ek")
    val out = Incremental.notInExisting(src, existing, "k", "ek")
      .select("v").as[String].collect().toSeq
    assert(out == Seq("b")) // 'a' matched, 'c' has NULL key -> UNKNOWN
  }

  test("watermark: empty existing falls back to 1970 epoch (keeps all)") {
    val s = Seq(("2024-01-01 00:00:00", 1), ("2024-01-02 00:00:00", 2))
      .toDF("ts_s", "n").withColumn("ts", col("ts_s").cast("timestamp"))
    val empty = s.limit(0)
    assert(Incremental.newerThanWatermark(s, empty, "ts", "ts").count() == 2)
  }

  test("file-set join variant matches the In-list variant and plans no literal list") {
    val base = "/tmp/graft_test_incr"
    src.where(col("k") === 1).write.mode("overwrite").parquet(s"$base/f_a")
    src.where(col("k") =!= 1 || col("k").isNull).write.mode("overwrite")
      .parquet(s"$base/f_b")
    val union = spark.read.parquet(s"$base/f_a", s"$base/f_b")
    val processedPaths = spark.read.parquet(s"$base/f_a")
      .select(col("_metadata.file_path")).distinct().as[String].collect().toSeq
    val viaList = Incremental.unprocessedFiles(union, processedPaths)
    val processedDf = processedPaths.toDF("path")
    val viaJoin = Incremental.unprocessedFilesJoin(union, processedDf, "path")
    assert(viaJoin.collect().toSet == viaList.collect().toSet)
    val plan = viaJoin.queryExecution.executedPlan.toString()
    assert(!plan.contains("file_path IN"), s"join variant leaked an In-list:\n$plan")
  }

  test("watermark is strictly greater: the max row itself is excluded") {
    val s = Seq(("2024-01-01 00:00:00", 1), ("2024-01-02 00:00:00", 2),
      ("2024-01-03 00:00:00", 3))
      .toDF("ts_s", "n").withColumn("ts", col("ts_s").cast("timestamp"))
    val existing = s.where(col("n") <= 2)
    val out = Incremental.newerThanWatermark(s, existing, "ts", "ts")
      .select("n").as[Int].collect().toSeq
    assert(out == Seq(3))
  }
}
