package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.RenameMap

/** The reference's bronze rename policy, property by property
  * (normalize_bronze_columns.py:11-50,88-129). */
class RenameMapSpec extends AnyFunSuite {
  val spark = SparkTestBase.spark
  import spark.implicits._

  test("autoName applies the reference's four replacements then lowercase") {
    assert(RenameMap.autoName("Extra Field, v1.2/beta") == "extra_field_v12_beta")
    assert(RenameMap.autoName("PRICE") == "price")
    assert(RenameMap.autoName("plain") == "plain")
  }

  test("map has 38 literal entries with unique ASCII targets") {
    assert(RenameMap.columnMapping.size == 38)
    val targets = RenameMap.columnMapping.map(_._2)
    assert(targets.distinct.size == targets.size)
    assert(targets.forall(t => t.matches("[a-z0-9_]+")))
  }

  test("normalize: skip-list drops raw address; mapped rename wins; duplicate collapses to first occurrence") {
    val df = Seq((1L, "a", "b", "c", "d")).toDF()
      .select(col("_1").as("list_id"), col("_2").as("price"),
        col("_3").as("address"), col("_4").as("Địa chỉ"),
        col("_5").as("PRICE"))
    val out = RenameMap.normalize(df)
    // address (skip-list) gone; Địa chỉ became address; PRICE collapsed into price.
    assert(out.columns.toSeq == Seq("list_id", "price", "address"))
    val row = out.collect().head
    assert(row.getString(out.columns.indexOf("price")) == "a")   // first occurrence kept
    assert(row.getString(out.columns.indexOf("address")) == "c") // from Địa chỉ, not the dropped raw address ("b")
  }

  test("normalizeDedup keeps the newest file_modification_time per list_id") {
    val df = Seq((7L, 1L, "old"), (7L, 2L, "new"), (8L, 1L, "only"))
      .toDF("list_id", "file_modification_time", "title")
    val out = RenameMap.normalizeDedup(df).orderBy("list_id")
      .select("list_id", "title").as[(Long, String)].collect().toSeq
    assert(out == Seq((7L, "new"), (8L, "only")))
  }

  test("syntheticBronze carries every mapped source column plus the three policy exercisers") {
    val orders = Tables(spark)
    val messy = RenameMap.syntheticBronze(orders)
    val srcs = RenameMap.columnMapping.map(_._1)
    assert(srcs.forall(messy.columns.contains))
    assert(Seq("address", "Extra Field, v1.2/beta", "PRICE").forall(messy.columns.contains))
    val out = RenameMap.normalizeDedup(messy)
    assert(out.columns.toSeq ==
      RenameMap.columnMapping.map(_._2) :+ "extra_field_v12_beta")
    // one row per residue class of o_orderkey % 50
    assert(out.count() == out.select("list_id").distinct().count())
  }

  private def Tables(s: org.apache.spark.sql.SparkSession) =
    graft.sources.Tables.load(s, SparkTestBase.sfDir, "orders")
}
