package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Quality, Upsert}

class UpsertQualitySpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  test("merge: source wins on matched keys, unmatched target survives") {
    val target = Seq((1L, "old1"), (2L, "old2")).toDF("k", "v")
    val source = Seq((2L, "new2"), (3L, "new3")).toDF("k", "v")
    val out = Upsert.merge(target, source, Seq("k"))
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "old1"), (2L, "new2"), (3L, "new3")))
  }

  test("merge: schema-evolving source widens the result (mergeSchema analog)") {
    val target = Seq((1L, "old1")).toDF("k", "v")
    val source = Seq((2L, "new2", 42)).toDF("k", "v", "extra")
    val out = Upsert.merge(target, source, Seq("k")).orderBy("k")
    assert(out.columns.toSeq == Seq("k", "v", "extra"))
    val rows = out.collect()
    assert(rows(0).isNullAt(2) && rows(1).getInt(2) == 42)
  }

  test("quality report: zero configured checks returns empty frame, no throw") {
    val df = Seq((1, "x")).toDF("a", "b")
    val out = Quality.report(df, Nil, Nil, Map.empty)
    assert(out.columns.toSeq == Seq("check_name", "n_violations"))
    assert(out.count() == 0)
  }

  test("quality report: accepted_values lets NULLs pass (dbt semantics)") {
    val df = Seq(Some("VALID"), Some("BOGUS"), None).toDF("flag")
    val out = Quality.report(df, Nil, Nil, Map("flag" -> Seq("VALID")))
      .as[(String, Long)].collect().toMap
    assert(out("accepted_values_flag") == 1L) // only BOGUS, not the NULL
  }

  test("quality report: single pass counts not-null and unique violations") {
    val df = Seq((1, Some("a")), (1, Some("b")), (2, None: Option[String]))
      .toDF("k", "v")
    val out = Quality.report(df, Seq("k"), Seq("v"), Map.empty)
      .as[(String, Long)].collect().toMap
    assert(out("unique_k") == 1L)    // key 1 duplicated
    assert(out("not_null_v") == 1L)  // one NULL v
  }
}
