package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Colocate
import graft.sources.Tables

class ColocateExtensionSpec extends AnyFunSuite {
  import SparkTestBase._

  test("bucketed co-located join plans with NO shuffle exchange") {
    val joined = Colocate.bucketedJoin(spark,
      Tables.load(spark, sfDir, "lineitem"), "l_orderkey",
      Tables.load(spark, sfDir, "orders"), "o_orderkey",
      buckets = 4, tablePrefix = "graft_test_bkt")
    val plan = joined.queryExecution.executedPlan.toString()
    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle either side:\n$plan")
    // and it returns the same rows as a plain join
    val plain = Tables.load(spark, sfDir, "lineitem")
      .join(Tables.load(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
    assert(joined.count() == plain.count())
  }

  test("graft_dot registers on an existing session and runs through SQL") {
    org.apache.spark.sql.graftbridge.ColumnBridge.registerFunction(
      spark, GraftExtensions.dotFunction)
    val v = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head.getDouble(0)
    assert(v == 11.0)
  }

  test("GraftExtensions wires the interval-join strategy into session build") {
    // the spark.sql.extensions=graft.GraftExtensions entry point:
    // builder extensions are silently ignored once a session exists,
    // so materialize what the extensions object would inject and pin
    // that the planner rung is among it
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val strategies = org.apache.spark.sql.graftbridge.ColumnBridge
      .plannerStrategies(ext, spark)
    assert(strategies.contains(graft.plans.IntervalJoinStrategy),
      s"extensions did not inject IntervalJoinStrategy: $strategies")
  }
}
