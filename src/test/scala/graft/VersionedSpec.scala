package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Versioned

/** Evidence for the snapshot store and the optimizer-driven scan
  * reductions: writing a new version never touches older versions'
  * files, time-travel reads are partition-pruned, vacuum deletes
  * exactly the aged-out versions, DPP injects a runtime partition
  * filter, and CBO statistics (not hints) flip the join strategy. */
class VersionedSpec extends AnyFunSuite {
  import SparkTestBase._

  private val sf01 = "/root/testdata/sf0.01"

  test("writing version 2 leaves version 1's files byte-identical") {
    val base = graft.sources.Ingest.fixtureDir(sf01) + "/versioned_spec"
    val ev = graft.sources.Tables.load(spark, sf01, "events")
      .select(col("event_id"), col("value"), to_date(col("ts")).as("day"))
    Versioned.writeSnapshot(ev.where(col("day") < lit("2024-01-11").cast("date")),
      base, 1)
    def v1Files = new java.io.File(s"$base/v=1")
      .listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.length, f.lastModified)).sortBy(_._1).toSeq
    val before = v1Files
    Versioned.writeSnapshot(ev.where(col("day") < lit("2024-01-21").cast("date")),
      base, 2)
    assert(v1Files == before, "v=1 files changed when v=2 was written")
    // time travel: v1 read-back equals the v1 input exactly
    val v1 = Versioned.snapshot(spark, base, 1)
    val expected = ev.where(col("day") < lit("2024-01-11").cast("date"))
    assert(v1.exceptAll(expected).isEmpty && expected.exceptAll(v1).isEmpty)
  }

  test("time-travel read partition-prunes to the one requested version") {
    val base = graft.sources.Ingest.fixtureDir(sf01) + "/versioned_spec"
    val plan = Versioned.snapshot(spark, base, 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert("v#\\d+ = 1".r.findFirstIn(plan).isDefined ||
      plan.contains("(v = 1)") || plan.contains("v = 1"),
      s"no v=1 partition filter in:\n$plan")
  }

  test("vacuum removes aged versions and keeps the survivors intact") {
    val base = graft.sources.Ingest.fixtureDir(sf01) + "/vacuum_spec"
    val ev = graft.sources.Tables.load(spark, sf01, "events")
      .select(col("event_id"), to_date(col("ts")).as("day"))
    (1 to 3).foreach { n =>
      Versioned.writeSnapshot(
        ev.where(col("day") < date_add(lit("2024-01-01").cast("date"),
          lit(n * 10))), base, n)
    }
    val keptCount = Versioned.snapshot(spark, base, 3).count()
    val survivors = Versioned.vacuum(spark, base, keepLast = 1)
    assert(survivors == Seq(3))
    assert(!new java.io.File(s"$base/v=1").exists())
    assert(!new java.io.File(s"$base/v=2").exists())
    assert(Versioned.snapshot(spark, base, 3).count() == keptCount)
  }

  test("j14 plan carries a dynamicpruning partition filter on the fact scan") {
    val df = SparkEntry.queries("j14_dpp_star_join")(spark, sf01)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning in:\n$plan")
  }

  test("CBO column stats flip the join to broadcast; without CBO it shuffles") {
    // the registry query pins its plan under cbo=true + 4 KB threshold
    val withStats = SparkEntry.queries("j15_cbo_stats_join")(spark, sf01)
    val statsPlan = withStats.queryExecution.executedPlan.toString
    assert(statsPlan.contains("BroadcastHashJoin"),
      s"stats-driven broadcast missing:\n$statsPlan")
    // identical query + threshold but CBO off: the filter's estimated
    // size stays at the full table's, so broadcast is NOT chosen
    val prevCbo = spark.conf.getOption("spark.sql.cbo.enabled")
    val prevThr = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "4096")
    try {
      val noCbo = spark.table("stats_demo.customer_dim")
        .where(col("c_acctbal") < -500)
        .join(graft.sources.Tables.load(spark, sf01, "orders"),
          col("c_custkey") === col("o_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_orders"))
      val noCboPlan = noCbo.queryExecution.executedPlan.toString
      assert(!noCboPlan.contains("BroadcastHashJoin"),
        s"broadcast chosen without stats — threshold not biting:\n$noCboPlan")
    } finally {
      prevCbo.fold(spark.conf.unset("spark.sql.cbo.enabled"))(
        spark.conf.set("spark.sql.cbo.enabled", _))
      prevThr.fold(spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
    }
  }
}
