package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Evidence for the maintenance verbs: Z-order tiles are narrow on
  * BOTH clustering keys (the property file-skipping rests on), the
  * targeted delete never rewrites an untouched partition, the bloom
  * runtime filter actually lands in the fact scan, and the stratified
  * sample is subset-stable. */
class LayoutSpec extends AnyFunSuite {
  import SparkTestBase._

  // sf0.01 gives 16 meaningful tiles (sf0.001's 6k rows spread thin).
  private val sf01 = "/root/testdata/sf0.01"

  test("zorder tiles bound BOTH keys far below the global range") {
    val outDir = graft.sources.Ingest.fixtureDir(sf01) + "/zorder_spec"
    val li = graft.sources.Tables.load(spark, sf01, "lineitem")
      .select("l_orderkey", "l_partkey")
    Layout.zorderWrite(li, "l_orderkey", "l_partkey", outDir, 16)
    val spans = spark.read.parquet(outDir)
      .groupBy(input_file_name().as("f"))
      .agg((max("l_orderkey") - min("l_orderkey")).as("ok_span"),
        (max("l_partkey") - min("l_partkey")).as("pk_span"))
      .agg(expr("percentile(ok_span, 0.5)").as("ok_med"),
        expr("percentile(pk_span, 0.5)").as("pk_med"),
        count(lit(1)).as("n_files"))
      .head()
    val global = li.agg(
      (max("l_orderkey") - min("l_orderkey")).cast("double"),
      (max("l_partkey") - min("l_partkey")).cast("double")).head()
    assert(spans.getLong(2) == 16, "expected 16 output files")
    // a 16-file Z-layout is a ~4×4 grid: median tile span should sit
    // near range/4 on each axis; 0.5 is a loose regression bound —
    // an accidental single-key sort leaves one axis at ~1.0.
    assert(spans.getDouble(0) <= global.getDouble(0) * 0.5,
      s"orderkey tiles too wide: ${spans.getDouble(0)} vs ${global.getDouble(0)}")
    assert(spans.getDouble(1) <= global.getDouble(1) * 0.5,
      s"partkey tiles too wide: ${spans.getDouble(1)} vs ${global.getDouble(1)}")
  }

  test("zorder layout: the registry box intersects a minority of file ranges") {
    // run the registry query first so its fixture exists at sf0.01
    SparkEntry.queries("s15_zorder_layout")(spark, sf01).collect()
    val dir = graft.sources.Ingest.fixtureDir(sf01) + "/zorder_lineitem"
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("l_orderkey").as("okl"), max("l_orderkey").as("okh"),
        min("l_partkey").as("pkl"), max("l_partkey").as("pkh"))
      .collect()
    val hit = ranges.count { r =>
      r.getAs[Long]("okh") >= 100L && r.getAs[Long]("okl") <= 900L &&
        r.getAs[Long]("pkh") >= 20L && r.getAs[Long]("pkl") <= 160L
    }
    assert(ranges.length == 16)
    assert(hit <= ranges.length / 2,
      s"box intersects $hit of ${ranges.length} file ranges — no skipping leverage")
  }

  test("targeted delete rewrites only the partitions the keys hash to") {
    import spark.implicits._
    val base = graft.sources.Ingest.fixtureDir(sf01) + "/gdpr_spec"
    val staging = graft.sources.Ingest.fixtureDir(sf01) + "/gdpr_spec_staging"
    val ev = graft.sources.Tables.load(spark, sf01, "events")
      .select(col("event_id"), col("user_id"),
        pmod(col("user_id"), lit(8)).cast("int").as("u_bucket"))
    ev.write.mode("overwrite").partitionBy("u_bucket").parquet(base)
    val before = ev.count()

    def files(bucket: Int) = {
      val d = new java.io.File(s"$base/u_bucket=$bucket")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.length, f.lastModified)).sortBy(_._1).toSeq
    }
    // keys 7 and 23 hash to bucket 7; 98 hashes to bucket 2
    val untouchedBefore = Seq(0, 1, 3, 4, 5, 6).map(b => b -> files(b)).toMap

    val keys = Seq(7L, 23L, 98L).toDF("user_id")
    Layout.targetedDelete(spark, base, "u_bucket", "user_id", keys, 8, staging)

    Seq(0, 1, 3, 4, 5, 6).foreach { b =>
      assert(files(b) == untouchedBefore(b),
        s"partition u_bucket=$b was rewritten despite holding no deleted key")
    }
    val after = spark.read.parquet(base)
    assert(after.where(col("user_id").isin(7L, 23L, 98L)).count() == 0)
    val removed = ev.where(col("user_id").isin(7L, 23L, 98L)).count()
    assert(after.count() == before - removed)
  }

  test("deleting every row of a partition removes its stale directory") {
    import spark.implicits._
    val base = graft.sources.Ingest.fixtureDir(sf01) + "/gdpr_empty_spec"
    val staging = graft.sources.Ingest.fixtureDir(sf01) + "/gdpr_empty_staging"
    val ev = graft.sources.Tables.load(spark, sf01, "events")
      .select(col("event_id"), col("user_id"),
        pmod(col("user_id"), lit(8)).cast("int").as("u_bucket"))
    ev.write.mode("overwrite").partitionBy("u_bucket").parquet(base)
    // delete EVERY user hashing to bucket 5: the dynamic overwrite
    // writes nothing for that partition, so only the explicit cleanup
    // prevents the deleted rows from resurfacing
    val doomed = ev.where(col("u_bucket") === 5)
      .select("user_id").distinct()
    Layout.targetedDelete(spark, base, "u_bucket", "user_id", doomed, 8, staging)
    assert(!new java.io.File(s"$base/u_bucket=5").exists(),
      "emptied partition directory survived the delete")
    val after = spark.read.parquet(base)
    assert(after.where(col("u_bucket") === 5).count() == 0)
    assert(after.count() == ev.where(col("u_bucket") =!= 5).count())
  }

  test("targeted delete reruns never clobber a prior run's staged survivors") {
    import spark.implicits._
    val base = graft.sources.Ingest.fixtureDir(sf01) + "/gdpr_rerun_spec"
    val staging = graft.sources.Ingest.fixtureDir(sf01) + "/gdpr_rerun_staging"
    val ev = graft.sources.Tables.load(spark, sf01, "events")
      .select(col("event_id"), col("user_id"),
        pmod(col("user_id"), lit(8)).cast("int").as("u_bucket"))
    ev.write.mode("overwrite").partitionBy("u_bucket").parquet(base)
    // simulate a previous run that crashed mid-overwrite: its staging
    // subdir (the survivors' only copy in that scenario) is on disk
    val leftover = new java.io.File(s"$staging/run_0000/part-survivors.parquet")
    leftover.getParentFile.mkdirs()
    java.nio.file.Files.write(leftover.toPath, "survivors".getBytes)

    val keys = Seq(7L, 23L).toDF("user_id")
    Layout.targetedDelete(spark, base, "u_bucket", "user_id", keys, 8, staging)
    // the rerun staged under its own run_<nanos> dir and cleaned ONLY
    // that; the crashed run's copy is untouched for recovery
    assert(leftover.exists(), "rerun clobbered a prior run's staging dir")
    assert(new java.io.File(staging).listFiles().map(_.getName).sorted
      .sameElements(Array("run_0000")),
      "completed rerun left its own staging dir behind")
    // and a second rerun over the already-deleted keys converges
    val afterFirst = spark.read.parquet(base).count()
    Layout.targetedDelete(spark, base, "u_bucket", "user_id", keys, 8, staging)
    val after = spark.read.parquet(base)
    assert(after.count() == afterFirst)
    assert(after.where(col("user_id").isin(7L, 23L)).count() == 0)
    assert(leftover.exists())
  }

  test("j13 plan carries the bloom might_contain probe on the fact side") {
    val df = SparkEntry.queries("j13_bloom_pruned_join")(spark, sf01)
    // the registry helper forces planning while the bloom confs hold
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"no bloom runtime filter in the pinned plan:\n$plan")
  }

  test("stratified sample is subset-stable (membership never depends on corpus size)") {
    val docs = graft.sources.Tables.load(spark, sf01, "documents")
    val full = SparkEntry.queries("p11_stratified_sample")(spark, sf01)
      .where(col("doc_id") < 200).collect().map(_.getLong(0)).toSet
    // recompute on the truncated corpus: same expression, fewer rows
    val truncated = docs.where(col("doc_id") < 200)
      .where(graft.operators.TextAnalysis.stableBucket(col("doc_id")) <
        when(col("lang") === "en", 100).otherwise(500))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(full == truncated)
    // and the en cap genuinely bites: en rate well below the others'
    val rates = SparkEntry.queries("p11_stratified_sample")(spark, sf01)
      .groupBy("lang").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = rates("en").toDouble / totals("en")
    val restRate = (rates - "en").values.sum.toDouble /
      (totals - "en").values.sum
    assert(enRate < 0.2 && restRate > 0.35,
      s"stratum rates off: en=$enRate rest=$restRate")
  }
}
