package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.TxLog

/** Laws for the txlog streaming source: version-per-micro-batch
  * consumption, checkpoint resume, exactly-once delivery across
  * restarts, change-feed tagging, schema evolution, and the vacuumed-
  * history failure mode. The unifying claim: a batch's contents are
  * the files its VERSION added — work per trigger scales with the
  * commit delta, never the table. */
class TxLogStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def clustered(lo: Long, n: Long, tag: String, parts: Int) = {
    spark.range(lo, lo + n)
      .select(col("id").as("k"), concat(lit(tag), lit("-"), col("id")).as("s"))
      .repartitionByRange(parts, col("k"))
  }

  private def contents(d: DataFrame): Set[(Long, String)] =
    d.select("k", "s").collect().map(r => (r.getLong(0), r.getString(1))).toSet

  /** Drain the source with AvailableNow into a parquet sink; returns
    * the sink readback. */
  private def drain(base: String, out: String, ckpt: String,
                    options: Map[String, String] = Map.empty): DataFrame = {
    val reader = options.foldLeft(
      spark.readStream.format("graft.sources.TxLogSource")) {
      case (r, (k, v)) => r.option(k, v)
    }
    val q = reader.load(base)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(out)
  }

  test("startingTimestamp: the stream's first consumed version is the " +
    "first commit AT OR AFTER the instant (in-commit stamps, ceiling " +
    "rule); before-the-log serves everything; after-the-log serves " +
    "only future commits") {
    val base = "/tmp/graft_txstream/start_ts"
    TxLog.drop(spark, base)
    TxLog.commit(clustered(0, 10, "v1", 1), base, None, Some("k"))
    TxLog.append(clustered(10, 10, "v2", 1), base, Some("k"))
    TxLog.append(clustered(20, 10, "v3", 1), base, Some("k"))
    TxLog.setCommitTime(spark, base, 1L, 1000L)
    TxLog.setCommitTime(spark, base, 2L, 2000L)
    TxLog.setCommitTime(spark, base, 3L, 3000L)
    TxLog.cachePurge(base)
    def drainTs(tag: String, ts: String): Set[Long] = {
      val out = s"/tmp/graft_txstream/start_ts_out_$tag"
      val ckpt = s"/tmp/graft_txstream/start_ts_ckpt_$tag"
      Seq(out, ckpt).foreach(TxLog.drop(spark, _))
      drain(base, out, ckpt, Map("startingTimestamp" -> ts))
        .select("k").collect().map(_.getLong(0)).toSet
    }
    assert(drainTs("mid", "2500") == (20L until 30L).toSet,
      "2500 sits between v2@2000 and v3@3000 — only v3 is consumed " +
        "(floor semantics would leak v2)")
    assert(drainTs("at", "2000") == (10L until 30L).toSet,
      "an instant exactly AT a stamp includes that commit")
    assert(drainTs("before", "500") == (0L until 30L).toSet)
    assert(drainTs("after", "9999999999999") == Set.empty,
      "after every commit: only future versions would stream")
    val both = intercept[Exception] {
      drainTs("both", "1")
      drain(base, "/tmp/graft_txstream/x", "/tmp/graft_txstream/y",
        Map("startingTimestamp" -> "1000", "startingVersion" -> "1"))
    }
    assert(both.getMessage != null)
  }

  test("startingTimestamp on an EMPTY log matches startingVersion=0: " +
    "the stream starts (user-supplied schema), drains nothing, and a " +
    "restart after the first commits consumes everything ever " +
    "committed — not an IllegalStateException") {
    val base = "/tmp/graft_txstream/start_ts_empty"
    val out = "/tmp/graft_txstream/start_ts_empty_out"
    val ckpt = "/tmp/graft_txstream/start_ts_empty_ckpt"
    Seq(base, out, ckpt).foreach(TxLog.drop(spark, _))
    // an empty but EXISTING store: the log dir is there, no commits
    new org.apache.hadoop.fs.Path(s"$base/_log")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .mkdirs(new org.apache.hadoop.fs.Path(s"$base/_log"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("c",
        org.apache.spark.sql.types.StringType)))
    def drainWithSchema(): DataFrame = {
      val q = spark.readStream.format("graft.sources.TxLogSource")
        .schema(schema).option("startingTimestamp", "1000")
        .load(base)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.read.schema(schema).parquet(out)
    }
    assert(drainWithSchema().count() == 0,
      "empty log: the stream starts and waits, like startingVersion=0")
    TxLog.commit(clustered(0, 10, "v1", 1), base, None, Some("k"))
    TxLog.append(clustered(10, 5, "v2", 1), base, Some("k"))
    assert(drainWithSchema().select("k").collect().map(_.getLong(0)).toSet
      == (0L until 15L).toSet,
      "the restarted stream consumes everything that ever committed")
  }

  test("schema tracking, additive (r13 next-round #5): one stream " +
    "replays pre-evolution files null-filled and post-evolution files " +
    "with values; a checkpointed stream resumes ACROSS an ADD COLUMNS " +
    "without re-delivery") {
    val base = "/tmp/graft_txstream/schema_add"
    val out = "/tmp/graft_txstream/schema_add_out"
    val ckpt = "/tmp/graft_txstream/schema_add_ckpt"
    Seq(base, out, ckpt).foreach(TxLog.drop(spark, _))
    TxLog.commit(clustered(0, 10, "v1", 1), base, None, Some("k"))
    // drain v1 under the 2-column surface
    assert(drain(base, out, ckpt).count() == 10)
    // additive evolution + data under the NEW surface
    TxLog.alterAddColumns(spark, base, org.apache.spark.sql.types
      .StructType(Seq(org.apache.spark.sql.types.StructField("extra",
        org.apache.spark.sql.types.LongType))))
    import spark.implicits._
    TxLog.append((100L until 105L).map(k => (k, s"v3-$k", k * 7))
      .toDF("k", "s", "extra"), base, Some("k"))
    // the SAME checkpoint resumes across the evolution: only the new
    // version ships, under the evolved sink schema
    val got = spark.read.option("mergeSchema", "true").parquet(out)
    val q = spark.readStream.format("graft.sources.TxLogSource")
      .load(base)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .option("mergeSchema", "true")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val all = spark.read.option("mergeSchema", "true").parquet(out)
    assert(all.count() == 15, "no re-delivery, no loss across ADD COLUMNS")
    assert(all.where("extra IS NOT NULL").count() == 5)
    // and a FRESH stream replays the whole history under the latest
    // surface: old files null-fill, new files carry values
    val out2 = "/tmp/graft_txstream/schema_add_out2"
    val ckpt2 = "/tmp/graft_txstream/schema_add_ckpt2"
    Seq(out2, ckpt2).foreach(TxLog.drop(spark, _))
    val fresh = drain(base, out2, ckpt2)
    assert(fresh.count() == 15)
    assert(fresh.where("k < 100 AND extra IS NULL").count() == 10,
      "pre-evolution files replay null-filled")
    assert(fresh.where("k >= 100 AND extra = k * 7").count() == 5,
      "post-evolution files replay with values")
  }

  test("schema tracking, NON-additive: a RENAME under column mapping " +
    "between checkpoint and restart fails LOUDLY with guidance; " +
    "allowSchemaChange=true opts in") {
    val base = "/tmp/graft_txstream/schema_ren"
    val out = "/tmp/graft_txstream/schema_ren_out"
    val ckpt = "/tmp/graft_txstream/schema_ren_ckpt"
    Seq(base, out, ckpt).foreach(TxLog.drop(spark, _))
    TxLog.commit(clustered(0, 10, "v1", 1), base, None, Some("k"))
    assert(drain(base, out, ckpt).count() == 10)
    // non-additive: rename s -> txt (colmap rebind), then new data
    TxLog.renameColumn(spark, base, "s", "txt")
    import spark.implicits._
    TxLog.append((50L until 55L).map(k => (k, s"v3-$k")).toDF("k", "txt"),
      base, Some("k"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("graft.sources.TxLogSource")
        .load(base)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val msg = Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
    assert(msg.contains("non-additive") && msg.contains("allowSchemaChange"),
      s"the failure must explain itself: $msg")
    // explicit opt-in proceeds against the SAME sink (the caller
    // accepts the re-bound surface; parquet sink evolves by mergeSchema)
    val q3 = spark.readStream.format("graft.sources.TxLogSource")
      .option("allowSchemaChange", "true").load(base)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q3.awaitTermination()
    val all = spark.read.option("mergeSchema", "true").parquet(out)
    assert(all.where("txt LIKE 'v3-%'").count() == 5,
      "the opted-in resume ships the new version under the new surface")
    assert(all.count() == 15, "nothing re-delivered, nothing lost")
  }

  test("change-feed stream delivers exactly the rows each version " +
    "committed, tagged with its commit version, one version per trigger") {
    val base = "/tmp/graft_txstream/feed"
    val out = "/tmp/graft_txstream/feed_out"
    val ckpt = "/tmp/graft_txstream/feed_ckpt"
    Seq(base, out, ckpt).foreach(TxLog.drop(spark, _))
    TxLog.commit(clustered(0, 100, "seed", 2), base, None, Some("k"))
    TxLog.append(clustered(100, 20, "b1", 1), base, Some("k"))
    TxLog.append(clustered(120, 30, "b2", 1), base, Some("k"))
    val got = drain(base, out, ckpt,
      Map("changeFeed" -> "true", "maxVersionsPerTrigger" -> "1"))
    val perVersion = got.groupBy("_commit_version").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perVersion == Map(1L -> 100L, 2L -> 20L, 3L -> 30L))
    assert(contents(got) == contents(TxLog.read(spark, base)))
    // one version per micro-batch: the parquet sink commits one
    // _spark_metadata batch file per micro-batch — exactly 3 here, so
    // maxVersionsPerTrigger=1 genuinely produced 3 triggers (a
    // regression shipping all versions in one batch would leave 1)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val batchCommits = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$out/_spark_metadata")).toSeq
      .map(_.getPath.getName).count(_.matches("\\d+"))
    assert(batchCommits == 3,
      s"expected 3 sink batch commits (one per version), got $batchCommits")
  }

  test("restart resumes at the checkpointed version: appends between " +
    "runs arrive exactly once, consumed history is never re-shipped") {
    val base = "/tmp/graft_txstream/resume"
    val out = "/tmp/graft_txstream/resume_out"
    val ckpt = "/tmp/graft_txstream/resume_ckpt"
    Seq(base, out, ckpt).foreach(TxLog.drop(spark, _))
    TxLog.commit(clustered(0, 50, "seed", 1), base, None, Some("k"))
    TxLog.append(clustered(50, 10, "b1", 1), base, Some("k"))
    val run1 = drain(base, out, ckpt, Map("changeFeed" -> "true"))
    assert(run1.count() == 60)
    // two more versions land while the stream is down
    TxLog.append(clustered(60, 10, "b2", 1), base, Some("k"))
    TxLog.append(clustered(70, 10, "b3", 1), base, Some("k"))
    val run2 = drain(base, out, ckpt, Map("changeFeed" -> "true"))
    assert(run2.count() == 80, "each row must arrive exactly once")
    assert(run2.groupBy("k").count().where(col("count") > 1).count() == 0,
      "no row may be shipped twice across restarts")
    assert(contents(run2) == contents(TxLog.read(spark, base)))
    // an idle restart (no new versions) ships nothing new
    val run3 = drain(base, out, ckpt, Map("changeFeed" -> "true"))
    assert(run3.count() == 80)
  }

  test("startingVersion skips the seed: only increments stream") {
    val base = "/tmp/graft_txstream/startv"
    val out = "/tmp/graft_txstream/startv_out"
    val ckpt = "/tmp/graft_txstream/startv_ckpt"
    Seq(base, out, ckpt).foreach(TxLog.drop(spark, _))
    TxLog.commit(clustered(0, 100, "seed", 2), base, None, Some("k"))
    TxLog.append(clustered(100, 20, "b1", 1), base, Some("k"))
    val got = drain(base, out, ckpt,
      Map("changeFeed" -> "true", "startingVersion" -> "1"))
    assert(got.count() == 20)
    assert(got.select("_commit_version").distinct().collect()
      .map(_.getLong(0)).toSet == Set(2L))
  }

  test("schema-evolving append streams correctly: rows from pre-" +
    "evolution files carry NULL in the new column; readEvolved agrees") {
    val base = "/tmp/graft_txstream/evolve"
    val out = "/tmp/graft_txstream/evolve_out"
    val ckpt = "/tmp/graft_txstream/evolve_ckpt"
    Seq(base, out, ckpt).foreach(TxLog.drop(spark, _))
    TxLog.commit(clustered(0, 30, "old", 1), base, None, Some("k"))
    TxLog.append(
      clustered(30, 20, "new", 1).withColumn("extra", col("k") * 10),
      base, Some("k"))
    // batch side first: the evolved snapshot unions the schemas
    val snap = TxLog.readEvolved(spark, base)
    assert(snap.columns.toSeq == Seq("k", "s", "extra"))
    assert(snap.where(col("extra").isNull).count() == 30)
    assert(snap.where(col("extra") === col("k") * 10).count() == 20)
    // streaming side: same union schema, same NULL semantics
    val got = drain(base, out, ckpt)
    assert(got.columns.toSet == Set("k", "s", "extra"))
    assert(got.count() == 50)
    assert(got.where(col("extra").isNull).count() == 30)
    assert(got.where(col("extra") === col("k") * 10).count() == 20)
  }

  test("a MERGE-driven schema evolution mid-stream neither crashes " +
    "nor reorders the feed: the running query keeps its start-time " +
    "surface (new column invisible — Structured Streaming's fixed-" +
    "schema contract), a RESTART picks the evolved column up with " +
    "NULLs on pre-evolution rows") {
    import graft.operators.TxLog.{MergeInsert, MergeUpdate, sourceCol}
    import spark.implicits._
    val base = "/tmp/graft_txstream/mevolve"
    val out = "/tmp/graft_txstream/mevolve_out"
    val ckpt = "/tmp/graft_txstream/mevolve_ckpt"
    Seq(base, out, ckpt).foreach(TxLog.drop(spark, _))
    TxLog.commit(clustered(0, 30, "seed", 1), base, None, Some("k"))
    // run 1 consumes the narrow surface
    assert(drain(base, out, ckpt).count() == 30)
    // an EVOLVING merge lands while the stream is down: updates two
    // rows, inserts two, and ADDs a column in the same commit
    TxLog.mergeClauses(spark, base,
      Seq((1L, "u1", "eu"), (2L, "u2", "us"), (100L, "n1", "eu"),
        (101L, "n2", "us")).toDF("k", "s", "region"),
      Seq("k"),
      matched = Seq(MergeUpdate(None,
        Map("s" -> sourceCol("s"), "region" -> sourceCol("region")))),
      notMatched = Seq(MergeInsert(None,
        Map("k" -> sourceCol("k"), "s" -> sourceCol("s"),
          "region" -> sourceCol("region")))),
      evolveSchema = true)
    // run 2 (same checkpoint, schema re-resolved at restart): the
    // merge's changed rows arrive, the evolved column serves with
    // NULL on rows from pre-evolution files. (The parquet SINK dir is
    // itself schema-heterogeneous across the two runs — read it with
    // mergeSchema, like any evolved landing zone.)
    drain(base, out, ckpt)
    val got = spark.read.option("mergeSchema", "true").parquet(out)
    assert(got.columns.toSet == Set("k", "s", "region"))
    // incremental: the 4 merge images arrived in run 2 (the two
    // updated + two inserted rows land as new files)
    val run2 = got.where(col("region").isNotNull)
    assert(run2.count() == 4, got.collect().mkString(", "))
    assert(run2.where(col("k") === 1 && col("s") === "u1" &&
      col("region") === "eu").count() == 1)
  }

  test("vacuumed history below the checkpoint fails with a reset " +
    "error instead of silently skipping data") {
    val base = "/tmp/graft_txstream/vac"
    val out = "/tmp/graft_txstream/vac_out"
    val ckpt = "/tmp/graft_txstream/vac_ckpt"
    Seq(base, out, ckpt).foreach(TxLog.drop(spark, _))
    TxLog.commit(clustered(0, 10, "a", 1), base, None, Some("k"))
    TxLog.append(clustered(10, 10, "b", 1), base, Some("k"))
    TxLog.append(clustered(20, 10, "c", 1), base, Some("k"))
    TxLog.append(clustered(30, 10, "d", 1), base, Some("k"))
    // vacuum history away BEFORE any consumption: the fresh stream's
    // cursor (version 0) now points below the oldest surviving manifest
    TxLog.vacuum(spark, base, keepLast = 2)
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(base, out, ckpt, Map("changeFeed" -> "true"))
    }
    val msg = Option(ex.getCause).map(_.toString).getOrElse(ex.toString)
    assert(msg.contains("vacuumed") || msg.contains("manifest is gone"),
      s"expected a vacuumed-history error, got: $msg")
  }

  test("batch read through the source equals the native snapshot " +
    "read; change-feed batch equals changesBetween from zero") {
    val base = "/tmp/graft_txstream/batch"
    TxLog.drop(spark, base)
    TxLog.commit(clustered(0, 40, "a", 2), base, None, Some("k"))
    TxLog.append(clustered(40, 10, "b", 1), base, Some("k"))
    val viaSource = spark.read.format("graft.sources.TxLogSource").load(base)
    assert(contents(viaSource) == contents(TxLog.read(spark, base)))
    // column pruning path: a projected read still decodes correctly
    assert(viaSource.select("k").collect().map(_.getLong(0)).toSet ==
      (0L until 50L).toSet)
    val feed = spark.read.format("graft.sources.TxLogSource")
      .option("changeFeed", "true").load(base)
    val expect = TxLog.changesBetween(spark, base, 0L, 2L)
    assert(feed.groupBy("_commit_version").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      expect.groupBy("_commit_version").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap)
  }

  test("versionAsOf time-travels the batch read, with the schema of " +
    "THAT version — later-added columns don't leak into the past") {
    val base = "/tmp/graft_txstream/asof"
    TxLog.drop(spark, base)
    TxLog.commit(clustered(0, 30, "v1", 1), base, None, Some("k"))
    TxLog.append(
      clustered(30, 20, "v2", 1).withColumn("extra", col("k") * 10),
      base, Some("k"))
    val asOf1 = spark.read.format("graft.sources.TxLogSource")
      .option("versionAsOf", "1").load(base)
    assert(asOf1.columns.toSeq == Seq("k", "s"),
      "version 1's schema must not include the later column")
    assert(contents(asOf1) == contents(TxLog.readVersion(spark, base, 1L)))
    val asOf2 = spark.read.format("graft.sources.TxLogSource")
      .option("versionAsOf", "2").load(base)
    assert(asOf2.count() == 50 && asOf2.columns.contains("extra"))
    val ex = intercept[IllegalArgumentException] {
      spark.read.format("graft.sources.TxLogSource")
        .option("versionAsOf", "9").load(base).collect()
    }
    assert(ex.getMessage.contains("beyond the latest"))
  }

  test("the log is SQL-visible: CREATE TABLE ... USING the source, " +
    "then plain SQL sees each query's CURRENT latest snapshot") {
    val base = "/tmp/graft_txstream/sqlusing"
    TxLog.drop(spark, base)
    TxLog.commit(clustered(0, 50, "a", 2), base, None, Some("k"))
    spark.sql("DROP TABLE IF EXISTS txlog_sql_demo")
    spark.sql("CREATE TABLE txlog_sql_demo " +
      s"USING graft.sources.TxLogSource OPTIONS (path '$base')")
    try {
      assert(spark.sql("SELECT count(*) AS n FROM txlog_sql_demo")
        .head().getLong(0) == 50)
      // a commit AFTER table creation is visible to the next query —
      // the table resolves the latest manifest per plan, not at DDL
      TxLog.append(clustered(50, 10, "b", 1), base, Some("k"))
      assert(spark.sql("SELECT count(*) AS n FROM txlog_sql_demo")
        .head().getLong(0) == 60)
      assert(spark.sql(
        "SELECT s FROM txlog_sql_demo WHERE k = 55").head().getString(0)
        == "b-55")
    } finally spark.sql("DROP TABLE IF EXISTS txlog_sql_demo")
  }

  test("SQL row-level DELETE routes to the MOR delete: DELETE FROM " +
    "WHERE over the catalog table masks rows without rewriting files") {
    val base = "/tmp/graft_txstream/sqldelete"
    TxLog.drop(spark, base)
    TxLog.commit(clustered(0, 100, "a", 4), base, None, Some("k"))
    val filesBefore = TxLog.manifest(spark, base, 1L)._1.map(_.path).toSet
    spark.sql("DROP TABLE IF EXISTS txlog_sql_del")
    spark.sql("CREATE TABLE txlog_sql_del " +
      s"USING graft.sources.TxLogSource OPTIONS (path '$base')")
    try {
      spark.sql("DELETE FROM txlog_sql_del WHERE k BETWEEN 10 AND 19")
      assert(spark.sql("SELECT count(*) AS n FROM txlog_sql_del")
        .head().getLong(0) == 90)
      assert(spark.sql(
        "SELECT count(*) AS n FROM txlog_sql_del WHERE k BETWEEN 10 AND 19")
        .head().getLong(0) == 0)
      // merge-on-read: the data file set is UNCHANGED — the delete
      // only attached a deletion-vector mask (O(deleted rows) commit)
      val v2 = TxLog.latestVersion(spark, base).get
      assert(v2 == 2L)
      val after = TxLog.manifest(spark, base, v2)._1
      assert(after.map(_.path).toSet == filesBefore,
        "SQL DELETE must not rewrite data files")
      assert(after.exists(_.dv.isDefined))
      // stats pre-pruning: only the touched band carries a mask
      assert(after.count(_.dv.isDefined) == 1,
        "only the band file overlapping [10,19] should be masked")
      // the TxLog API view agrees (one snapshot, two surfaces)
      assert(TxLog.read(spark, base).count() == 90)
      // and a second DELETE over a different predicate shape (IN)
      spark.sql("DELETE FROM txlog_sql_del WHERE k IN (20, 21)")
      assert(TxLog.read(spark, base).count() == 88)
    } finally spark.sql("DROP TABLE IF EXISTS txlog_sql_del")
  }

  test("pushed range filters prune manifest entries before the scan: " +
    "fewer planned partitions, identical results, filters residual") {
    val base = "/tmp/graft_txstream/pushdown"
    TxLog.drop(spark, base)
    TxLog.commit(clustered(0, 1000, "x", 8), base, None, Some("k"))
    val src = spark.read.format("graft.sources.TxLogSource").load(base)
    val narrow = src.where(col("k").between(10, 90))
    // partition count IS the planned-file count for a DSv2 scan: the
    // 8-band table must plan at most 2 band files for the narrow range
    assert(narrow.rdd.getNumPartitions <= 2,
      s"expected <=2 planned files, got ${narrow.rdd.getNumPartitions}")
    assert(src.rdd.getNumPartitions == 8)
    assert(contents(narrow) ==
      contents(TxLog.read(spark, base).where(col("k").between(10, 90))))
    // point lookup: one band file
    val point = src.where(col("k") === 500)
    assert(point.rdd.getNumPartitions <= 1)
    assert(point.count() == 1)
    // a range beyond every band plans zero partitions and returns none
    assert(src.where(col("k") > 5000).count() == 0)
    // non-range filters (e.g. on the string column) prune nothing and
    // stay correct
    assert(src.where(col("s") === "x-7").count() == 1)
    // IN-list: a disjunction of points keeps only the bands any value
    // lands in (two bands for two far-apart keys)
    val inq = src.where(col("k").isin(5L, 900L))
    assert(inq.rdd.getNumPartitions <= 2,
      s"IN-list must prune to the hit bands, got ${inq.rdd.getNumPartitions}")
    assert(inq.count() == 2)
    // an IN-list entirely outside every band plans nothing
    assert(src.where(col("k").isin(7777L, 8888L)).count() == 0)
  }

  test("float predicates prune soundly: the filter value widens " +
    "through toDouble exactly like the stored stats, so the file " +
    "holding the matching rows always survives") {
    val base = "/tmp/graft_txstream/floatpush"
    TxLog.drop(spark, base)
    val df = spark.range(0, 100)
      .select(col("id").as("k"),
        (col("id").cast("float") / 10.0f).cast("float").as("f"))
      .repartitionByRange(4, col("k"))
    TxLog.commitMulti(df, base, None, Seq("k", "f"))
    val src = spark.read.format("graft.sources.TxLogSource").load(base)
    // 1.1f has no exact double repr via toString — the regression this
    // pins pruned the file and returned zero rows
    assert(src.where(col("f") === lit(1.1f)).count() ==
      TxLog.read(spark, base).where(col("f") === lit(1.1f)).count())
    assert(src.where(col("f").isin(1.1f, 55.5f)).count() ==
      TxLog.read(spark, base).where(col("f").isin(1.1f, 55.5f)).count())
    assert(src.where(col("f") >= lit(9.7f)).count() ==
      TxLog.read(spark, base).where(col("f") >= lit(9.7f)).count())
  }

  test("un-filtered COUNT(*)/MIN/MAX are answered from manifest " +
    "metadata alone: TxLogAggScan in the plan, one partition, zero " +
    "data files read, values identical to the full computation") {
    val base = "/tmp/graft_txstream/aggpush"
    TxLog.drop(spark, base)
    TxLog.commit(clustered(5, 995, "x", 8), base, None, Some("k"))
    TxLog.append(clustered(1000, 50, "y", 1), base, Some("k"))
    val src = spark.read.format("graft.sources.TxLogSource").load(base)
    val agg = src.agg(count(lit(1)).as("n"), min("k").as("mn"),
      max("k").as("mx"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("TxLogAggScan"),
      s"expected the metadata-only agg scan in the plan:\n$plan")
    val row = agg.head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) ==
      (1045L, 5L, 1049L))
    // string min/max use the same UTF-8 ordering as Spark's own
    val srow = src.agg(min("s"), max("s")).head()
    val nat = TxLog.read(spark, base).agg(min("s"), max("s")).head()
    assert(srow == nat, s"string extremes: $srow vs $nat")
    // versionAsOf: the count is THAT version's
    assert(spark.read.format("graft.sources.TxLogSource")
      .option("versionAsOf", "1").load(base).count() == 995L)
    // a WHERE query must NOT take the metadata path and stays correct
    val filtered = src.where(col("k") >= 1000).agg(count(lit(1)))
    assert(!filtered.queryExecution.executedPlan.toString
      .contains("TxLogAggScan"))
    assert(filtered.head().getLong(0) == 50L)
    // a stat-less commit still records per-file ROW COUNTS, so
    // COUNT(*) stays metadata-only even without a stats column
    val nsBase = "/tmp/graft_txstream/aggpush_nostats"
    TxLog.drop(spark, nsBase)
    TxLog.commit(clustered(0, 10, "z", 1), nsBase, None) // no stats cols
    val nsAgg = spark.read.format("graft.sources.TxLogSource").load(nsBase)
      .agg(count(lit(1)))
    assert(nsAgg.queryExecution.executedPlan.toString
      .contains("TxLogAggScan"),
      "row counts ride stat-less commits; COUNT must stay metadata-only")
    assert(nsAgg.head().getLong(0) == 10L)
    // a genuine v1 manifest (bare paths, no row counts) cannot answer:
    // normal scan, correct value
    val v1base = "/tmp/graft_txstream/aggpush_v1"
    TxLog.drop(spark, v1base)
    TxLog.publish(spark, v1base, 1L,
      TxLog.land(clustered(0, 10, "z", 1), v1base))
    val v1src = spark.read.format("graft.sources.TxLogSource").load(v1base)
    val v1agg = v1src.agg(count(lit(1)))
    assert(!v1agg.queryExecution.executedPlan.toString
      .contains("TxLogAggScan"))
    assert(v1agg.head().getLong(0) == 10L)
  }

  test("timestamp and numeric types survive the Group-API decode " +
    "bit-identically to the native parquet reader") {
    val base = "/tmp/graft_txstream/types"
    TxLog.drop(spark, base)
    val df = spark.range(0, 100)
      .select(col("id").as("k"),
        concat(lit("s-"), col("id")).as("s"),
        (col("id") * 1.5).as("d"),
        col("id").cast("int").as("i"),
        (col("id") % 2 === 0).as("b"),
        date_add(to_date(lit("2024-01-01")), col("id").cast("int")).as("dt"),
        expr("timestamp'2024-01-01 00:00:00' + " +
          "make_interval(0, 0, 0, 0, 0, 0, id)").as("ts"))
    TxLog.commit(df, base, None, Some("k"))
    val native = TxLog.read(spark, base)
    val viaSource = spark.read.format("graft.sources.TxLogSource").load(base)
    assert(viaSource.orderBy("k").collect().toSeq ==
      native.orderBy("k").collect().toSeq)
  }

  test("CDF update images (r11 missing #2): a MOR UPDATE version " +
    "emits update_preimage/update_postimage through BOTH feeds; a " +
    "pure MOR delete still emits 'delete'; a COW UPDATE keeps the " +
    "documented delete+insert materialization") {
    val base = "/tmp/graft_txstream/cdfupd"
    TxLog.drop(spark, base)
    import spark.implicits._
    TxLog.commit((1 to 100).map(i => (i, i * 1.0, s"r$i"))
      .toDF("k", "v", "p").repartitionByRange(4, col("k")),
      base, None, Some("k"))
    // v2: MOR update (mask + images)
    TxLog.updateRangeMor(spark, base, "k", 10L, 29L,
      Map("v" -> (col("v") + 1000)))
    // v3: pure MOR delete
    TxLog.deleteRangeMor(spark, base, "k", 90L, 99L)
    // v4: COW update (band rewrite, no mask transition)
    TxLog.updateRange(spark, base, "k", 30L, 39L,
      Map("v" -> (col("v") - 1)))
    def slice(from: Long, to: Long): Map[String, (Long, Double)] =
      TxLog.changesWithDeletes(spark, base, from, to)
        .groupBy("_change_type")
        .agg(count(lit(1)), sum("v"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
    // batch feed: v2 = exactly 20 preimages + 20 postimages
    val v2 = slice(1L, 2L)
    assert(v2.keySet == Set("update_preimage", "update_postimage"), v2)
    assert(v2("update_preimage")._1 == 20 && v2("update_postimage")._1 == 20)
    assert(v2("update_postimage")._2 == v2("update_preimage")._2 + 20 * 1000)
    // v3 = plain deletes, never images
    val v3 = slice(2L, 3L)
    assert(v3.keySet == Set("delete") && v3("delete")._1 == 10, v3)
    // v4 (COW) = delete+insert pairs for the rewritten band — the
    // file is the unit of change, unchanged rows included, and NO
    // update-image claim is made
    val v4 = slice(3L, 4L)
    assert(v4.keySet == Set("delete", "insert"), v4)
    // streaming typed feed agrees with the batch feed slice-for-slice
    val ckpt = s"$base/_ck_${System.nanoTime()}"
    val q = spark.readStream.format("graft.sources.TxLogSource")
      .option("changeFeedTypes", "true")
      .option("maxVersionsPerTrigger", "1")
      .load(base)
      .writeStream.format("memory").queryName("cdfupd")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("cdfupd")
      .groupBy("_commit_version", "_change_type").count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(streamed((2L, "update_preimage")) == 20)
    assert(streamed((2L, "update_postimage")) == 20)
    assert(streamed((3L, "delete")) == 10)
    assert(!streamed.keySet.exists { case (v, t) =>
      v == 3L && t.startsWith("update_") })
    assert(streamed.keySet.filter(_._1 == 4L).map(_._2) ==
      Set("delete", "insert"))
    // replica replay over the typed feed stays bit-identical when
    // preimages apply as delete-keys and postimages as inserts
    val rep = "/tmp/graft_txstream/cdfupd_rep"
    TxLog.drop(spark, rep)
    // apply per version, in order, through applyChanges
    val feed = spark.table("cdfupd")
    (1L to 4L).foreach { v =>
      val b = feed.where(col("_commit_version") === v)
      TxLog.applyChanges(spark, rep,
        deleteKeys = b.where(col("_change_type")
          .isin("delete", "update_preimage")).select("k"),
        inserts = b.where(col("_change_type")
          .isin("insert", "update_postimage"))
          .drop("_commit_version", "_change_type"),
        keys = Seq("k"), statsCol = "k", appId = "cdfupd-rep", batchId = v)
    }
    val a = TxLog.read(spark, base)
    val b = TxLog.read(spark, rep)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "replica replay over update images must reproduce the source")
  }

  test("review regressions: a MOR UPDATE that fully masks its file " +
    "still emits update images (the #cdfop hint, not manifest-shape " +
    "inference); a FILTERED typed stream keeps the labels (pushdown " +
    "cannot flip postimages to inserts); legacy survivor-indexed " +
    "offsets are refused loudly") {
    val base = "/tmp/graft_txstream/cdfhint"
    TxLog.drop(spark, base)
    import spark.implicits._
    // ONE file; the update hits EVERY row → remask drops the file
    // from the manifest (no surviving mask transition — the shape a
    // structural gate mislabels as delete+insert)
    TxLog.commit((1 to 10).map(i => (i, i * 1.0)).toDF("k", "v")
      .coalesce(1), base, None, Some("k"))
    TxLog.updateWhereMor(spark, base, lit(true),
      Map("v" -> (col("v") + 100)))
    val batch = TxLog.changesWithDeletes(spark, base, 1L, 2L)
      .groupBy("_change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(batch == Map("update_preimage" -> 10L,
      "update_postimage" -> 10L), batch)
    // the typed STREAM with a pushed filter: the filter prunes the
    // (fully-masked, dropped) old file entirely, but labels must not
    // change — postimages stay postimages
    val ckpt = s"$base/_ck_${System.nanoTime()}"
    val q = spark.readStream.format("graft.sources.TxLogSource")
      .option("changeFeedTypes", "true")
      .load(base)
      .where(col("v") > 100.0) // only postimages satisfy this
      .writeStream.format("memory").queryName("cdfhint")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("cdfhint")
      .groupBy("_change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed.getOrElse("update_postimage", 0L) == 10L,
      s"filtered stream must keep image labels: $streamed")
    assert(!streamed.contains("insert"), streamed)
    // a partial offset written by the pre-r12 build (no "raw" stamp —
    // its index counted stats-surviving files) is refused, never
    // silently re-interpreted
    val mbs = new graft.sources.TxLogMicroBatchStream(
      null, base, None, 0L)
    val e = intercept[IllegalStateException] {
      mbs.deserializeOffset("""{"version":3,"index":2}""")
    }
    assert(e.getMessage.contains("earlier build"), e.getMessage)
    // the stamped form round-trips
    assert(mbs.deserializeOffset(
      new graft.sources.TxLogOffset(3L, 2L).json()) ==
      new graft.sources.TxLogOffset(3L, 2L))
  }

  test("DECIMAL columns stream: the source's Group decoder reads " +
    "INT64- and BINARY-encoded decimals through the file's declared " +
    "scale, rescaling to the requested type across a decimal-growth " +
    "widen") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val base = "/tmp/graft_txstream/dec"
    val out = "/tmp/graft_txstream/dec_out"
    val ckpt = "/tmp/graft_txstream/dec_ckpt"
    Seq(base, out, ckpt).foreach(TxLog.drop(spark, _))
    // v1: compact (INT64) decimals at scale 2; then a growth widen to
    // scale 4; v3: a wide batch incl. a >18-digit (BINARY) decimal
    TxLog.commit(spark.range(0, 10).select(col("id").as("k"),
      (col("id") * 100 + lit(0.25)).cast(DecimalType(10, 2)).as("d"),
      lit("1234567890123456789.5").cast(DecimalType(25, 4)).as("big")),
      base, None, Some("k"))
    TxLog.alterWidenColumn(spark, base, "d", DecimalType(14, 4))
    TxLog.append(spark.range(10, 15).select(col("id").as("k"),
      (col("id") + lit(0.0001)).cast(DecimalType(14, 4)).as("d"),
      lit("-987654321098765432.1098").cast(DecimalType(25, 4)).as("big")),
      base, Some("k"))
    val got = drain(base, out, ckpt, Map("changeFeed" -> "true"))
    assert(got.schema("d").dataType == DecimalType(14, 4))
    assert(got.count() == 15)
    // narrow-file rows rescaled exactly (0.25 -> 0.2500)
    assert(got.where(col("k") === 3 &&
      col("d") === lit("300.25").cast(DecimalType(14, 4))).count() == 1)
    assert(got.where(col("k") === 12 &&
      col("d") === lit("12.0001").cast(DecimalType(14, 4))).count() == 1)
    // BINARY-encoded wide decimals decode bit-exactly, sign included
    assert(got.where(col("k") === 14).select("big").head.getDecimal(0)
      .compareTo(new java.math.BigDecimal("-987654321098765432.1098")) == 0)
    assert(got.where(col("k") === 0).select("big").head.getDecimal(0)
      .compareTo(new java.math.BigDecimal("1234567890123456789.5000")) == 0)
    // the batch DSv2 read agrees with the native snapshot
    val viaSource = spark.read.format("graft.sources.TxLogSource")
      .load(base).agg(sum("d").cast("string")).head.getString(0)
    val native = TxLog.read(spark, base)
      .agg(sum("d").cast("string")).head.getString(0)
    assert(viaSource == native)
  }
}
