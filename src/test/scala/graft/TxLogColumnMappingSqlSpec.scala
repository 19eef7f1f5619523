package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.TxLog

/** Column mapping across the SQL/DSv2 surface — the half a JDBC or
  * dbt-shaped consumer touches (the operator-layer laws live in
  * [[TxLogColumnMappingSpec]]): `ALTER TABLE ... RENAME/DROP COLUMN`
  * through the catalog, logical-name SELECT/INSERT/DML over SQL,
  * the DSv2 path reader (vectorized AND mask row-reader), manifest
  * pruning + metadata-only aggregates through logical names, time
  * travel below a rename, and the streaming source/sink pair. */
class TxLogColumnMappingSqlSpec extends AnyFunSuite {
  private lazy val spark = {
    val s0 = SparkTestBase.spark
    graft.sources.TxLogSqlDml.ensureInjected(s0)
    val s = s0.newSession()
    s.conf.set("spark.sql.catalog.graft", "graft.sources.TxLogCatalog")
    s.conf.set("spark.sql.catalog.graft.warehouse",
      "/tmp/graft_cmapsql/warehouse")
    s
  }
  private def sql(q: String) = spark.sql(q)

  private def physicalColumns(base: String): Set[String] = {
    val v = TxLog.latestVersion(spark, base).get
    spark.read.option("mergeSchema", "true")
      .parquet(TxLog.manifestFiles(spark, base, v)
        .map(TxLog.resolve(base, _)): _*)
      .columns.toSet
  }

  test("SQL lifecycle on a mapped table: ALTER RENAME COLUMN is " +
    "metadata-only, SELECT/INSERT speak logical names, files stay " +
    "physical; DROP then re-ADD scans NULL over SQL") {
    val base = "/tmp/graft_cmapsql/warehouse/cm/t1"
    TxLog.drop(spark, base)
    sql("CREATE NAMESPACE IF NOT EXISTS graft.cm")
    sql("DROP TABLE IF EXISTS graft.cm.t1")
    sql("CREATE TABLE graft.cm.t1 (k BIGINT, v BIGINT) " +
      "USING graft.sources.TxLogSource")
    sql("INSERT INTO graft.cm.t1 SELECT id AS k, id * 10 AS v " +
      "FROM range(1, 101)")
    val filesBefore = TxLog.manifestFiles(spark, base,
      TxLog.latestVersion(spark, base).get).toSet
    sql("ALTER TABLE graft.cm.t1 RENAME COLUMN v TO amount")
    // logical surface over SQL; zero data movement
    val out = sql("SELECT * FROM graft.cm.t1")
    assert(out.schema.fieldNames.toSeq == Seq("k", "amount"))
    assert(out.agg(sum("amount")).head.getLong(0) ==
      (1L to 100L).map(_ * 10).sum)
    assert(TxLog.manifestFiles(spark, base,
      TxLog.latestVersion(spark, base).get).toSet == filesBefore)
    assert(physicalColumns(base) == Set("k", "v"))
    // INSERT through the logical name lands under the frozen physical
    sql("INSERT INTO graft.cm.t1 VALUES (500, 5000)")
    assert(physicalColumns(base) == Set("k", "v"),
      "a post-rename INSERT must not mint a file with the logical name")
    assert(sql("SELECT amount FROM graft.cm.t1 WHERE k = 500")
      .head.getLong(0) == 5000L)
    // DROP COLUMN hides the bytes; re-ADD is born fresh (NULL)
    sql("ALTER TABLE graft.cm.t1 DROP COLUMN amount")
    assert(sql("SELECT * FROM graft.cm.t1").schema.fieldNames.toSeq ==
      Seq("k"))
    sql("ALTER TABLE graft.cm.t1 ADD COLUMNS (amount BIGINT)")
    val readd = sql("SELECT * FROM graft.cm.t1")
    assert(readd.schema.fieldNames.toSeq == Seq("k", "amount"))
    assert(readd.where(col("amount").isNotNull).count() == 0L,
      "re-ADD after DROP must scan as NULL over SQL, not dropped bytes")
    // dropping an unknown column stays loud (Spark's analyzer rejects
    // it against the table schema before the catalog is even asked)
    val ex = intercept[Exception] {
      sql("ALTER TABLE graft.cm.t1 DROP COLUMN nope")
    }
    assert(ex.getMessage.contains("does not exist") ||
      ex.getMessage.contains("cannot be resolved"), ex.getMessage)
  }

  test("metadata-only aggregates and manifest pruning answer through " +
    "logical names; EXPLAIN shows the pruned file count") {
    val base = "/tmp/graft_cmapsql/warehouse/cm/prune"
    TxLog.drop(spark, base)
    sql("CREATE NAMESPACE IF NOT EXISTS graft.cm")
    sql("DROP TABLE IF EXISTS graft.cm.prune")
    sql("CREATE TABLE graft.cm.prune (k BIGINT, v BIGINT) " +
      "USING graft.sources.TxLogSource")
    // 4 clustered one-file commits so stats pruning has bands
    (0L until 4L).foreach { b =>
      val lo = b * 100L + 1L
      TxLog.append(spark.range(lo, lo + 100L)
        .select(col("id").as("k"), (col("id") * 10L).as("v"))
        .repartition(1), base, Some("k"))
    }
    sql("ALTER TABLE graft.cm.prune RENAME COLUMN k TO id")
    // metadata-only agg: count + min/max via the LOGICAL name resolve
    // from manifest stats keyed on the physical one (zero files read)
    val agg = sql(
      "SELECT count(*) AS n, min(id) AS lo, max(id) AS hi FROM graft.cm.prune")
    assert(agg.queryExecution.executedPlan.toString.contains("TxLogAggScan"),
      "an unfiltered count/min/max must stay metadata-only after a rename")
    val r = agg.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((400L, 1L, 400L)))
    // range predicate on the logical name prunes by physical stats
    val q = sql("SELECT id, v FROM graft.cm.prune WHERE id BETWEEN 150 AND 160")
    assert(q.count() == 11L)
    val explain = q.queryExecution.executedPlan.toString
    assert(explain.contains("prunedFiles=1/4"),
      s"expected 1/4 files kept by manifest stats, plan was:\n$explain")
  }

  test("the DSv2 path reader serves logical names on both decode " +
    "paths (vectorized clean files, row-reader masked files); " +
    "versionAsOf below the rename time-travels to the old names") {
    val base = "/tmp/graft_cmapsql/dsv2"
    TxLog.drop(spark, base)
    TxLog.commit(spark.range(1, 101)
      .select(col("id").as("k"), (col("id") * 10L).as("v")), base,
      None, Some("k"))
    TxLog.renameColumn(spark, base, "v", "amount")          // v2
    val clean = spark.read.format("graft.sources.TxLogSource").load(base)
    assert(clean.columns.toSeq == Seq("k", "amount"))
    assert(clean.agg(sum("amount")).head.getLong(0) ==
      (1L to 100L).map(_ * 10).sum)
    // time travel below the rename: the old logical surface
    val v1 = spark.read.format("graft.sources.TxLogSource")
      .option("versionAsOf", "1").load(base)
    assert(v1.columns.toSeq == Seq("k", "v"))
    // a MOR delete forces the mask row-reader path; logical names and
    // row-precise masking must both hold
    TxLog.deleteRangeMor(spark, base, "k", 10L, 19L)        // v3
    val masked = spark.read.format("graft.sources.TxLogSource").load(base)
    assert(masked.columns.toSeq == Seq("k", "amount"))
    assert(masked.count() == 90L)
    assert(masked.where(col("k").between(10L, 19L)).count() == 0L)
    assert(masked.agg(sum("amount")).head.getLong(0) ==
      (1L to 100L).filterNot(k => k >= 10 && k <= 19).map(_ * 10).sum)
  }

  test("SQL row-level DML speaks logical names on a mapped catalog " +
    "table: DELETE FROM, UPDATE, MERGE INTO") {
    val base = "/tmp/graft_cmapsql/warehouse/cm/dml"
    TxLog.drop(spark, base)
    sql("CREATE NAMESPACE IF NOT EXISTS graft.cm")
    sql("DROP TABLE IF EXISTS graft.cm.dml")
    sql("CREATE TABLE graft.cm.dml (k BIGINT, v BIGINT) " +
      "USING graft.sources.TxLogSource")
    sql("INSERT INTO graft.cm.dml SELECT id AS k, id * 10 AS v " +
      "FROM range(1, 101)")
    sql("ALTER TABLE graft.cm.dml RENAME COLUMN v TO amount")
    sql("DELETE FROM graft.cm.dml WHERE amount > 900")
    assert(sql("SELECT count(*) AS n FROM graft.cm.dml").head.getLong(0)
      == 90L)
    sql("UPDATE graft.cm.dml SET amount = amount + 1 WHERE k = 7")
    assert(sql("SELECT amount FROM graft.cm.dml WHERE k = 7")
      .head.getLong(0) == 71L)
    sql("MERGE INTO graft.cm.dml t USING " +
      "(SELECT CAST(5 AS BIGINT) AS k, CAST(555 AS BIGINT) AS amount " +
      "UNION ALL SELECT 200, 2000) s " +
      "ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT *")
    assert(sql("SELECT amount FROM graft.cm.dml WHERE k = 5")
      .head.getLong(0) == 555L)
    assert(sql("SELECT amount FROM graft.cm.dml WHERE k = 200")
      .head.getLong(0) == 2000L)
    assert(physicalColumns(base) == Set("k", "v"),
      "every DML rewrite must keep landing files under physical names")
  }

  test("streaming over a mapped table: the source serves logical " +
    "names; the sink accepts them and lands physical files") {
    val src = "/tmp/graft_cmapsql/stream_src"
    val dst = "/tmp/graft_cmapsql/stream_dst"
    val ckpt = "/tmp/graft_cmapsql/stream_ckpt"
    Seq(src, dst, ckpt).foreach(TxLog.drop(spark, _))
    TxLog.commit(spark.range(1, 51)
      .select(col("id").as("k"), (col("id") * 10L).as("v")), src,
      None, Some("k"))
    TxLog.renameColumn(spark, src, "v", "amount")
    // the sink table is mapped too (rename before any stream lands)
    TxLog.commit(spark.range(0, 0)
      .select(col("id").as("k"), col("id").as("v")), dst, None)
    TxLog.renameColumn(spark, dst, "v", "amount")
    val q = spark.readStream.format("graft.sources.TxLogSource").load(src)
      .writeStream.format("graft.sources.TxLogSource")
      .option("path", dst).option("checkpointLocation", ckpt)
      .option("statsColumns", "k")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = TxLog.read(spark, dst)
    assert(out.columns.toSeq == Seq("k", "amount"))
    assert(out.count() == 50L)
    assert(out.agg(sum("amount")).head.getLong(0) ==
      (1L to 50L).map(_ * 10).sum)
    assert(physicalColumns(dst) == Set("k", "v"),
      "the streaming sink must land files under the physical names")
  }
}
