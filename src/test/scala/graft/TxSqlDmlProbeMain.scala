package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TxLog

/** Does the SQL `MERGE INTO` surface keep the API's O(change)
  * economics at scale? 20M-row key-clustered log table, 100k-row
  * (0.5%) CDC batch, three routes:
  *   (a) SQL MERGE INTO (resolution rule → mergeMorAuto)
  *   (b) the API mergeMor directly
  *   (c) full-snapshot rebuild (read ∪ merge ∪ overwrite) — the shape
  *       a consumer without row-level DML falls back to
  * Run: sbt -batch "Test/runMain graft.TxSqlDmlProbeMain"
  * Numbers go to BENCH_NOTES.md. */
object TxSqlDmlProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nRows = 20_000_000L
    val batch = 100_000L
    def table = spark.range(0, nRows)
      .select(col("id").as("k"), (col("id") % 97).cast("double").as("v"),
        md5(col("id").cast("string")).as("payload"))
      .repartitionByRange(64, col("k"))
    // CDC batch confined to a narrow key band (the clustered-CDC shape)
    def cdc = spark.range(5_000_000L, 5_000_000L + batch)
      .select(col("id").as("k"), lit(-1.0).as("v"),
        md5(concat(lit("upd"), col("id").cast("string"))).as("payload"))

    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label%-42s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def newBytes(base: String, beforePaths: Set[String]): Long = {
      val fs0 = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      TxLog.manifest(spark, base, TxLog.latestVersion(spark, base).get)._1
        .filterNot(e => beforePaths.contains(e.path))
        .map(e => fs0.getFileStatus(
          new org.apache.hadoop.fs.Path(TxLog.resolve(base, e.path))).getLen)
        .sum
    }

    // (a) SQL MERGE
    val a = "/tmp/graft_sqldml_probe/sql"
    TxLog.drop(spark, a)
    timed("seed 20M (clustered, stats on k)") {
      TxLog.commit(table, a, None, Some("k"))
    }
    val beforeA = TxLog.manifestFiles(spark, a, 1L).toSet
    graft.sources.TxLogSqlDml.ensureInjected(spark)
    val sqlS = spark.newSession()
    sqlS.sql("DROP TABLE IF EXISTS probe_sql_merge")
    sqlS.sql("CREATE TABLE probe_sql_merge " +
      s"USING graft.sources.TxLogSource OPTIONS (path '$a')")
    cdc.createOrReplaceTempView("ignored") // keep plan fresh
    cdc.write.mode("overwrite").parquet("/tmp/graft_sqldml_probe/cdc")
    timed("(a) SQL MERGE INTO, 100k batch") {
      sqlS.sql("MERGE INTO probe_sql_merge t USING (SELECT * FROM " +
        "parquet.`/tmp/graft_sqldml_probe/cdc`) s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    }
    println(f"    new bytes written: ${newBytes(a, beforeA) / 1e6}%.1f MB")
    sqlS.sql("DROP TABLE IF EXISTS probe_sql_merge")

    // (b) API mergeMor
    val b = "/tmp/graft_sqldml_probe/api"
    TxLog.drop(spark, b)
    TxLog.commit(table, b, None, Some("k"))
    val beforeB = TxLog.manifestFiles(spark, b, 1L).toSet
    timed("(b) API mergeMor, 100k batch") {
      TxLog.mergeMor(spark, b, cdc, Seq("k"), "k")
    }
    println(f"    new bytes written: ${newBytes(b, beforeB) / 1e6}%.1f MB")

    // (c) full-snapshot rebuild
    val c = "/tmp/graft_sqldml_probe/full"
    TxLog.drop(spark, c)
    TxLog.commit(table, c, None, Some("k"))
    timed("(c) full rebuild (anti ∪ cdc, overwrite)") {
      val cur = TxLog.read(spark, c)
      val merged = cur.join(cdc.select("k"), Seq("k"), "left_anti")
        .unionByName(cdc)
      TxLog.commit(merged.repartitionByRange(64, col("k")), c,
        TxLog.latestVersion(spark, c), Some("k"))
    }

    // correctness cross-check: all three end states identical
    def sig(base: String) = TxLog.read(spark, base)
      .agg(count(lit(1)), bit_xor(xxhash64(col("k"), col("v"),
        col("payload")))).head()
    val (sa, sb, sc) = (sig(a), sig(b), sig(c))
    println(s"signatures identical=${sa == sb && sb == sc} ($sa)")
    spark.stop()
  }
}
