package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TxLog

/** `COPY INTO` — Databricks' idempotent bulk load, the reference's
  * scheduled bronze ingestion as one SQL verb. The laws pin the
  * exactly-once contract (per-file markers in the txn map: re-runs
  * load nothing, new files load alone, the state survives OPTIMIZE
  * and vacuum because txn lines ride every commit and checkpoint)
  * and the schema contract (COPY never evolves the target). */
class TxLogCopyIntoSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def writeWave(dir: String, name: String,
                        rows: Seq[(Long, String)]): Unit = {
    val tmp = s"$dir/__tmp_$name"
    rows.toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(tmp)
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = f.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .find(_.getPath.getName.endsWith(".parquet")).get.getPath
    f.rename(part, new org.apache.hadoop.fs.Path(s"$dir/$name.parquet"))
    f.delete(new org.apache.hadoop.fs.Path(tmp), true)
  }

  test("per-file exactly-once: first run loads, re-run loads nothing, " +
    "a new file loads alone; the state survives OPTIMIZE and VACUUM") {
    val src = "/tmp/graft_txcopy/src1"
    val base = "/tmp/graft_txcopy/t1"
    val f = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(src), true)
    TxLog.drop(spark, base)
    TxLog.append(Seq((0L, "seed")).toDF("k", "v"), base, Some("k"))
    writeWave(src, "a", (1L to 50L).map(k => (k, s"a$k")))
    writeWave(src, "b", (51L to 80L).map(k => (k, s"b$k")))
    val (v1, nf1, nr1) = TxLog.copyInto(spark, base, src, "parquet")
    assert(nf1 == 2 && nr1 == 80, s"($v1, $nf1, $nr1)")
    val (_, nf2, nr2) = TxLog.copyInto(spark, base, src, "parquet")
    assert(nf2 == 0 && nr2 == 0, "re-run must be a no-op")
    writeWave(src, "c", (81L to 90L).map(k => (k, s"c$k")))
    val (_, nf3, nr3) = TxLog.copyInto(spark, base, src, "parquet")
    assert(nf3 == 1 && nr3 == 10, "only the NEW file loads")
    assert(TxLog.read(spark, base).count() == 91)
    // the idempotency state survives table maintenance: txn lines
    // ride every commit and the vacuum checkpoint
    TxLog.compact(spark, base, 1L << 20, 1L << 22)
    TxLog.vacuum(spark, base, keepLast = 1, graceMs = 0L)
    val (_, nf4, _) = TxLog.copyInto(spark, base, src, "parquet")
    assert(nf4 == 0,
      "after OPTIMIZE + VACUUM the loaded-file state must survive")
    assert(TxLog.read(spark, base).count() == 91)
  }

  test("schema contract: unknown source columns fail loudly; omitted " +
    "declared columns fill through the NULL/DEFAULT path; values cast " +
    "to the declared types") {
    val wh = "/tmp/graft_txcopy/wh"
    val src = "/tmp/graft_txcopy/src2"
    val srcBad = "/tmp/graft_txcopy/src2bad"
    val f = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(src), true)
    f.delete(new org.apache.hadoop.fs.Path(srcBad), true)
    graft.sources.TxLogSqlDml.ensureInjected(spark)
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft", "graft.sources.TxLogCatalog")
    s.conf.set("spark.sql.catalog.graft.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft.lake")
    s.sql("DROP TABLE IF EXISTS graft.lake.cp")
    s.sql("CREATE TABLE graft.lake.cp (k BIGINT, v STRING, " +
      "tier STRING DEFAULT 'std') USING graft.sources.TxLogSource")
    writeWave(src, "w1", (1L to 20L).map(k => (k, s"v$k")))
    val (_, nf, nr) = TxLog.copyInto(s, s"$wh/lake/cp", src, "parquet")
    assert(nf == 1 && nr == 20)
    val got = s.sql("SELECT count(*) AS n, count(tier) AS nt, " +
      "min(tier) AS t FROM graft.lake.cp").head
    assert(got.getLong(0) == 20 && got.getLong(1) == 20 &&
      got.getString(2) == "std",
      s"the omitted DEFAULT column must fill: $got")
    // unknown source column → loud veto, nothing lands
    Seq((1L, "x", 9, "zz")).toDF("k", "v", "extra", "tier")
      .coalesce(1).write.mode("overwrite").parquet(srcBad)
    val e = intercept[Exception] {
      TxLog.copyInto(s, s"$wh/lake/cp", srcBad, "parquet")
    }
    assert(e.getMessage.contains("not in the target schema"),
      e.getMessage)
    assert(s.sql("SELECT count(*) AS n FROM graft.lake.cp")
      .head.getLong(0) == 20, "the veto must land nothing")
  }

  test("vacuumCopyState bounds the marker growth: markers older than " +
    "the cutoff drop (a metadata-only commit), newer ones keep the " +
    "exactly-once guarantee, and a pruned file WOULD reload — the " +
    "documented tradeoff") {
    val src = "/tmp/graft_txcopy/prune_src"
    val base = "/tmp/graft_txcopy/prune_t"
    val f = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(src), true)
    TxLog.drop(spark, base)
    TxLog.append(Seq((0L, "seed")).toDF("k", "v"), base, Some("k"))
    writeWave(src, "old", (1L to 5L).map(k => (k, s"o$k")))
    writeWave(src, "new", (6L to 9L).map(k => (k, s"n$k")))
    TxLog.copyInto(spark, base, src, "parquet")
    // the markers recorded the files' load-time mtimes; a cutoff just
    // above them prunes (as a retention sweep months later would)
    val cutoff = f.getFileStatus(
      new org.apache.hadoop.fs.Path(s"$src/old.parquet"))
      .getModificationTime
    val (_, dropped) = TxLog.vacuumCopyState(spark, base, cutoff + 1L)
    assert(dropped >= 1L, "the old marker must drop")
    val txns = TxLog.manifest(spark, base,
      TxLog.latestVersion(spark, base).get)._2
    assert(txns.keys.count(_.startsWith("copy#")) == 2 - dropped.toInt,
      s"kept markers: ${txns.keys.toSeq.sorted}")
    // the pruned file is loadable again (the documented tradeoff);
    // its rows would duplicate — which is WHY the contract says prune
    // only past the source-retention window
    val (_, nf, _) = TxLog.copyInto(spark, base, src, "parquet")
    assert(nf >= 1, "the pruned file reloads — the stated tradeoff")
  }

  test("concurrency: two racing COPY INTOs of the same directory load " +
    "every file EXACTLY once — the loser detects the overlap inside " +
    "the CAS and discards its whole landed batch") {
    val src = "/tmp/graft_txcopy/race_src"
    val base = "/tmp/graft_txcopy/race_t"
    val f = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(src), true)
    TxLog.drop(spark, base)
    TxLog.append(Seq((0L, "seed")).toDF("k", "v"), base, Some("k"))
    (1 to 6).foreach(i => writeWave(src, s"w$i",
      ((i * 100L) until (i * 100L + 10L)).map(k => (k, s"v$k"))))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val racers = (1 to 2).map(_ => Future {
      TxLog.copyInto(spark, base, src, "parquet")
    })
    val outcomes = racers.map(Await.result(_, 120.seconds))
    val loaded = outcomes.map(_._2).sum
    assert(loaded == 6,
      s"exactly 6 files across both racers, got $outcomes")
    val content = TxLog.read(spark, base)
    assert(content.count() == 61, "60 copied rows + the seed, no dupes")
    assert(content.groupBy("k").count().where("count > 1").count() == 0,
      "no row may load twice")
    // a third run after the race is a clean no-op
    val (_, nf, _) = TxLog.copyInto(spark, base, src, "parquet")
    assert(nf == 0)
  }

  test("partial overlap never under-ingests: a full-directory load " +
    "racing a subset-pattern load still lands EVERY file exactly once " +
    "— the loser retries with the survivors instead of reporting zero") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    (1 to 3).foreach { round =>
      val src = s"/tmp/graft_txcopy/partial_src$round"
      val base = s"/tmp/graft_txcopy/partial_t$round"
      val f = new org.apache.hadoop.fs.Path(src)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      f.delete(new org.apache.hadoop.fs.Path(src), true)
      TxLog.drop(spark, base)
      TxLog.append(Seq((0L, "seed")).toDF("k", "v"), base, Some("k"))
      writeWave(src, "aa", (100L to 109L).map(k => (k, s"v$k")))
      writeWave(src, "bb", (200L to 209L).map(k => (k, s"v$k")))
      writeWave(src, "cc", (300L to 309L).map(k => (k, s"v$k")))
      // racer 1 loads ONLY aa; racer 2 loads everything — under the
      // unlucky interleaving racer 2's batch partially overlaps
      // racer 1's commit, and before the retry fix it would discard
      // bb+cc and report (v, 0, 0) as if fully loaded
      val sub = Future {
        TxLog.copyInto(spark, base, src, "parquet", pattern = Some("aa*")) }
      val full = Future { TxLog.copyInto(spark, base, src, "parquet") }
      val outs = Seq(sub, full).map(Await.result(_, 120.seconds))
      assert(outs.map(_._2).sum == 3,
        s"round $round: 3 files across both racers, got $outs")
      val content = TxLog.read(spark, base)
      assert(content.count() == 31,
        s"round $round: 30 copied rows + seed — nothing under-ingested")
      assert(content.groupBy("k").count().where("count > 1").count() == 0)
      // and the state is complete: a follow-up run is a no-op
      val (_, nf, _) = TxLog.copyInto(spark, base, src, "parquet")
      assert(nf == 0, s"round $round: post-race run must be a no-op")
    }
  }

  test("interaction: COPY INTO a PARTITIONED table with a GENERATED " +
    "partition column derives, splits one-file-per-tuple, and prunes — " +
    "the full write choke point applies to bulk loads") {
    val wh = "/tmp/graft_txcopy/wh"
    val src = "/tmp/graft_txcopy/src4"
    val f = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(src), true)
    graft.sources.TxLogSqlDml.ensureInjected(spark)
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft", "graft.sources.TxLogCatalog")
    s.conf.set("spark.sql.catalog.graft.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft.lake")
    s.sql("DROP TABLE IF EXISTS graft.lake.cpart")
    s.sql("CREATE TABLE graft.lake.cpart (k BIGINT, grp INT " +
      "GENERATED ALWAYS AS (CAST(k % 3 AS INT))) " +
      "USING graft.sources.TxLogSource PARTITIONED BY (grp)")
    // the source supplies ONLY k — the engine derives grp and splits
    Seq.tabulate(30)(i => Tuple1(i.toLong)).toDF("k")
      .coalesce(1).write.mode("overwrite").parquet(src)
    val base = s"$wh/lake/cpart"
    val (_, nf, nr) = TxLog.copyInto(s, base, src, "parquet",
      pattern = Some("part-*.parquet"))
    assert(nf == 1 && nr == 30)
    val entries = TxLog.manifest(s, base,
      TxLog.latestVersion(s, base).get)._1
    assert(entries.size == 3,
      s"one file per derived partition tuple, got ${entries.size}")
    val got = s.sql("SELECT grp, count(*) AS n FROM graft.lake.cpart " +
      "GROUP BY 1 ORDER BY 1").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toSeq
    assert(got == Seq(0 -> 10L, 1 -> 10L, 2 -> 10L), s"got $got")
  }

  test("SQL: COPY INTO with PATTERN and FORMAT_OPTIONS routes through " +
    "the parser rung; CSV headers honored; result row reports counts") {
    val src = "/tmp/graft_txcopy/src3"
    val base = "/tmp/graft_txcopy/t3"
    val f = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(src), true)
    f.mkdirs(new org.apache.hadoop.fs.Path(src))
    def csv(name: String, body: String): Unit = {
      val out = f.create(new org.apache.hadoop.fs.Path(s"$src/$name"), true)
      try out.write(body.getBytes("UTF-8")) finally out.close()
    }
    csv("d1.csv", "k,v\n1,one\n2,two\n")
    csv("d2.csv", "k,v\n3,three\n")
    csv("ignore.txt", "not,data\n9,nine\n")
    TxLog.drop(spark, base)
    import spark.implicits._
    // seed INT k: CSV inferSchema lands int files, and int+long
    // footers cannot mergeSchema — the seed must match
    TxLog.append(Seq((0, "seed")).toDF("k", "v"), base, Some("k"))
    graft.sources.TxLogSqlDml.ensureInjected(spark)
    val s = spark.newSession()
    s.sql("DROP TABLE IF EXISTS txcopy_w")
    s.sql("CREATE TABLE txcopy_w USING graft.sources.TxLogSource " +
      s"OPTIONS (path '$base')")
    try {
      val r = s.sql(s"COPY INTO txcopy_w FROM '$src' FILEFORMAT = CSV " +
        "PATTERN = '*.csv' " +
        "FORMAT_OPTIONS ('header' = 'true', 'inferSchema' = 'true')")
        .collect().head
      assert(r.getLong(1) == 2 && r.getLong(2) == 3,
        s"2 csv files / 3 rows expected, got $r")
      val again = s.sql(s"COPY INTO txcopy_w FROM '$src' " +
        "FILEFORMAT = CSV PATTERN = '*.csv' " +
        "FORMAT_OPTIONS ('header' = 'true', 'inferSchema' = 'true')")
        .collect().head
      assert(again.getLong(1) == 0 && again.getLong(2) == 0)
      assert(TxLog.readEvolved(spark, base).count() == 4)
    } finally s.sql("DROP TABLE IF EXISTS txcopy_w")
  }
}
