package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{TxLog, TxLogPlan}

/** Columnar (parquet) checkpoints + distributed log planning — the
  * 100-TB ceiling item: snapshot resolution, file skipping and VACUUM
  * planning must stop materializing the full entry list on the
  * driver. Laws: (1) the columnar path is CONTENT-identical to the
  * text path across appends, DML, time travel and vacuum; (2) the
  * checkpoint file carries the reader-5 protocol gate (an ignorant
  * engine errors loudly instead of resolving an empty snapshot);
  * (3) distributed pruning returns exactly the driver sweep's
  * survivors; (4) the migration verb retrofits an existing text-era
  * table. */
class TxLogParquetCkptSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def clustered(lo: Long, n: Long, tag: String, parts: Int) =
    spark.range(lo, lo + n)
      .select(col("id").as("k"), concat(lit(tag), lit("-"), col("id")).as("s"))
      .repartitionByRange(parts, col("k"))

  private def contents(d: DataFrame): Set[(Long, String)] =
    d.select("k", "s").collect().map(r => (r.getLong(0), r.getString(1))).toSet

  private def withParquetCkpts[T](body: => T): T = {
    spark.conf.set("spark.graft.txlog.checkpointFormat", "parquet")
    try body
    finally spark.conf.unset("spark.graft.txlog.checkpointFormat")
  }

  private def fsOf(p: String) = new org.apache.hadoop.fs.Path(p)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("columnar checkpoint round-trip: the periodic checkpoint is a " +
    "parquet dataset + a gated marker file; resolution across it is " +
    "content-identical to the text path, including time travel BELOW " +
    "the checkpoint") {
    val base = "/tmp/graft_txpq/roundtrip"
    TxLog.drop(spark, base)
    withParquetCkpts {
      spark.conf.set("spark.graft.txlog.checkpointInterval", "5")
      try {
        (0 until 12).foreach(i =>
          TxLog.append(clustered(i * 10L, 10L, s"w$i", 1), base, Some("k")))
      } finally spark.conf.unset("spark.graft.txlog.checkpointInterval")
    }
    val f = fsOf(base)
    // v5 and v10 checkpointed columnar: dataset dir + marker file
    Seq(5L, 10L).foreach { v =>
      assert(f.exists(TxLog.ckptPath(base, v)), s"marker file at v$v")
      assert(f.exists(TxLogPlan.pqDirPath(base, v)), s"parquet dir at v$v")
      val lines = TxLog.linesOf(spark, base, TxLog.ckptPath(base, v))
      assert(lines.exists(_.startsWith("#parquet\t")), "marker line")
      assert(lines.exists(_.startsWith("#protocol\t5\t")),
        "reader-5 gate: an ignorant engine must fail loudly, not " +
          "resolve an empty snapshot")
      assert(!lines.exists(l => !l.startsWith("#")),
        "no entry lines in the marker file — they live in the parquet")
    }
    // resolution across the columnar base: cold cache, full content
    TxLog.cachePurge(base)
    assert(contents(TxLog.read(spark, base)) ==
      (0L until 120L).map(k => (k, s"w${k / 10}-$k")).toSet)
    // time travel: at the checkpoint, above it, and BELOW it (replay
    // walks to the nearest resolvable base underneath)
    assert(TxLog.readVersion(spark, base, 10L).count() == 100L)
    assert(TxLog.readVersion(spark, base, 11L).count() == 110L)
    assert(TxLog.readVersion(spark, base, 3L).count() == 30L)
    // the snapshotDF replay equals the driver list, path for path
    val viaDF = TxLogPlan.snapshotDF(spark, base, 12L)
      .select("path").as[String].collect().toSet
    val viaDriver = TxLog.manifest(spark, base, 12L)._1.map(_.path).toSet
    assert(viaDF == viaDriver)
  }

  test("distributed pruning returns exactly the driver sweep's " +
    "survivors, and readRanges over a columnar table serves identical " +
    "rows") {
    val base = "/tmp/graft_txpq/prune"
    TxLog.drop(spark, base)
    withParquetCkpts {
      spark.conf.set("spark.graft.txlog.checkpointInterval", "3")
      try {
        (0 until 6).foreach(i =>
          TxLog.append(clustered(i * 100L, 100L, s"w$i", 4), base, Some("k")))
      } finally spark.conf.unset("spark.graft.txlog.checkpointInterval")
    }
    val v = TxLog.latestVersion(spark, base).get
    // cold cache so the planner actually goes distributed
    TxLog.cachePurge(base)
    val dist = TxLogPlan.pruneEntriesForScan(spark, base, v,
      Seq(("k", "130", "180")))
    assert(dist.isDefined, "columnar base present → distributed prune")
    val driver = TxLog.pruneRanges(spark, base, Seq(("k", 130L, 180L)))._1
    assert(dist.get.map(_.path).toSet == driver.map(_.path).toSet,
      "the two pruners must keep the same files")
    assert(dist.get.size < driver.size + 1 &&
      dist.get.size <= 8, s"a narrow range keeps a handful of the " +
        s"table's files, got ${dist.get.size}")
    TxLog.cachePurge(base)
    assert(contents(TxLog.readRange(spark, base, "k", 130L, 180L)) ==
      (130L to 180L).map(k => (k, s"w${k / 100}-$k")).toSet)
  }

  test("typed stats columns: the columnar checkpoint carries NATIVE " +
    "min/max per stats key (Delta's stats_parsed), the prune plans " +
    "through Catalyst comparisons pushed to parquet — no line-parse " +
    "UDF over the checkpoint — and keeps exactly the line-path " +
    "survivors, NULL-stats entries included") {
    val base = "/tmp/graft_txpq/typed"
    TxLog.drop(spark, base)
    withParquetCkpts {
      spark.conf.set("spark.graft.txlog.checkpointInterval", "3")
      try {
        (0 until 2).foreach(i =>
          TxLog.append(clustered(i * 100L, 100L, s"w$i", 4), base, Some("k")))
        // a stats-LESS file INSIDE the checkpoint: its typed columns
        // go NULL there, and the native prune must keep it
        TxLog.append(clustered(9000L, 5L, "w9", 1), base, None)
        (2 until 4).foreach(i =>
          TxLog.append(clustered(i * 100L, 100L, s"w$i", 4), base, Some("k")))
      } finally spark.conf.unset("spark.graft.txlog.checkpointInterval")
    }
    val v = TxLog.latestVersion(spark, base).get
    val ckptV = (1L to v).filter(cv => new java.io.File(
      TxLogPlan.pqDirPath(base, cv).toUri.getPath).isDirectory).max
    val full = TxLogPlan.readCheckpointDFFull(spark, base, ckptV)
    val mn = TxLogPlan.sminName("k"); val mx = TxLogPlan.smaxName("k")
    assert(full.columns.contains(mn) && full.columns.contains(mx),
      s"typed stats columns expected, got ${full.columns.mkString(",")}")
    assert(full.schema(mn).dataType ==
      org.apache.spark.sql.types.LongType,
      "a long-dtype stats key must surface as a native LongType column")
    // the native filter pushes to the parquet scan — the exact
    // mechanism that lets row-group min/max skip checkpoint bytes on
    // a 10^6-entry table
    val nativeFiltered = full.where(col(mn).isNull ||
      (col(mx) >= lit(130L) && col(mn) <= lit(180L)))
    val plan = nativeFiltered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      (plan.contains(s"GreaterThanOrEqual($mx,130")
        || plan.contains(s"LessThanOrEqual($mn,180")),
      s"typed prune must reach the parquet scan as pushed filters:\n$plan")
    // survivors == the driver's line-path sweep, including the
    // stats-less file (NULL typed columns = always keep)
    TxLog.cachePurge(base)
    val dist = TxLogPlan.pruneEntriesForScan(spark, base, v,
      Seq(("k", "130", "180"))).get
    val driver = TxLog.pruneRanges(spark, base, Seq(("k", 130L, 180L)))._1
    assert(dist.map(_.path).toSet == driver.map(_.path).toSet)
    assert(dist.exists(_.statsFor("k").isEmpty),
      "the stats-less file must survive through NULL typed columns")
  }

  test("checkpoint retention: full VACUUM reclaims SUPERSEDED " +
    "mid-range checkpoints (bytes only) — the newest kept base and " +
    "the oldest kept version's resolvability survive, and a later " +
    "vacuum re-materializes a base where it needs one") {
    val base = "/tmp/graft_txpq/ckptgc"
    TxLog.drop(spark, base)
    withParquetCkpts {
      spark.conf.set("spark.graft.txlog.checkpointInterval", "2")
      try (0 until 8).foreach(i =>
        TxLog.append(clustered(i * 10L, 10L, s"w$i", 1), base, Some("k")))
      finally spark.conf.unset("spark.graft.txlog.checkpointInterval")
    }
    val f = fsOf(base)
    def hasCkpt(v: Long) = f.exists(TxLog.ckptPath(base, v))
    assert(hasCkpt(2) && hasCkpt(4) && hasCkpt(6) && hasCkpt(8),
      "fixture: interval checkpoints at v2/v4/v6/v8")
    // the dry run previews the superseded set before anything moves
    val preview = TxLog.vacuumDryRun(spark, base, keepLast = 8,
        graceMs = 0L)
      .where(col("kind") === "checkpoint").count()
    assert(preview == 3, s"v2/v4/v6 are superseded, got $preview")
    val kept = TxLog.vacuum(spark, base, keepLast = 8, graceMs = 0L)
    assert(kept.size == 8)
    assert(!hasCkpt(2) && !hasCkpt(4) && !hasCkpt(6) && hasCkpt(8),
      "mid-range checkpoints reclaim; the newest kept base survives")
    assert(!f.exists(TxLogPlan.pqDirPath(base, 4L)),
      "the columnar payload dir goes with its marker")
    // every kept version still resolves (replay off surviving bases)
    TxLog.cachePurge(base)
    assert(TxLog.readVersion(spark, base, 3L).count() == 30L)
    assert(TxLog.readVersion(spark, base, 5L).count() == 50L)
    assert(contents(TxLog.read(spark, base)).size == 80)
    // a vacuum that DROPS history re-materializes the base it needs
    // even though the retention pass deleted that version's checkpoint
    val kept2 = TxLog.vacuum(spark, base, keepLast = 3, graceMs = 0L)
    assert(kept2 == Seq(6L, 7L, 8L))
    assert(hasCkpt(6), "the oldest kept version re-bases on a fresh " +
      "checkpoint")
    TxLog.cachePurge(base)
    assert(contents(TxLog.read(spark, base)).size == 80)
  }

  test("VACUUM LITE on a columnar table: the reclaim set is computed " +
    "distributed, superseded OPTIMIZE inputs are deleted, live files " +
    "and DV sidecars survive, and the kept history re-bases on a " +
    "columnar checkpoint") {
    val base = "/tmp/graft_txpq/vlite"
    TxLog.drop(spark, base)
    withParquetCkpts {
      (0 until 4).foreach(i =>
        TxLog.append(clustered(i * 50L, 50L, s"w$i", 2), base, Some("k")))
      // MOR delete → a DV sidecar that must stay as live as its file
      TxLog.deleteRangeMor(spark, base, "k", 10L, 19L)
      val before = contents(TxLog.read(spark, base))
      assert(before.size == 190)
      // phase A: every dropped version's files are still referenced
      // by the kept head (MOR rewrites nothing) — reclaim must be 0
      // and the DV sidecar must survive its ancestry's drop
      val (keptA, recA) = TxLog.vacuumLite(spark, base, keepLast = 1)
      assert(keptA.size == 1 && recA == 0,
        s"still-referenced files never reclaim, got ($keptA, $recA)")
      TxLog.cachePurge(base)
      assert(contents(TxLog.read(spark, base)) == before,
        "the DV sidecar survived — deleted rows stay deleted")
      // phase B: OPTIMIZE supersedes the small files + the DV; their
      // bytes are dead once the pre-OPTIMIZE version drops
      TxLog.compact(spark, base, 1L << 20, 1L << 22)
      val (kept, reclaimed) = TxLog.vacuumLite(spark, base, keepLast = 1)
      assert(kept.size == 1, s"one surviving version, got $kept")
      assert(reclaimed > 0, "the superseded pre-OPTIMIZE files reclaim")
      // the oldest kept version re-based on a COLUMNAR checkpoint
      val f = fsOf(base)
      assert(f.exists(TxLog.ckptPath(base, kept.head)))
      assert(f.exists(TxLogPlan.pqDirPath(base, kept.head)),
        "the re-base checkpoint is parquet (built from the DataFrame)")
      TxLog.cachePurge(base)
      assert(contents(TxLog.read(spark, base)) == before,
        "content survives the vacuum byte-for-byte")
      // dropped versions must fail loudly now
      intercept[Exception] { TxLog.readVersion(spark, base, 2L).count() }
    }
  }

  test("migration: checkpointParquet retrofits a text-era table " +
    "without a driver entry list; mixed text + columnar checkpoints " +
    "resolve side by side") {
    val base = "/tmp/graft_txpq/migrate"
    TxLog.drop(spark, base)
    spark.conf.set("spark.graft.txlog.checkpointInterval", "4")
    try {
      // text era: interval-4 text checkpoints
      (0 until 6).foreach(i =>
        TxLog.append(clustered(i * 10L, 10L, s"w$i", 1), base, Some("k")))
      val f = fsOf(base)
      assert(f.exists(TxLog.ckptPath(base, 4L)) &&
        !f.exists(TxLogPlan.pqDirPath(base, 4L)), "v4 is a text ckpt")
      // migrate at v6
      val v = TxLogPlan.checkpointParquet(spark, base)
      assert(v == 6L && f.exists(TxLogPlan.pqDirPath(base, 6L)))
      TxLog.cachePurge(base)
      assert(TxLog.read(spark, base).count() == 60)
      assert(TxLogPlan.hasParquetBase(spark, base, 6L))
      // below the columnar ckpt the TEXT ckpt still serves
      assert(TxLog.readVersion(spark, base, 5L).count() == 50)
      assert(!TxLogPlan.hasParquetBase(spark, base, 5L))
      // and post-migration writes keep working, columnar from here on
      withParquetCkpts {
        (6 until 9).foreach(i =>
          TxLog.append(clustered(i * 10L, 10L, s"w$i", 1), base, Some("k")))
      }
      assert(f.exists(TxLogPlan.pqDirPath(base, 8L)), "interval ckpt at v8")
      TxLog.cachePurge(base)
      assert(contents(TxLog.read(spark, base)) ==
        (0L until 90L).map(k => (k, s"w${k / 10}-$k")).toSet)
    } finally spark.conf.unset("spark.graft.txlog.checkpointInterval")
  }

  test("OPTIMIZE on a columnar table selects candidates executor-side " +
    "and publishes a DECLARED delta (no entry-list materialization); " +
    "content and file-count behavior match the driver path") {
    val base = "/tmp/graft_txpq/optimize"
    TxLog.drop(spark, base)
    withParquetCkpts {
      spark.conf.set("spark.graft.txlog.checkpointInterval", "2")
      try {
        (0 until 4).foreach(i =>
          TxLog.append(clustered(i * 10L, 10L, s"w$i", 1), base, Some("k")))
      } finally spark.conf.unset("spark.graft.txlog.checkpointInterval")
    }
    TxLog.cachePurge(base) // force the distributed candidate selection
    val preFiles = TxLog.manifest(spark, base, 4L)._1.size
    TxLog.cachePurge(base)
    val v = TxLog.compact(spark, base, 1L << 20, 1L << 22, Some("k"))
    assert(v == 5L)
    val post = TxLog.manifest(spark, base, v)._1
    assert(post.size < preFiles, s"stragglers folded: $preFiles -> ${post.size}")
    TxLog.cachePurge(base)
    assert(contents(TxLog.read(spark, base)) ==
      (0L until 40L).map(k => (k, s"w${k / 10}-$k")).toSet)
    // the OPTIMIZE commit is a DECLARED delta: its manifest lists
    // removes + adds, never a re-publish of carried entries
    val lines = TxLog.linesOf(spark, base, TxLog.manifestPath(base, v))
    assert(lines.contains("#delta"))
    assert(lines.count(_.startsWith("-\t")) == preFiles,
      "every superseded file is declared removed")
  }

  test("DSv2 scan with pushed filters prunes executor-side on a " +
    "columnar table: the SQL surface serves identical rows") {
    val base = "/tmp/graft_txpq/dsv2"
    TxLog.drop(spark, base)
    withParquetCkpts {
      spark.conf.set("spark.graft.txlog.checkpointInterval", "3")
      try {
        (0 until 6).foreach(i =>
          TxLog.append(clustered(i * 100L, 100L, s"w$i", 4), base, Some("k")))
      } finally spark.conf.unset("spark.graft.txlog.checkpointInterval")
    }
    TxLog.cachePurge(base)
    val got = spark.read.format("graft.sources.TxLogSource").load(base)
      .where(col("k").between(250, 260))
    assert(contents(got) ==
      (250L to 260L).map(k => (k, s"w${k / 100}-$k")).toSet)
  }

  test("interaction: MERGE, MOR delete and RESTORE work unchanged " +
    "across a columnar base (the checkpoint loses nothing — stats, " +
    "DVs and row groups ride the line column verbatim)") {
    val base = "/tmp/graft_txpq/dml"
    TxLog.drop(spark, base)
    withParquetCkpts {
      spark.conf.set("spark.graft.txlog.checkpointInterval", "2")
      try {
        (0 until 4).foreach(i =>
          TxLog.append(clustered(i * 10L, 10L, s"w$i", 1), base, Some("k")))
        TxLog.cachePurge(base) // resolve v4 via the v4 columnar ckpt
        val upd = Seq((5L, "UPDATED"), (99L, "NEW")).toDF("k", "s")
        TxLog.mergeCow(spark, base, upd, Seq("k"), "k")
        TxLog.deleteRangeMor(spark, base, "k", 20L, 24L)
        val got = contents(TxLog.read(spark, base))
        val want = ((0L until 40L).filterNot(k => k >= 20L && k <= 24L)
          .map(k => (k, if (k == 5L) "UPDATED" else s"w${k / 10}-$k")) :+
          (99L, "NEW")).toSet
        assert(got == want)
        // RESTORE to the checkpointed version resolves via parquet
        TxLog.restore(spark, base, 4L)
        TxLog.cachePurge(base)
        assert(contents(TxLog.read(spark, base)) ==
          (0L until 40L).map(k => (k, s"w${k / 10}-$k")).toSet)
      } finally spark.conf.unset("spark.graft.txlog.checkpointInterval")
    }
  }
}
