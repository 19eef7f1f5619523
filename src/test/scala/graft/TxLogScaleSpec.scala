package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{TxLog, Upsert}

/** Laws for the v2 manifest's scale features: insert-only append,
  * min/max file skipping, copy-on-write MERGE, and the exactly-once
  * streaming txn map. The unifying claim under test: commit and query
  * work scale with the DELTA (new data / touched range), never the
  * table — the property that separates "correct at sf0.01" from
  * "viable at 100 TB". */
class TxLogScaleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** `n` rows keyed 0..n-1, value tagged by `tag`, range-clustered
    * into `parts` files so each file covers one contiguous key band —
    * the layout a clustered 100 TB fact table would have. */
  private def clustered(lo: Long, n: Long, tag: String, parts: Int) = {
    spark.range(lo, lo + n)
      .select(col("id").as("k"), concat(lit(tag), lit("-"), col("id")).as("s"))
      .repartitionByRange(parts, col("k"))
  }

  private def contents(d: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    d.collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("append republishes prior entries by reference: no prior file " +
    "is rewritten, and the landed work is only the new batch") {
    val base = "/tmp/graft_txlog/append"
    TxLog.drop(spark, base)
    TxLog.commit(clustered(0, 100, "a", 2), base, None, Some("k"))
    val v1Files = TxLog.manifestFiles(spark, base, 1L)
    TxLog.append(clustered(100, 50, "b", 1), base, Some("k"))
    TxLog.append(clustered(150, 50, "c", 1), base, Some("k"))
    assert(TxLog.latestVersion(spark, base).contains(3L))
    val v3 = TxLog.manifest(spark, base, 3L)._1
    // v1's files appear verbatim (same paths — never re-landed)
    assert(v1Files.toSet.subsetOf(v3.map(_.path).toSet))
    // row counts ride the manifest: full count with zero data I/O
    assert(v3.map(_.rows).sum == 200L)
    assert(contents(TxLog.read(spark, base)) ==
      contents(clustered(0, 100, "a", 1)
        .unionAll(clustered(100, 50, "b", 1))
        .unionAll(clustered(150, 50, "c", 1))))
  }

  test("readRange prunes files by manifest min/max before the scan " +
    "and still returns exactly the predicate's rows") {
    val base = "/tmp/graft_txlog/skip"
    TxLog.drop(spark, base)
    TxLog.commit(clustered(0, 1000, "x", 8), base, None, Some("k"))
    val (kept, all) = TxLog.pruneRange(spark, base, "k", 10L, 90L)
    assert(all.size == 8, s"expected 8 range-clustered files, got ${all.size}")
    assert(kept.size <= 2,
      s"narrow range must touch at most 2 of 8 band files, kept ${kept.size}")
    assert(contents(TxLog.readRange(spark, base, "k", 10L, 90L)) ==
      contents(TxLog.read(spark, base).where(col("k").between(10, 90))))
    // a range outside every band prunes everything (schema preserved)
    val empty = TxLog.readRange(spark, base, "k", 5000L, 6000L)
    assert(empty.columns.toSeq == Seq("k", "s") && empty.count() == 0)
  }

  test("mergeCow rewrites only range-overlapping files; untouched " +
    "files are carried by reference and the result equals a full merge") {
    val base = "/tmp/graft_txlog/cow"
    TxLog.drop(spark, base)
    val target = clustered(0, 1000, "t", 8)
    TxLog.commit(target, base, None, Some("k"))
    val before = TxLog.manifest(spark, base, 1L)._1
    // updates confined to one band + fresh inserts just above the band
    val source = spark.range(250, 280)
      .select(col("id").as("k"), concat(lit("upd-"), col("id")).as("s"))
    TxLog.mergeCow(spark, base, source, Seq("k"), "k")
    val after = TxLog.manifest(spark, base, 2L)._1
    val carried = before.map(_.path).toSet.intersect(after.map(_.path).toSet)
    assert(carried.size >= 6,
      s"narrow-range merge must carry most of 8 files, carried ${carried.size}")
    assert(carried.size < before.size, "at least one file must be rewritten")
    assert(contents(TxLog.read(spark, base)) ==
      contents(Upsert.merge(clustered(0, 1000, "t", 1), source, Seq("k"))))
  }

  test("mergeCow inserts keys outside every file's range exactly once") {
    val base = "/tmp/graft_txlog/cow_ins"
    TxLog.drop(spark, base)
    TxLog.commit(clustered(0, 100, "t", 2), base, None, Some("k"))
    val source = spark.range(90, 120) // 10 updates + 20 inserts
      .select(col("id").as("k"), concat(lit("n-"), col("id")).as("s"))
    TxLog.mergeCow(spark, base, source, Seq("k"), "k")
    val got = contents(TxLog.read(spark, base))
    assert(got.size == 120)
    assert(got == contents(
      Upsert.merge(clustered(0, 100, "t", 1), source, Seq("k"))))
  }

  test("mergeCow CAS loser recomputes against the winner: final state " +
    "equals sequential application") {
    val base = "/tmp/graft_txlog/cow_race"
    TxLog.drop(spark, base)
    TxLog.commit(clustered(0, 100, "t", 2), base, None, Some("k"))
    val srcA = spark.range(10, 20)
      .select(col("id").as("k"), concat(lit("A-"), col("id")).as("s"))
    val srcB = spark.range(15, 25)
      .select(col("id").as("k"), concat(lit("B-"), col("id")).as("s"))
    var attempts = 0
    TxLog.mergeCow(spark, base, srcB, Seq("k"), "k", onAttempt = { a =>
      attempts = a
      if (a == 1) // writer A lands between B's snapshot read and publish
        TxLog.mergeCow(spark, base, srcA, Seq("k"), "k")
    })
    assert(attempts == 2, "loser must have recomputed after the CAS loss")
    assert(contents(TxLog.read(spark, base)) == contents(
      Upsert.merge(Upsert.merge(clustered(0, 100, "t", 1), srcA, Seq("k")),
        srcB, Seq("k"))))
    // no orphans: every data dir on disk is referenced by some manifest
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val onDisk = fs.listStatus(new org.apache.hadoop.fs.Path(s"$base/data"))
      .map(_.getPath.getName).toSet
    val referenced = (1L to 3L).flatMap(v =>
      TxLog.manifestFiles(spark, base, v).map(_.split("/")(1))).toSet
    assert(onDisk == referenced,
      s"unreferenced txn dirs left behind: ${onDisk -- referenced}")
  }

  test("appendOnce is idempotent per (appId, batchId): a replayed " +
    "batch changes nothing, a new batch appends") {
    val base = "/tmp/graft_txlog/once"
    TxLog.drop(spark, base)
    val b0 = clustered(0, 50, "b0", 1)
    val b1 = clustered(50, 50, "b1", 1)
    assert(TxLog.appendOnce(b0, base, "app", 0L) == 1L)
    // at-least-once redelivery of batch 0 (restart replay): no-op
    assert(TxLog.appendOnce(b0, base, "app", 0L) == 1L)
    assert(TxLog.latestVersion(spark, base).contains(1L))
    assert(TxLog.appendOnce(b1, base, "app", 1L) == 2L)
    // replay of an OLD batch after later ones landed: still a no-op
    assert(TxLog.appendOnce(b0, base, "app", 0L) == 2L)
    assert(TxLog.read(spark, base).count() == 100)
    // a second writer app keeps its own high-water mark
    assert(TxLog.appendOnce(clustered(100, 10, "c", 1), base, "app2", 0L) == 3L)
    assert(TxLog.manifest(spark, base, 3L)._2 ==
      Map("app" -> 1L, "app2" -> 0L))
    // the replayed batch's discarded files leave no orphan dirs
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val onDisk = fs.listStatus(new org.apache.hadoop.fs.Path(s"$base/data"))
      .map(_.getPath.getName).toSet
    val referenced = TxLog.manifestFiles(spark, base, 3L)
      .map(_.split("/")(1)).toSet
    assert(onDisk == referenced,
      s"replayed batches must not leave orphan files: ${onDisk -- referenced}")
  }

  test("a maintenance transact carries the txn high-water map: " +
    "appendOnce idempotency survives a full rewrite") {
    val base = "/tmp/graft_txlog/txn_carry"
    TxLog.drop(spark, base)
    TxLog.appendOnce(clustered(0, 50, "b0", 1), base, "app", 0L)
    // nightly maintenance: full-snapshot rewrite through transact
    TxLog.transact(spark, base)(snap => snap.get)
    assert(TxLog.manifest(spark, base, 2L)._2 == Map("app" -> 0L),
      "transact/commit must not reset exactly-once state")
    // the restart-shaped replay after maintenance is still a no-op
    assert(TxLog.appendOnce(clustered(0, 50, "dup", 1), base, "app", 0L) == 2L)
    assert(TxLog.read(spark, base).count() == 50)
  }

  test("landEntries fails fast on a bad stats column: nothing landed, " +
    "nothing orphaned") {
    val base = "/tmp/graft_txlog/failfast"
    TxLog.drop(spark, base)
    intercept[IllegalArgumentException] {
      TxLog.append(clustered(0, 10, "x", 1), base, Some("no_such_col"))
    }
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$base/data")),
      "a rejected stats column must not leave landed files behind")
  }

  test("compact bin-packs only the small files, carries big files by " +
    "reference, keeps content + clustering + txn map, and preserves " +
    "old-version readability") {
    val base = "/tmp/graft_txlog/compact"
    TxLog.drop(spark, base)
    // big seed: 2 files of 500 rows; then 4 tiny streamed batches
    TxLog.commit(clustered(0, 1000, "big", 2), base, None, Some("k"))
    (0 until 4).foreach { i =>
      TxLog.appendOnce(clustered(1000 + i * 10, 10, s"tiny$i", 1),
        base, "app", i.toLong, Some("k"))
    }
    val before = TxLog.manifest(spark, base, 5L)
    assert(before._1.size == 6)
    val v = TxLog.compact(spark, base, smallThresholdRows = 100,
      targetRows = 1000, statsCol0 = Some("k"))
    assert(v == 6L)
    val (after, txns) = TxLog.manifest(spark, base, 6L)
    // 2 big carried + 1 packed
    assert(after.size == 3, s"expected 3 files after compaction: $after")
    val bigPaths = before._1.filter(_.rows >= 100).map(_.path).toSet
    assert(bigPaths.subsetOf(after.map(_.path).toSet),
      "big files must be carried by reference")
    // the packed file keeps stats so skipping still works post-compact
    assert(after.forall(_.stats.nonEmpty))
    // txn high-water map survives maintenance: a replay is still a no-op
    assert(txns == Map("app" -> 3L))
    assert(TxLog.appendOnce(clustered(0, 5, "dup", 1), base, "app", 3L) == 6L)
    // content identical; the pre-compaction version still readable
    assert(contents(TxLog.read(spark, base)) ==
      contents(TxLog.readVersion(spark, base, 5L)))
    assert(TxLog.read(spark, base).count() == 1040)
    // compacting an already-compact table is a no-op
    assert(TxLog.compact(spark, base, 100, 1000, Some("k")) == 6L)
  }

  test("changesBetween returns exactly the rows each append committed, " +
    "tagged with their commit version") {
    val base = "/tmp/graft_txlog/cdf"
    TxLog.drop(spark, base)
    TxLog.commit(clustered(0, 100, "seed", 2), base, None, Some("k"))
    TxLog.append(clustered(100, 20, "b1", 1), base, Some("k"))
    TxLog.append(clustered(120, 30, "b2", 1), base, Some("k"))
    val changes = TxLog.changesBetween(spark, base, 1L, 3L)
      .groupBy("_commit_version").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(changes == Map(2L -> 20L, 3L -> 30L))
    // from-zero covers the seed too
    assert(TxLog.changesBetween(spark, base, 0L, 3L).count() == 150)
    // consuming the feed incrementally reconstructs the table
    val replayed = TxLog.changesBetween(spark, base, 0L, 3L)
      .drop("_commit_version")
    assert(contents(replayed) == contents(TxLog.read(spark, base)))
  }

  test("deleteRange rewrites only range-overlapping files, drops " +
    "files emptied by the delete, and honors the residual predicate") {
    val base = "/tmp/graft_txlog/del"
    TxLog.drop(spark, base)
    TxLog.commit(clustered(0, 1000, "t", 8), base, None, Some("k"))
    val before = TxLog.manifest(spark, base, 1L)._1
    // band delete with a residual: only even keys inside [250, 279] die
    val v = TxLog.deleteRange(spark, base, "k", 250L, 279L,
      residual = col("k") % 2 === 0)
    assert(v == 2L)
    val after = TxLog.manifest(spark, base, 2L)._1
    val carried = before.map(_.path).toSet.intersect(after.map(_.path).toSet)
    assert(carried.size >= 6,
      s"narrow delete must carry most of 8 band files, carried ${carried.size}")
    assert(carried.size < before.size, "at least one file must be rewritten")
    assert(contents(TxLog.read(spark, base)) ==
      contents(clustered(0, 1000, "t", 1)
        .where(!(col("k").between(250, 279) && col("k") % 2 === 0))))
    // whole-band delete: the emptied band's file vanishes from the
    // manifest instead of being republished as a 0-row file
    TxLog.deleteRange(spark, base, "k", 0L, 124L)
    val v3 = TxLog.manifest(spark, base, 3L)._1
    assert(v3.forall(_.rows > 0L), s"empty files republished: $v3")
    assert(TxLog.read(spark, base).where(col("k") < 125).count() == 0)
    // a range outside every band is a no-op at the current version
    assert(TxLog.deleteRange(spark, base, "k", 90000L, 99000L) == 3L)
    // the pre-delete snapshot is still readable (time travel)
    assert(TxLog.readVersion(spark, base, 1L).count() == 1000)
  }

  test("updateRange rewrites only the touched band, leaves non-matching " +
    "rows bit-identical, and refuses to assign the clustering column") {
    val base = "/tmp/graft_txlog/upd"
    TxLog.drop(spark, base)
    TxLog.commit(clustered(0, 1000, "t", 8), base, None, Some("k"))
    val before = TxLog.manifest(spark, base, 1L)._1
    val v = TxLog.updateRange(spark, base, "k", 250L, 279L,
      set = Map("s" -> concat(lit("upd-"), col("k"))),
      residual = col("k") % 2 === 0)
    assert(v == 2L)
    val after = TxLog.manifest(spark, base, 2L)._1
    val carried = before.map(_.path).toSet.intersect(after.map(_.path).toSet)
    assert(carried.size >= 6 && carried.size < before.size,
      s"narrow update must carry most band files, carried ${carried.size}")
    val expect = clustered(0, 1000, "t", 1)
      .select(col("k"),
        when(col("k").between(250, 279) && col("k") % 2 === 0,
          concat(lit("upd-"), col("k"))).otherwise(col("s")).as("s"))
    assert(contents(TxLog.read(spark, base)) == contents(expect))
    // rewritten band keeps fresh stats: skipping stays sharp after DML
    assert(after.forall(_.stats.nonEmpty))
    intercept[IllegalArgumentException] {
      TxLog.updateRange(spark, base, "k", 0L, 10L,
        set = Map("k" -> (col("k") + 1)))
    }
  }

  test("8 genuinely concurrent appenders all land exactly once: " +
    "dense version chain, no lost batch, no duplicate, no orphan") {
    val base = "/tmp/graft_txlog/race8"
    TxLog.drop(spark, base)
    TxLog.commit(clustered(0, 10, "seed", 1), base, None, Some("k"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    // 8 threads race their appends through the CAS; retries must
    // absorb every collision (maxAttempts > thread count)
    val futures = (0 until 8).map { i =>
      Future {
        TxLog.append(clustered(100 + i * 10, 10, s"w$i", 1),
          base, Some("k"), maxAttempts = 20)
      }
    }
    val versions = Await.result(Future.sequence(futures), 120.seconds)
    // every writer won SOME distinct version; the chain is dense
    assert(versions.toSet.size == 8, s"versions not distinct: $versions")
    assert(versions.toSet == (2L to 9L).toSet, s"chain not dense: $versions")
    assert(TxLog.latestVersion(spark, base).contains(9L))
    val rows = TxLog.read(spark, base)
    assert(rows.count() == 90, "every batch exactly once")
    assert(rows.groupBy("k").count().where(col("count") > 1).count() == 0)
    // no orphan txn dirs: every dir on disk is referenced by the
    // surviving manifests (CAS losers must clean up after themselves)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val onDisk = fs.listStatus(new org.apache.hadoop.fs.Path(s"$base/data"))
      .map(_.getPath.getName).toSet
    val referenced = (1L to 9L).flatMap(v =>
      TxLog.manifestFiles(spark, base, v).map(_.split("/")(1))).toSet
    assert(onDisk == referenced,
      s"orphaned txn dirs after the race: ${onDisk -- referenced}")
  }

  test("vacuum racing concurrent appenders never corrupts the chain: " +
    "all batches land, kept versions resolve off the materialized " +
    "checkpoint, and the pointer stays sane (delta-log protocol)") {
    val base = "/tmp/graft_txlog/vacrace"
    TxLog.drop(spark, base)
    TxLog.commit(clustered(0, 10, "seed", 1), base, None, Some("k"))
    (1 to 4).foreach(i =>
      TxLog.append(clustered(i * 10, 10, s"pre$i", 1), base, Some("k")))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    // 4 appenders race while 2 vacuums interleave (each vacuum lists,
    // materializes a checkpoint at its oldest-kept, deletes ancestry,
    // repoints, purges the cache — all against live CAS traffic)
    val writers = (0 until 4).map { i =>
      Future {
        TxLog.append(clustered(100 + i * 10, 10, s"w$i", 1),
          base, Some("k"), maxAttempts = 20)
      }
    }
    val vacuums = (0 until 2).map { _ =>
      Future { TxLog.vacuum(spark, base, keepLast = 3) }
    }
    Await.result(Future.sequence(writers ++ vacuums), 120.seconds)
    // every batch that was appended is in the final state (vacuum only
    // trims HISTORY, never the latest snapshot)
    val rows = TxLog.read(spark, base)
    assert(rows.count() == 90, s"lost rows after vacuum race: ${rows.count()}")
    assert(rows.groupBy("k").count().where(col("count") > 1).count() == 0)
    // the surviving chain resolves end-to-end (delta replay off the
    // vacuum-materialized checkpoint) and latestVersion stays exact
    val latest = TxLog.latestVersion(spark, base).get
    assert(latest == 9L, s"latest=$latest")
    val survivors = TxLog.vacuum(spark, base, keepLast = 2)
    survivors.foreach(v =>
      assert(TxLog.readVersion(spark, base, v).count() >= 50))
  }

  test("commitMulti stores per-file stats on several columns; " +
    "readRanges prunes on the CONJUNCTION and returns the exact box") {
    val base = "/tmp/graft_txlog/multi"
    TxLog.drop(spark, base)
    // 2-D keyed table: a = id/100 bands, b = id%100 — clustered on a,
    // so stats on `a` are tight per file and stats on `b` are wide
    val df = spark.range(0, 10000)
      .select((col("id") / 100).cast("long").as("a"),
        (col("id") % 100).as("b"),
        concat(lit("r-"), col("id")).as("s"))
      .repartitionByRange(8, col("a"))
    TxLog.commitMulti(df, base, None, Seq("a", "b"))
    val entries = TxLog.manifest(spark, base, 1L)._1
    assert(entries.forall(_.stats.size == 2),
      s"every entry must carry stats on both columns: $entries")
    // serde round trip: what came back from the manifest file equals
    // what a fresh parse of its own serialization yields
    assert(entries.forall(e => e.statsFor("a").isDefined &&
      e.statsFor("b").isDefined))
    val preds = Seq[(String, Any, Any)](("a", 10L, 20L), ("b", 0L, 99L))
    val (kept, all) = TxLog.pruneRanges(spark, base, preds)
    assert(all.size == 8 && kept.size <= 2,
      s"narrow a-band must prune most files: kept ${kept.size} of ${all.size}")
    val got = TxLog.readRanges(spark, base, preds)
    val expect = spark.range(1000, 2100) // a in [10,20] → ids 1000..2099
      .select((col("id") / 100).cast("long").as("a"),
        (col("id") % 100).as("b"), concat(lit("r-"), col("id")).as("s"))
    assert(got.count() == 1100 &&
      got.collect().map(_.toSeq).toSet == expect.collect().map(_.toSeq).toSet)
    // a contradiction on the second column prunes everything
    assert(TxLog.readRanges(spark, base,
      Seq(("a", 10L, 20L), ("b", 5000L, 6000L))).count() == 0)
  }

  test("replaceRange swaps a band atomically: out-of-band files ride " +
    "by reference, partial overlaps keep their out-of-band survivors, " +
    "and a misrouted replacement row is rejected up front") {
    val base = "/tmp/graft_txlog/replace"
    TxLog.drop(spark, base)
    TxLog.commit(clustered(0, 1000, "t", 8), base, None, Some("k"))
    val before = TxLog.manifest(spark, base, 1L)._1
    // daily re-load of band [200, 399]: fewer rows, new payloads
    val reload = spark.range(200, 300)
      .select(col("id").as("k"), concat(lit("reload-"), col("id")).as("s"))
    val v = TxLog.replaceRange(spark, base, "k", 200L, 399L, reload)
    assert(v == 2L)
    val after = TxLog.manifest(spark, base, 2L)._1
    val carried = before.map(_.path).toSet.intersect(after.map(_.path).toSet)
    assert(carried.size >= 5 && carried.size < before.size,
      s"band replace must carry out-of-band files, carried ${carried.size}")
    val expect = clustered(0, 1000, "t", 1)
      .where(!col("k").between(200, 399))
      .unionAll(reload)
    assert(contents(TxLog.read(spark, base)) == contents(expect))
    assert(TxLog.read(spark, base).count() == 900) // 800 kept + 100 new
    // a replacement row outside the declared range is rejected BEFORE
    // anything lands
    intercept[IllegalArgumentException] {
      TxLog.replaceRange(spark, base, "k", 0L, 9L,
        spark.range(5, 15).select(col("id").as("k"), lit("bad").as("s")))
    }
    assert(TxLog.latestVersion(spark, base).contains(2L),
      "a rejected replace must not publish")
  }

  test("changesWithDeletes replays to the exact final table: apply " +
    "deletes by key then inserts, version by version") {
    val base = "/tmp/graft_txlog/cdfdel"
    TxLog.drop(spark, base)
    TxLog.commit(clustered(0, 100, "seed", 2), base, None, Some("k"))
    TxLog.mergeCow(spark, base,
      spark.range(40, 60)
        .select(col("id").as("k"), concat(lit("upd-"), col("id")).as("s")),
      Seq("k"), "k") // v2: COW rewrite → delete+insert pairs
    TxLog.deleteRange(spark, base, "k", 0L, 24L) // v3
    val feed = TxLog.changesWithDeletes(spark, base, 0L, 3L)
      .select("k", "s", "_commit_version", "_change_type")
      .collect()
    // replay driver-side (tiny): per version, delete keys then insert
    val state = scala.collection.mutable.Map[Long, String]()
    feed.groupBy(_.getLong(2)).toSeq.sortBy(_._1).foreach { case (_, rows) =>
      val (dels, ins) = rows.partition(_.getString(3) == "delete")
      dels.foreach(r => state.remove(r.getLong(0)))
      ins.foreach(r => state.update(r.getLong(0), r.getString(1)))
    }
    assert(state.toMap == contents(TxLog.read(spark, base)).toMap,
      "replaying the delete+insert feed must reconstruct the table")
    // the COW version reports BOTH sides of its rewritten file
    val v2 = feed.filter(_.getLong(2) == 2L)
    assert(v2.exists(_.getString(3) == "delete") &&
      v2.exists(_.getString(3) == "insert"))
  }

  test("the change feeds union schema-evolved slices by name: the " +
    "later column reads NULL on pre-evolution versions") {
    val base = "/tmp/graft_txlog/cdfevolve"
    TxLog.drop(spark, base)
    TxLog.commit(clustered(0, 30, "old", 1), base, None, Some("k"))
    TxLog.append(
      clustered(30, 20, "new", 1).withColumn("extra", col("k") * 10),
      base, Some("k"))
    TxLog.deleteRange(spark, base, "k", 0L, 9L)
    val feed = TxLog.changesWithDeletes(spark, base, 0L, 3L)
    assert(feed.columns.contains("extra"))
    assert(feed.where(col("_commit_version") === 1 &&
      col("extra").isNotNull).count() == 0)
    assert(feed.where(col("_commit_version") === 2 &&
      col("_change_type") === "insert" && col("extra").isNotNull)
      .count() == 20)
    val inserts = TxLog.changesBetween(spark, base, 0L, 2L)
    assert(inserts.columns.contains("extra") && inserts.count() == 50)
  }

  test("restore republishes an old version as a NEW one: rollback " +
    "with full history, no file moves, txn map carried") {
    val base = "/tmp/graft_txlog/restore"
    TxLog.drop(spark, base)
    TxLog.appendOnce(clustered(0, 50, "a", 1), base, "app", 0L, Some("k"))
    TxLog.append(clustered(50, 30, "b", 1), base, Some("k"))
    TxLog.deleteRange(spark, base, "k", 0L, 19L) // v3: the bad deploy
    assert(TxLog.read(spark, base).count() == 60)
    val v = TxLog.restore(spark, base, 2L)
    assert(v == 4L)
    assert(contents(TxLog.read(spark, base)) ==
      contents(TxLog.readVersion(spark, base, 2L)))
    assert(TxLog.read(spark, base).count() == 80)
    // the "bad" version stays readable (history never rewritten) and
    // the restored manifest reuses v2's files verbatim
    assert(TxLog.readVersion(spark, base, 3L).count() == 60)
    assert(TxLog.manifestFiles(spark, base, 4L).toSet ==
      TxLog.manifestFiles(spark, base, 2L).toSet)
    // exactly-once state survives the rollback
    assert(TxLog.manifest(spark, base, 4L)._2 == Map("app" -> 0L))
    assert(TxLog.appendOnce(clustered(0, 5, "dup", 1), base, "app", 0L) == 4L)
  }

  test("shallow clone references the source's files with zero copy: " +
    "reads + skipping work immediately, COW writes diverge locally, " +
    "the source is never touched, clone vacuum spares source files") {
    val src = "/tmp/graft_txlog/clone_src"
    val dst = "/tmp/graft_txlog/clone_dst"
    TxLog.drop(spark, src); TxLog.drop(spark, dst)
    TxLog.commit(clustered(0, 1000, "s", 8), src, None, Some("k"))
    TxLog.cloneShallow(spark, src, dst)
    // zero-copy: the clone's data dir does not even exist yet
    val fs = new org.apache.hadoop.fs.Path(dst)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dst/data")))
    assert(contents(TxLog.read(spark, dst)) ==
      contents(TxLog.read(spark, src)))
    // stats carried: manifest skipping works on the clone immediately
    val (kept, all) = TxLog.pruneRange(spark, dst, "k", 10L, 90L)
    assert(all.size == 8 && kept.size <= 2)
    // divergent COW write on the clone: only the touched band lands
    // locally; untouched entries keep referencing the source
    TxLog.updateRange(spark, dst, "k", 250L, 279L,
      set = Map("s" -> concat(lit("clone-"), col("k"))))
    assert(TxLog.read(spark, dst)
      .where(col("s").startsWith("clone-")).count() == 30)
    assert(contents(TxLog.read(spark, src)) ==
      contents(clustered(0, 1000, "s", 1)), "source must be untouched")
    val v2 = TxLog.manifest(spark, dst, 2L)._1
    assert(v2.exists(e => e.path.startsWith("/")) &&
      v2.exists(e => !e.path.startsWith("/")),
      s"divergent clone must mix source refs and local files: $v2")
    // clone vacuum drops its own history but never the source's files
    TxLog.vacuum(spark, dst, keepLast = 1)
    assert(TxLog.read(spark, src).count() == 1000)
    assert(TxLog.read(spark, dst).count() == 1000)
  }

  test("a v1 manifest (bare paths) still reads, appends, and merges — " +
    "its stat-less files are conservatively rewritten by mergeCow") {
    val base = "/tmp/graft_txlog/v1compat"
    TxLog.drop(spark, base)
    TxLog.commit(clustered(0, 40, "t", 2), base, None) // no statsCol: v1 lines
    assert(TxLog.manifest(spark, base, 1L)._1.forall(_.stats.isEmpty))
    TxLog.append(clustered(40, 10, "a", 1), base, Some("k"))
    val source = spark.range(0, 5)
      .select(col("id").as("k"), concat(lit("u-"), col("id")).as("s"))
    TxLog.mergeCow(spark, base, source, Seq("k"), "k")
    assert(contents(TxLog.read(spark, base)) == contents(
      Upsert.merge(
        clustered(0, 40, "t", 1).unionAll(clustered(40, 10, "a", 1)),
        source, Seq("k"))))
  }
}
