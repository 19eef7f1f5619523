package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Layout, TextAnalysis, TxLog, Upsert, Versioned}
import graft.sources.{Ingest, Tables}

/** Lakehouse maintenance & data-management verbs: Z-order layout
  * rewrite, partition-pruned targeted delete (the GDPR erasure path),
  * runtime bloom-filter join pruning, and deterministic stratified
  * corpus sampling. These are the operations that keep a 100 TB table
  * healthy over years — the reference delegates them to Delta
  * (SURVEY §2.11); here they are first-class on plain parquet.
  */
object RegistryMaint {
  private type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Box predicate shared by the z-order query and its oracle — inside
    * every SF's key range (sf0.001 tops out at orderkey 1499 / partkey
    * 199) and a vanishing fraction of the plane at sf0.1, which is
    * what makes the file-skipping evidence non-vacuous. */
  private val (okLo, okHi, pkLo, pkHi) = (100L, 900L, 20L, 160L)

  val defs: Map[String, Q] = Map(
    // Z-order layout rewrite (Delta OPTIMIZE ZORDER analog): cluster
    // lineitem by the interleaved bits of (l_orderkey, l_partkey),
    // then answer a 2-D box query from the rewritten files. After the
    // rewrite each file holds one tile of the key plane, so the box
    // prunes most files on BOTH dimensions via parquet min-max stats —
    // a single-column sort can only serve one. LayoutSpec asserts the
    // tiles are genuinely narrow on both keys.
    "s15_zorder_layout" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
      val outDir = Ingest.fixtureDir(dir) + "/zorder_lineitem"
      Layout.zorderWrite(li, "l_orderkey", "l_partkey", outDir, 16)
      s.read.parquet(outDir)
        .where(col("l_orderkey").between(okLo, okHi) &&
          col("l_partkey").between(pkLo, pkHi))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,6)")).cast("double")
            .as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // Targeted delete (the GDPR right-to-erasure path): rebuild the
    // user-bucket-partitioned events table, copy-on-write delete three
    // users, read the table back. Only the partitions the deleted
    // users hash to are rewritten (LayoutSpec pins untouched-partition
    // file mtimes); survivors are selected by broadcast anti-join so
    // the deletion set can be millions of keys, not an In-list.
    // The rebuild runs every invocation so the query is idempotent.
    "s14_targeted_delete" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/gdpr_events"
      val staging = Ingest.fixtureDir(dir) + "/gdpr_staging"
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), pmod(col("user_id"), lit(8)).cast("int").as("u_bucket"))
        .write.mode("overwrite").partitionBy("u_bucket").parquet(base)
      import s.implicits._
      val keys = Seq(7L, 23L, 98L).toDF("user_id")
      Layout.targetedDelete(s, base, "u_bucket", "user_id", keys, 8, staging)
      s.read.parquet(base)
        .groupBy("u_bucket")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("u_bucket")
    }),

    // Runtime bloom-filter join pruning: a selective dim filter
    // (p_size = 1 keeps 38 of 2000 parts at sf0.01) injects a bloom
    // filter of the surviving build keys into the fact scan, so most
    // lineitem rows die at the scan instead of riding the shuffle to
    // the join. The thresholds are session defaults tuned for 10 GB+
    // scans, so they are lowered for the local fixture and planning is
    // forced while they hold (plans are otherwise lazy); results are
    // identical either way — the filter only prunes. PlanShapeSpec
    // asserts the might_contain probe under these confs.
    "j13_bloom_pruned_join" -> ((s, dir) => {
      val df = bloomPlanned(s) {
        t(s, dir, "lineitem")
          .join(t(s, dir, "part").where(col("p_size") === 1),
            col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,6)")).cast("double")
              .as("sum_qty"))
          .orderBy("p_brand")
      }
      df
    }),

    // Versioned snapshot store (the Delta time-travel analog on plain
    // parquet): version IS a partition (v=<n> dirs), so reading
    // version n is a partition-pruned scan, writing n+1 never touches
    // n's files (VersionedSpec pins their mtimes), and the history
    // query below is an ordinary aggregate over the version column.
    "s16_versioned_snapshot" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/versioned_events"
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"),
          to_date(col("ts")).as("day"))
      Versioned.writeSnapshot(
        ev.where(col("day") < lit("2024-01-11").cast("date")), base, 1)
      Versioned.writeSnapshot(
        ev.where(col("day") < lit("2024-01-21").cast("date")), base, 2)
      Versioned.history(s, base)
        .groupBy(col("v").cast("int").as("version"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("version")
    }),

    // Retention vacuum over the snapshot store (Delta VACUUM analog):
    // rebuild a 3-version history, keep only the newest, and answer
    // from what survives. Deletion uses the Hadoop FileSystem API so
    // the identical code runs against HDFS/object stores.
    "s17_vacuum_retention" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/vacuum_events"
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"),
          to_date(col("ts")).as("day"))
      Seq(1 -> "2024-01-11", 2 -> "2024-01-21", 3 -> "2024-01-31")
        .foreach { case (n, cut) =>
          Versioned.writeSnapshot(
            ev.where(col("day") < lit(cut).cast("date")), base, n)
        }
      val survivors = Versioned.vacuum(s, base, keepLast = 1)
      require(survivors == Seq(3), s"unexpected survivors: $survivors")
      Versioned.history(s, base)
        .groupBy(col("v").cast("int").as("version"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("version")
    }),

    // Atomic manifest-commit log (the Delta `_delta_log` ACID analog —
    // TxLog): version 1 is a plain commit, version 2 lands through a
    // transact-MERGE (optimistic concurrency: a racing writer would
    // force a recompute, TxLogSpec proves the interleavings), and the
    // readback time-travels BOTH versions through their manifests —
    // a reader can never observe a partially-landed directory. The
    // oracle recomputes each version's aggregate from the original
    // events table.
    "s23_acid_commit_log" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txlog_events"
      TxLog.drop(s, base)
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"),
          to_date(col("ts")).as("day"))
      TxLog.commit(
        ev.where(col("day") < lit("2024-01-11").cast("date")), base, None)
      TxLog.transact(s, base) { snap =>
        Upsert.merge(snap.get,
          ev.where(col("day") >= lit("2024-01-11").cast("date") &&
            col("day") < lit("2024-01-21").cast("date")),
          Seq("event_id"))
      }
      Seq(1, 2).map { v =>
        TxLog.readVersion(s, base, v.toLong)
          .agg(count(lit(1)).as("n_rows"),
            sum(col("value").cast("decimal(18,6)")).cast("double")
              .as("sum_value"))
          .withColumn("version", lit(v))
          .select("version", "n_rows", "sum_value")
      }.reduce(_.unionByName(_)).orderBy("version")
    }),

    // Copy-on-write MERGE through the manifest log (Delta's file-level
    // MERGE shape): the table is range-clustered on event_id with
    // per-file min/max stats in the manifest, and the CDC source
    // touches a narrow id band — so mergeCow rewrites only the
    // overlapping band files and carries the rest into the new version
    // by reference (the require pins that evidence; at 100 TB this is
    // the difference between rewriting GBs and rewriting the table).
    // The oracle recomputes the merged state with a CASE.
    "s24_cow_merge_log" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txcow_events"
      TxLog.drop(s, base)
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      TxLog.commit(ev.repartitionByRange(8, col("event_id")),
        base, None, Some("event_id"))
      val before = TxLog.manifestFiles(s, base, 1L).toSet
      val source = ev.where(col("event_id").between(cowLo, cowHi))
        .withColumn("value", col("value") * 2)
      TxLog.mergeCow(s, base, source, Seq("event_id"), "event_id")
      val after = TxLog.manifestFiles(s, base, 2L).toSet
      val carried = before.intersect(after).size
      require(carried >= 1 && carried < before.size,
        s"COW must carry some files and rewrite some: $carried of ${before.size}")
      TxLog.read(s, base)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("event_type")
    }),

    // Z-order + manifest stats, combined (Delta OPTIMIZE ZORDER with
    // data skipping, both halves in-engine): lineitem is Z-clustered
    // on (l_orderkey, l_partkey) and committed with per-file min/max
    // on BOTH keys in the manifest; the 2-D box query then prunes
    // files on BOTH dimensions BEFORE any parquet footer is opened
    // (the require pins a real skip). s15 proved the parquet-stats
    // layer of this; here the skipping is planner-independent manifest
    // metadata — the layer that works on any store at 10^5 files.
    "s31_zorder_manifest_skip" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txzorder_lineitem"
      TxLog.drop(s, base)
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
      TxLog.commitMulti(
        Layout.zorderCluster(li, "l_orderkey", "l_partkey", 16),
        base, None, Seq("l_orderkey", "l_partkey"))
      val preds = Seq[(String, Any, Any)](
        ("l_orderkey", okLo, okHi), ("l_partkey", pkLo, pkHi))
      val (kept, all) = TxLog.pruneRanges(s, base, preds)
      require(kept.size < all.size,
        s"2-D manifest stats must skip files: kept ${kept.size} of ${all.size}")
      TxLog.readRanges(s, base, preds)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,6)")).cast("double")
            .as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // Copy-on-write DELETE through the manifest log (Delta DELETE
    // WHERE analog — the GDPR erasure verb at the file level): the
    // table is range-clustered on event_id, the predicate is a narrow
    // id band plus a residual event_type condition, and deleteRange
    // rewrites ONLY the band files — every out-of-band file rides into
    // the new version by reference (the require pins it). At 100 TB an
    // erasure request rewrites the touched band, never the table. The
    // oracle recomputes the survivors with NOT(...).
    "s28_cow_delete_log" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txdel_events"
      TxLog.drop(s, base)
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      TxLog.commit(ev.repartitionByRange(8, col("event_id")),
        base, None, Some("event_id"))
      val before = TxLog.manifestFiles(s, base, 1L).toSet
      TxLog.deleteRange(s, base, "event_id", cowLo, cowHi,
        residual = col("event_type") === "click")
      val after = TxLog.manifestFiles(s, base, 2L).toSet
      val carried = before.intersect(after).size
      require(carried >= 1 && carried < before.size,
        s"COW delete must carry some files and rewrite some: " +
          s"$carried of ${before.size}")
      TxLog.read(s, base)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("event_type")
    }),

    // Copy-on-write UPDATE through the manifest log (Delta UPDATE SET
    // analog): same band + residual shape as the delete; only the
    // overlapping band files are rewritten, non-matching rows inside
    // them are carried bit-identical, and the rewritten files land
    // with fresh min/max stats so skipping stays sharp after DML.
    // The oracle recomputes the new values with a CASE.
    "s29_cow_update_log" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txupd_events"
      TxLog.drop(s, base)
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      TxLog.commit(ev.repartitionByRange(8, col("event_id")),
        base, None, Some("event_id"))
      val before = TxLog.manifestFiles(s, base, 1L).toSet
      TxLog.updateRange(s, base, "event_id", cowLo, cowHi,
        set = Map("value" -> col("value") * 3),
        residual = col("event_type") === "view")
      val after = TxLog.manifestFiles(s, base, 2L).toSet
      val carried = before.intersect(after).size
      require(carried >= 1 && carried < before.size,
        s"COW update must carry some files and rewrite some: " +
          s"$carried of ${before.size}")
      TxLog.read(s, base)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("event_type")
    }),

    // Merge-on-read DELETE via deletion vectors (Delta DV analog —
    // the write-amplification killer s28's COW path can't be): two
    // overlapping deletes with residual predicates commit by writing
    // ONLY (file, row-position) sidecars — the requires pin that the
    // data-file set is IDENTICAL across all three versions, so at
    // 100 TB a delete costs O(deleted rows), never a band rewrite.
    // Reads apply the mask as a broadcast anti-join on parquet's
    // _metadata.row_index. The oracle recomputes survivors with the
    // two NOT(...) predicates.
    "s39_mor_delete" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txmor_events"
      val before = morFixture(s, dir, base)
      Seq(2L, 3L).foreach { v =>
        require(TxLog.manifestFiles(s, base, v).toSet == before,
          s"MOR delete must rewrite ZERO data files (version $v)")
      }
      TxLog.read(s, base)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("event_type")
    }),

    // Deletion-vector purge (Delta REORG TABLE ... APPLY (PURGE)
    // analog): after the same two MOR deletes, purge rewrites ONLY
    // the masked files folding their sidecars in — clean files ride
    // by reference (the require pins both halves) — and the readback
    // after purge must be bit-identical to the masked read (same
    // oracle recompute as s39). This is the maintenance verb that
    // keeps a high-churn delete workload's read amplification bounded.
    "s40_mor_purge" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txpurge_events"
      val before = morFixture(s, dir, base)
      val masked = TxLog.manifest(s, base, 3L)._1.count(_.dv.isDefined)
      TxLog.purgeDeletes(s, base)
      val entries = TxLog.manifest(s, base, 4L)._1
      require(entries.forall(_.dv.isEmpty), "purge must clear every mask")
      val carried = entries.map(_.path).toSet.intersect(before).size
      require(carried == before.size - masked && masked >= 1,
        s"purge must rewrite ONLY the $masked masked files " +
          s"(carried $carried of ${before.size})")
      TxLog.read(s, base)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("event_type")
    }),

    // CHECK constraints (Delta ALTER TABLE ... ADD CONSTRAINT): the
    // gate every write surface passes through at land time — the
    // requires pin that a violating append aborts with NOTHING
    // published (no version, no orphan files) while a valid append
    // lands under the same constraint. At 100 TB this is the schema-
    // quality contract that keeps a bad upstream batch from
    // poisoning the table. Oracle: events plus the valid batch.
    "s44_check_constraint" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txcons_events"
      TxLog.drop(s, base)
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      TxLog.commit(ev.repartitionByRange(8, col("event_id")),
        base, None, Some("event_id"))
      TxLog.addConstraint(s, base, "id_nonneg", "event_id >= 0")
      val rejected = try {
        TxLog.append(ev.limit(5)
          .withColumn("event_id", lit(-1L)), base, Some("event_id"))
        false
      } catch { case _: TxLog.ConstraintViolationException => true }
      require(rejected, "a violating append must be vetoed")
      require(TxLog.latestVersion(s, base).contains(2L),
        "a vetoed append must publish nothing")
      TxLog.append(ev.where(col("event_id") < 50)
        .withColumn("event_id", col("event_id") + 100000L),
        base, Some("event_id"))
      TxLog.read(s, base)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("event_type")
    }),

    // Event-time data skipping: the fact table is range-clustered on
    // its TIMESTAMP column and committed with manifest stats stored
    // as epoch seconds — a time-band query prunes files BEFORE any
    // footer opens (the require pins a real skip). This is THE 100 TB
    // fact layout: event-time clustering plus manifest-level skipping
    // turns "last 5 days" into a handful of file opens. The oracle
    // recomputes the band with TIMESTAMP literals.
    "s46_event_time_skipping" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txts_events"
      TxLog.drop(s, base)
      val ev = t(s, dir, "events")
        .select("event_id", "event_type", "value", "ts")
      TxLog.commit(ev.repartitionByRange(8, col("ts")), base, None,
        Some("ts"))
      val lo = java.sql.Timestamp.from(
        java.time.Instant.parse("2024-01-05T00:00:00Z"))
      val hi = java.sql.Timestamp.from(
        java.time.Instant.parse("2024-01-10T00:00:00Z"))
      val (kept, all) = TxLog.pruneRange(s, base, "ts", lo, hi)
      require(kept.size < all.size,
        s"timestamp stats must skip files: kept ${kept.size} of ${all.size}")
      TxLog.readRange(s, base, "ts", lo, hi)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("event_type")
    }),

    // TIMESTAMP AS OF time travel (Delta's second time-travel axis;
    // the log's commit clock is the commit file's mtime — pinned here
    // so the witness is deterministic). The Delta boundary rule:
    // an instant resolves to the LATEST version committed at or
    // before it. v1 = first ten days, v2 = the rest; a mid-window
    // instant reads v1, a post-window instant reads v2. Oracle
    // recomputes both prefixes from events.
    "s47_timestamp_as_of" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txtravel_events"
      TxLog.drop(s, base)
      val t0 = 1700000000000L
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("value"), to_date(col("ts")).as("day"))
      TxLog.commit(
        ev.where(col("day") < lit("2024-01-11").cast("date")), base, None)
      TxLog.append(
        ev.where(col("day") >= lit("2024-01-11").cast("date")), base)
      TxLog.setCommitTime(s, base, 1L, t0)
      TxLog.setCommitTime(s, base, 2L, t0 + 60000L)
      require(TxLog.versionAtTimestamp(s, base, t0 + 30000L) == 1L &&
        TxLog.versionAtTimestamp(s, base, t0 + 90000L) == 2L,
        "timestamp->version boundary rule broken")
      Seq(t0 + 30000L -> 1, t0 + 90000L -> 2).map { case (ts, tag) =>
        TxLog.readTimestampAsOf(s, base, ts)
          .agg(count(lit(1)).as("n_rows"),
            sum(col("value").cast("decimal(18,6)")).cast("double")
              .as("sum_value"))
          .withColumn("as_of", lit(tag))
          .select("as_of", "n_rows", "sum_value")
      }.reduce(_.unionByName(_)).orderBy("as_of")
    }),

    // SQL row-level DELETE over the catalog-registered log table (the
    // reference's dbt lifecycle issues row-level DML as SQL through
    // the endpoint): DELETE FROM ... WHERE routes through DSv2
    // SupportsDelete into the merge-on-read delete — the requires pin
    // that ZERO data files were rewritten (mask-only commit, O(deleted
    // rows)) and that the band predicate pre-pruned the masked files
    // by manifest stats. Oracle recomputes the survivors.
    "s48_sql_delete" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txsqldel_events"
      TxLog.drop(s, base)
      val ev = t(s, dir, "events")
        .select("event_id", "event_type", "value")
      TxLog.commit(ev.repartitionByRange(8, col("event_id")),
        base, None, Some("event_id"))
      val before = TxLog.manifestFiles(s, base, 1L).toSet
      s.sql("DROP TABLE IF EXISTS txlog_sql_del_w")
      s.sql("CREATE TABLE txlog_sql_del_w " +
        s"USING graft.sources.TxLogSource OPTIONS (path '$base')")
      try {
        s.sql(s"DELETE FROM txlog_sql_del_w WHERE event_id BETWEEN " +
          s"$cowLo AND $cowHi AND event_type = 'click'")
      } finally s.sql("DROP TABLE IF EXISTS txlog_sql_del_w")
      val v = TxLog.latestVersion(s, base).get
      val entries = TxLog.manifest(s, base, v)._1
      require(entries.map(_.path).toSet == before,
        "SQL DELETE must be merge-on-read: no data file rewritten")
      require(entries.exists(_.dv.isDefined) &&
        entries.count(_.dv.isDefined) < entries.size,
        "stats must pre-prune: only band files may carry masks")
      TxLog.read(s, base)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("event_type")
    }),

    // Z-order maintenance on the log (Delta OPTIMIZE ... ZORDER BY):
    // a tiled lineitem table accumulates small straggler appends
    // confined to a low-orderkey band; compactZorder folds the
    // stragglers AND the tiles their boxes pollute into fresh 2-D
    // tiles (dataChange=false), carrying clean tiles by reference —
    // the requires pin carried-set survival and restored box-prune
    // sharpness. Oracle: the box aggregate over the full lineitem.
    "s49_zorder_compact" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txzc_lineitem"
      TxLog.drop(s, base)
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
      TxLog.commitMulti(
        Layout.zorderCluster(li.where(col("l_orderkey") % 10 !== 0),
          "l_orderkey", "l_partkey", 16),
        base, None, Seq("l_orderkey", "l_partkey"))
      // stragglers: the %10==0 band arrives as three small appends
      Seq(0, 1, 2).foreach { i =>
        TxLog.append(
          li.where(col("l_orderkey") % 10 === 0 &&
            col("l_orderkey") % 3 === i).coalesce(1),
          base, Some("l_orderkey"))
      }
      val pre = TxLog.manifest(s, base,
        TxLog.latestVersion(s, base).get)._1.map(_.path).toSet
      // threshold sits between a straggler (~n/30 rows) and a healthy
      // tile (~n/18): stragglers fold, clean tiles ride by reference
      val n = li.count()
      val v = TxLog.compactZorder(s, base, "l_orderkey", "l_partkey",
        smallThresholdRows = math.max(64L, n / 25),
        targetRows = math.max(512L, n / 12))
      val entries = TxLog.manifest(s, base, v)._1
      require(!TxLog.dataChangeOf(s, base, v),
        "re-tiling must stamp dataChange=false")
      val rewritten = entries.filterNot(e => pre.contains(e.path))
      require(rewritten.nonEmpty && rewritten.forall(e =>
        e.statsFor("l_orderkey").isDefined &&
          e.statsFor("l_partkey").isDefined),
        "re-tiled files must carry 2-D stats")
      val preds = Seq[(String, Any, Any)](
        ("l_orderkey", okLo, okHi), ("l_partkey", pkLo, pkHi))
      val (kept, all) = TxLog.pruneRanges(s, base, preds)
      require(kept.size < all.size,
        s"post-compaction 2-D skip must prune: ${kept.size}/${all.size}")
      TxLog.readRanges(s, base, preds)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,6)")).cast("double")
            .as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // Incremental bloom coverage (append-time indexing): the part
    // table is committed WITHOUT band stats, bloom-indexed on
    // p_partkey, then a late slice appends — and joins the index in
    // the SAME commit (no rebuild), so a point lookup on an appended
    // key still prunes to a handful of files. Without stats the only
    // pruning axis is the bloom — the evidence is non-vacuous.
    "s50_bloom_append" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txbloom_part"
      TxLog.drop(s, base)
      val pt = t(s, dir, "part")
        .select("p_partkey", "p_name", "p_brand", "p_size")
      TxLog.commit(pt.where(col("p_partkey") > 60).repartition(4),
        base, None)
      TxLog.buildBloomIndex(s, base, "p_partkey", bitsPerRow = 24, k = 5)
      TxLog.append(pt.where(col("p_partkey") <= 60).coalesce(1), base)
      val (kept, all) = TxLog.prunePoint(s, base, "p_partkey", 50L)
      require(kept.nonEmpty && kept.size < all.size,
        s"bloom must prune the point lookup: kept ${kept.size}/${all.size}")
      require(kept.exists(e => e.bloomFor("p_partkey").isDefined &&
        e.statsFor("p_partkey").isEmpty),
        "the appended file must carry a commit-time bloom ref")
      TxLog.readPoint(s, base, "p_partkey", 50L)
        .select("p_partkey", "p_brand", "p_size")
        .orderBy("p_partkey")
    }),

    // SQL UPDATE on the catalog-registered log table: the resolution
    // rule (GraftExtensions rung (c)) rewrites UpdateTable into the
    // merge-on-read update — rows change, zero data files rewritten
    // (the require pins it). Statements run on a newSession() of the
    // armed lineage, the same path every Thrift-served session takes.
    // Oracle recomputes with a CASE.
    "s51_sql_update" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txsqlupd_orders"
      TxLog.drop(s, base)
      val od = t(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      TxLog.commit(od.repartitionByRange(4, col("o_orderkey")),
        base, None, Some("o_orderkey"))
      val before = TxLog.manifestFiles(s, base, 1L).toSet
      graft.sources.TxLogSqlDml.ensureInjected(s)
      val sqlS = s.newSession()
      sqlS.sql("DROP TABLE IF EXISTS txdml_upd_w")
      sqlS.sql("CREATE TABLE txdml_upd_w " +
        s"USING graft.sources.TxLogSource OPTIONS (path '$base')")
      try {
        sqlS.sql("UPDATE txdml_upd_w SET o_totalprice = o_totalprice * 2 " +
          "WHERE o_orderkey BETWEEN 100 AND 299")
      } finally sqlS.sql("DROP TABLE IF EXISTS txdml_upd_w")
      val entries = TxLog.manifest(s, base,
        TxLog.latestVersion(s, base).get)._1
      require(before.subsetOf(entries.map(_.path).toSet),
        "SQL UPDATE must be merge-on-read: no original file dropped")
      TxLog.read(s, base)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,6)")).cast("double")
            .as("sum_price"))
        .orderBy("o_orderstatus")
    }),

    // SQL MERGE INTO — the exact dbt shape the reference runs
    // (`incremental_strategy='merge'` → MERGE ... WHEN MATCHED THEN
    // UPDATE SET * WHEN NOT MATCHED THEN INSERT *): matched keys are
    // masked and re-landed with the source image, unmatched source
    // keys insert, in ONE merge-on-read commit. Oracle recomputes the
    // merged state with a CASE + UNION of the inserted band.
    "s52_sql_merge" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txsqlmerge_orders"
      TxLog.drop(s, base)
      val od = t(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      TxLog.commit(
        od.where(col("o_orderkey") >= 500)
          .repartitionByRange(4, col("o_orderkey")),
        base, None, Some("o_orderkey"))
      graft.sources.TxLogSqlDml.ensureInjected(s)
      val sqlS = s.newSession()
      sqlS.sql("DROP TABLE IF EXISTS txdml_merge_w")
      sqlS.sql("CREATE TABLE txdml_merge_w " +
        s"USING graft.sources.TxLogSource OPTIONS (path '$base')")
      try {
        sqlS.sql("MERGE INTO txdml_merge_w t USING (" +
          s"SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS " +
          s"o_totalprice FROM parquet.`$dir/orders.parquet` " +
          "WHERE o_orderkey < 1000) s " +
          "ON t.o_orderkey = s.o_orderkey " +
          "WHEN MATCHED THEN UPDATE SET * " +
          "WHEN NOT MATCHED THEN INSERT *")
      } finally sqlS.sql("DROP TABLE IF EXISTS txdml_merge_w")
      TxLog.read(s, base)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,6)")).cast("double")
            .as("sum_price"))
        .orderBy("o_orderstatus")
    }),

    // The third MERGE clause (Delta's WHEN NOT MATCHED BY SOURCE THEN
    // DELETE): the incremental full-sync — vanished keys die in the
    // SAME commit as the inserts, surviving rows stay physically in
    // place, and target files provably DISJOINT from the source's key
    // span drop metadata-only (zero bytes read; at 100 TB a re-sync
    // that moves a key window retires old bands for free). The
    // requires pin one-commit atomicity and the disjoint-band drop.
    "s62_merge_sync_delete" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txsync_orders"
      TxLog.drop(s, base)
      val od = t(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      TxLog.commit(
        od.where(col("o_orderkey") < 900)
          .repartitionByRange(4, col("o_orderkey")),
        base, None, Some("o_orderkey"))
      val seedFiles = TxLog.manifest(s, base, 1L)._1
      graft.sources.TxLogSqlDml.ensureInjected(s)
      val sqlS = s.newSession()
      sqlS.sql("DROP TABLE IF EXISTS txdml_sync_w")
      sqlS.sql("CREATE TABLE txdml_sync_w " +
        s"USING graft.sources.TxLogSource OPTIONS (path '$base')")
      try {
        sqlS.sql("MERGE INTO txdml_sync_w t USING (" +
          s"SELECT o_orderkey, o_orderstatus, o_totalprice FROM " +
          s"parquet.`$dir/orders.parquet` " +
          "WHERE o_orderkey BETWEEN 450 AND 1350) s " +
          "ON t.o_orderkey = s.o_orderkey " +
          "WHEN NOT MATCHED THEN INSERT * " +
          "WHEN NOT MATCHED BY SOURCE THEN DELETE")
      } finally sqlS.sql("DROP TABLE IF EXISTS txdml_sync_w")
      require(TxLog.latestVersion(s, base).contains(2L),
        "inserts + sync deletes must land as ONE commit")
      val after = TxLog.manifest(s, base, 2L)._1.map(_.path).toSet
      val dropped = seedFiles.filter(e => e.statsFor("o_orderkey")
        .exists(st => TxLog.cmp("long", st.max, "450") < 0))
      require(dropped.nonEmpty && dropped.forall(e => !after.contains(e.path)),
        s"bands below the source span must drop metadata-only: $dropped")
      TxLog.read(s, base)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,6)")).cast("double")
            .as("sum_price"))
        .orderBy("o_orderstatus")
    }),

    // Conditional multi-clause MERGE (VERDICT r11 missing #1 — the
    // full Delta clause surface a dbt soft-delete / snapshot recipe
    // emits): ordered WHEN MATCHED AND ... DELETE / conditional
    // UPDATE with an explicit assignment list, conditional INSERT
    // with a column list, and BOTH not-matched-by-source shapes
    // (conditional DELETE + catch-all UPDATE) — first-match-wins,
    // ONE merge-on-read commit. Oracle: the same five clauses
    // composed as relational algebra over the raw table.
    "s68_merge_conditional" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txcond_orders"
      TxLog.drop(s, base)
      val od = t(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      TxLog.commit(
        od.where(col("o_orderkey") < 900)
          .repartitionByRange(4, col("o_orderkey")),
        base, None, Some("o_orderkey"))
      graft.sources.TxLogSqlDml.ensureInjected(s)
      val sqlS = s.newSession()
      sqlS.sql("DROP TABLE IF EXISTS txdml_cond_w")
      sqlS.sql("CREATE TABLE txdml_cond_w " +
        s"USING graft.sources.TxLogSource OPTIONS (path '$base')")
      try {
        sqlS.sql("MERGE INTO txdml_cond_w t USING (" +
          "SELECT o_orderkey, o_orderstatus, o_totalprice, " +
          s"o_orderkey % 10 = 0 AS deleted FROM parquet.`$dir/orders.parquet` " +
          "WHERE o_orderkey BETWEEN 450 AND 1350) s " +
          "ON t.o_orderkey = s.o_orderkey " +
          "WHEN MATCHED AND s.deleted THEN DELETE " +
          "WHEN MATCHED AND t.o_totalprice < 100000 THEN UPDATE SET " +
          "o_totalprice = s.o_totalprice + t.o_totalprice " +
          "WHEN NOT MATCHED AND NOT s.deleted THEN INSERT " +
          "(o_orderkey, o_orderstatus, o_totalprice) VALUES " +
          "(s.o_orderkey, s.o_orderstatus, s.o_totalprice) " +
          "WHEN NOT MATCHED BY SOURCE AND t.o_orderkey < 100 THEN DELETE " +
          "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET o_orderstatus = 'Z'")
      } finally sqlS.sql("DROP TABLE IF EXISTS txdml_cond_w")
      require(TxLog.latestVersion(s, base).contains(2L),
        "the five-clause statement must land as ONE commit")
      TxLog.read(s, base)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,6)")).cast("double")
            .as("sum_price"))
        .orderBy("o_orderstatus")
    }),

    // MERGE schema evolution (VERDICT r12 missing #1 — Delta's
    // schema.autoMerge / dbt-spark `on_schema_change:
    // append_new_columns` on a merge-materialized model): a MERGE
    // whose source carries a NEW column (1) fails LOUDLY by default
    // naming the column — never a silent drop — and (2) with the
    // autoMerge conf evolves the target schema in the SAME commit as
    // the merge: matched rows update with the column, inserts carry
    // it, untouched old-file rows read NULL, and time travel below
    // the merge stays narrow. One atomic commit, O(changed rows)
    // write volume — the evolution itself is a #schema metadata line.
    "s71_merge_evolve" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txevolve_orders"
      TxLog.drop(s, base)
      val od = t(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      TxLog.commit(
        od.where(col("o_orderkey") < 900)
          .repartitionByRange(4, col("o_orderkey")),
        base, None, Some("o_orderkey"))
      graft.sources.TxLogSqlDml.ensureInjected(s)
      val sqlS = s.newSession()
      sqlS.sql("DROP TABLE IF EXISTS txdml_evolve_w")
      sqlS.sql("CREATE TABLE txdml_evolve_w " +
        s"USING graft.sources.TxLogSource OPTIONS (path '$base')")
      val stmt = "MERGE INTO txdml_evolve_w t USING (" +
        "SELECT o_orderkey, o_orderstatus, o_totalprice, " +
        "CASE CAST(o_orderkey % 3 AS INT) WHEN 0 THEN 'web' " +
        "WHEN 1 THEN 'app' ELSE 'ops' END AS o_channel " +
        s"FROM parquet.`$dir/orders.parquet` " +
        "WHERE o_orderkey BETWEEN 450 AND 1350) s " +
        "ON t.o_orderkey = s.o_orderkey " +
        "WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *"
      try {
        // default: the star shape VETOES (naming column and conf)
        val err = scala.util.Try(sqlS.sql(stmt))
        require(err.isFailure &&
          err.failed.get.getMessage.contains("o_channel"),
          s"autoMerge off must veto the evolving star merge: $err")
        require(TxLog.latestVersion(s, base).contains(1L),
          "the veto must land nothing")
        sqlS.conf.set(graft.sources.TxLogSqlDml.AutoMergeConf, "true")
        sqlS.sql(stmt)
      } finally {
        sqlS.conf.unset(graft.sources.TxLogSqlDml.AutoMergeConf)
        sqlS.sql("DROP TABLE IF EXISTS txdml_evolve_w")
      }
      require(TxLog.latestVersion(s, base).contains(2L),
        "schema evolution + merge must land as ONE commit")
      require(!TxLog.readVersion(s, base, 1L).columns.contains("o_channel"),
        "time travel below the merge must stay narrow")
      require(TxLog.declaredSchemaOf(s, base, 2L).exists(
        _.fieldNames.contains("o_channel")),
        "the evolved #schema must carry the new column")
      TxLog.readEvolved(s, base)
        .groupBy(coalesce(col("o_channel"), lit("none")).as("channel"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,6)")).cast("double")
            .as("sum_price"))
        .orderBy("channel")
    }),

    // ALTER COLUMN type widening (VERDICT r11 missing #4 — Delta's
    // type-widening feature): INT→BIGINT and FLOAT→DOUBLE as
    // metadata-only commits, then a WIDE append lands next to the
    // narrow files — a mix neither footer inference nor mergeSchema
    // can read; the #widencol line pins every reader to the declared
    // schema and Spark's parquet readers upcast per file. The oracle
    // recomputes the mixed-width content from the raw table,
    // modelling band 1's float round-trip explicitly.
    "s70_alter_widen" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txwiden_orders"
      TxLog.drop(s, base)
      val od = t(s, dir, "orders").select(
        col("o_orderkey").cast("int").as("o_orderkey"),
        col("o_totalprice").cast("float").as("o_totalprice"))
      TxLog.commit(
        od.where(col("o_orderkey") < 1000)
          .repartitionByRange(2, col("o_orderkey")),
        base, None, Some("o_orderkey"))
      TxLog.alterWidenColumn(s, base, "o_orderkey",
        org.apache.spark.sql.types.LongType)
      TxLog.alterWidenColumn(s, base, "o_totalprice",
        org.apache.spark.sql.types.DoubleType)
      TxLog.append(
        od.where(col("o_orderkey").between(1000, 2000)).select(
          col("o_orderkey").cast("bigint").as("o_orderkey"),
          col("o_totalprice").cast("double").as("o_totalprice")),
        base, Some("o_orderkey"))
      val snap = TxLog.read(s, base)
      require(snap.schema("o_orderkey").dataType ==
        org.apache.spark.sql.types.LongType,
        "the widened surface must serve BIGINT over the narrow files")
      // time travel below the ALTER still serves INT
      require(TxLog.readVersion(s, base, 1L).schema("o_orderkey").dataType
        == org.apache.spark.sql.types.IntegerType,
        "time travel below the ALTER must serve the old type")
      // the float→double half is pinned by requires (DuckDB folds a
      // REAL round-trip, so float-derived values cannot be
      // oracle-compared portably; TxLogWidenSpec owns the value laws)
      require(snap.schema("o_totalprice").dataType ==
        org.apache.spark.sql.types.DoubleType,
        "o_totalprice must serve as DOUBLE after the widen")
      require(snap.where(col("o_totalprice").isNull).count() == 0,
        "the upcast must lose no values")
      // compared output: exact integer aggregates over the widened key
      snap.groupBy((col("o_orderkey") % 7).cast("int").as("grp"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_orderkey")).as("sum_key"))
        .orderBy("grp")
    }),

    // The Delta 4.0 widening matrix's CROSS-FAMILY legs (r12 missing
    // #2): int→decimal and date→timestamp_ntz as metadata-only
    // ALTERs over live data, with a post-widen append carrying
    // genuinely fractional decimals next to the integer-narrow files.
    // The oracle recomputes the mixed set exactly — decimal sums are
    // exact integers under the hood, so the comparison is portable.
    "s72_widen_matrix" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txwidenx_orders"
      TxLog.drop(s, base)
      import org.apache.spark.sql.types._
      val od = t(s, dir, "orders").select(
        col("o_orderkey").cast("int").as("o_orderkey"),
        (col("o_orderkey") % 97).cast("int").as("o_disc"),
        to_date(col("o_orderdate")).as("o_day"))
      TxLog.commit(
        od.where(col("o_orderkey") < 1000)
          .repartitionByRange(2, col("o_orderkey")),
        base, None, Some("o_orderkey"))
      TxLog.alterWidenColumn(s, base, "o_disc", DecimalType(12, 2))
      TxLog.alterWidenColumn(s, base, "o_day", TimestampNTZType)
      require(TxLog.manifestFiles(s, base, 3L).toSet ==
        TxLog.manifestFiles(s, base, 1L).toSet,
        "both ALTERs must be metadata-only")
      // the wide append: fractional discounts, real NTZ instants
      TxLog.append(
        od.where(col("o_orderkey").between(1000, 2000)).select(
          col("o_orderkey"),
          (col("o_disc") + lit(0.25)).cast(DecimalType(12, 2))
            .as("o_disc"),
          col("o_day").cast(TimestampNTZType).as("o_day")),
        base, Some("o_orderkey"))
      val snap = TxLog.read(s, base)
      require(snap.schema("o_disc").dataType == DecimalType(12, 2) &&
        snap.schema("o_day").dataType == TimestampNTZType,
        "the widened surface must serve DECIMAL and TIMESTAMP_NTZ")
      require(TxLog.readVersion(s, base, 1L).schema("o_disc").dataType
        == IntegerType, "time travel below the ALTER stays narrow")
      snap.groupBy((col("o_orderkey") % 5).cast("int").as("grp"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_disc")).cast("double").as("sum_disc"),
          max(col("o_day")).as("max_day"))
        .orderBy("grp")
    }),

    // CLUSTER BY — the liquid-clustering analog (VERDICT r12 missing
    // #3): keys register at CREATE, every append tiles itself (box
    // files + auto-stats, no maintenance needed for skip sharpness),
    // and plain OPTIMIZE is INCREMENTAL — straggler batches fold on
    // the registered keys while the healthy tiled history carries by
    // reference (requires pin the carried set). Content oracle over
    // the full mixed layout.
    "s73_cluster_incremental" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txcluster_li"
      TxLog.drop(s, base)
      import org.apache.spark.sql.types._
      TxLog.createTable(s, base, StructType(Seq(
        StructField("l_orderkey", LongType),
        StructField("l_partkey", LongType),
        StructField("l_quantity", DoubleType))),
        clusterBy = Seq("l_orderkey", "l_partkey"))
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_quantity")
      // the bulk append TILES ITSELF on (l_orderkey, l_partkey)
      TxLog.append(li.where(col("l_orderkey") > 200)
        .repartition(8), base)
      val vBulk = TxLog.latestVersion(s, base).get
      val tiles = TxLog.manifest(s, base, vBulk)._1
      require(tiles.forall(e => e.statsFor("l_orderkey").isDefined &&
        e.statsFor("l_partkey").isDefined),
        "clustered appends must stamp stats on both keys")
      // 2-D box prune works with ZERO maintenance runs
      val (kept, all) = TxLog.pruneRanges(s, base,
        Seq(("l_orderkey", 1L, 400L), ("l_partkey", 1L, 400L)))
      require(all.size >= 6 && kept.size < all.size,
        s"self-tiled layout must prune the box: ${kept.size}/${all.size}")
      // stragglers CONFINED to the low-key corner band, then
      // INCREMENTAL OPTIMIZE on the registered keys — only the tiles
      // whose boxes the band pollutes fold in
      (0 to 2).foreach(i => TxLog.append(
        li.where(col("l_orderkey") <= 200 &&
          col("l_orderkey") % 3 === i).coalesce(1), base))
      val healthy = TxLog.manifest(s, base,
        TxLog.latestVersion(s, base).get)._1
        .filter(_.liveRows >= 2000).map(_.path).toSet
      val vOpt = TxLog.compact(s, base, 2000L, 1000000L)
      val post = TxLog.manifest(s, base, vOpt)._1.map(_.path).toSet
      val carried = healthy.intersect(post)
      require(carried.size >= healthy.size / 2,
        s"incremental OPTIMIZE must carry most healthy tiles " +
          s"(${carried.size}/${healthy.size})")
      require(!TxLog.dataChangeOf(s, base, vOpt),
        "the re-tile is dataChange=false")
      TxLog.read(s, base)
        .groupBy((col("l_orderkey") % 7).cast("int").as("grp"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,6)")).cast("double")
            .as("sum_qty"))
        .orderBy("grp")
    }),

    // Row tracking (VERDICT r12 next-round #4 — Delta 4.0 row IDs):
    // stable per-row ids assigned at enable/commit, MATERIALIZED
    // through OPTIMIZE and COW UPDATE, and the payoff surface — a
    // tracked COW UPDATE's change feed emits TRUE update images
    // paired by the stable id (only the value-changed rows; unchanged
    // rows that merely moved files are no logical change). The ids
    // themselves are engine-private (span order follows file order),
    // so the requires pin the id laws (uniqueness, stability across
    // rewrites) and the COMPARED output is the paired images'
    // content, which the oracle recomputes from the raw table.
    "s74_row_tracking" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txrid_orders"
      TxLog.drop(s, base)
      val od = t(s, dir, "orders").select(
        col("o_orderkey").cast("int").as("k"),
        (col("o_orderkey") * 3).cast("int").as("v"))
        .where(col("k") < 1500)
      TxLog.commit(od.repartitionByRange(4, col("k")),
        base, None, Some("k"))
      TxLog.enableRowTracking(s, base)
      def ids() = TxLog.readWithRowIds(s, base)
        .select("k", "_row_id").collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val ids0 = ids()
      require(ids0.values.toSet.size == ids0.size, "ids must be unique")
      // OPTIMIZE folds the band files; ids must survive the rewrite
      TxLog.compact(s, base, 1000000L, 2000000L)
      require(ids() == ids0, "ids must survive OPTIMIZE")
      val vPre = TxLog.latestVersion(s, base).get
      // COW UPDATE changes only k in [400, 500]
      TxLog.updateRange(s, base, "k", 400, 500,
        Map("v" -> (col("v") + lit(7))))
      require(ids() == ids0, "ids must survive the COW UPDATE")
      val vUpd = TxLog.latestVersion(s, base).get
      require(TxLog.cdfOpOf(s, base, vUpd).contains("update_cow"),
        "a tracked COW update stamps its hint")
      val feed = TxLog.changesWithDeletes(s, base, vPre, vUpd)
      val pre = feed.where(col("_change_type") === "update_preimage")
        .select(col("_row_id"), col("k"), col("v").as("v_pre"))
      val post = feed.where(col("_change_type") === "update_postimage")
        .select(col("_row_id"), col("v").as("v_post"))
      pre.join(post, "_row_id")
        .select(col("k"), col("v_pre"), col("v_post"))
        .orderBy("k")
    }),

    // The DSv2 half of row tracking: `option("rowIds","true")` on the
    // txlog source surfaces the SAME stable `_row_id` the API verb
    // serves — materialized ids from rewritten files, span-ordinal
    // ids from fresh files, DV-masked rows absent — so SQL-route
    // consumers (JDBC, catalog tables) get lineage without the Scala
    // API. Ids are engine-private; requires pin scan==API agreement
    // and uniqueness, the COMPARED output is the survivor content the
    // oracle recomputes.
    "s75_rowid_scan" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txrid_scan"
      TxLog.drop(s, base)
      val od = t(s, dir, "orders").select(
        col("o_orderkey").cast("int").as("k"),
        (col("o_orderkey") % 100).cast("int").as("v"))
      TxLog.commit(od.where(col("k") < 2000)
        .repartitionByRange(4, col("k")), base, None, Some("k"))
      TxLog.enableRowTracking(s, base)
      // rewrite MATERIALIZES ids; the append's ids come from its span
      TxLog.compact(s, base, 1000000L, 2000000L)
      TxLog.append(od.where(col("k") >= 2000 && col("k") < 2400)
        .coalesce(1), base, Some("k"))
      // MOR delete: masked rows must vanish from the id surface too
      TxLog.deleteRangeMor(s, base, "k", 500L, 800L)
      val scan = s.read.format("graft.sources.TxLogSource")
        .option("rowIds", "true").load(base)
      val api = TxLog.readWithRowIds(s, base)
        .select("k", "v", "_row_id")
      require(scan.select("k", "v", "_row_id").exceptAll(api).isEmpty &&
        api.exceptAll(scan.select("k", "v", "_row_id")).isEmpty,
        "the scan option and the API verb must serve one id surface")
      val n = scan.count()
      require(scan.select("_row_id").distinct().count() == n,
        "stable ids must be unique")
      scan.groupBy("v")
        .agg(count(lit(1)).as("n"),
          sum(col("k")).cast("long").as("sum_k"))
        .orderBy("v")
    }),

    // Row-id lineage END-TO-END (the payoff of row tracking + the
    // DSv2 rowIds STREAM): a replica keyed ONLY by the stable
    // `_row_id` consumes the snapshot stream — the MOR update's
    // post-image arrives in a later batch under the SAME id its
    // target row was born with (inherited + materialized at update
    // time), so an id-keyed latest-wins merge reconstructs the
    // source without ever seeing a delete. The helper requires
    // replica ≡ source bit-for-bit and unique ids; the oracle
    // recomputes the final state from orders.
    "stream_txlog_lineage" -> ((s, dir) =>
      graft.streaming.StreamingOps.rowIdLineagePipeline(s, dir)
        .groupBy("v")
        .agg(count(lit(1)).as("n"), sum(col("k")).cast("long").as("sum_k"))
        .orderBy("v")),

    // In-commit timestamps (Delta 4.0 ICT): every commit writes its
    // own wall-clock stamp into the manifest, so TIMESTAMP AS OF is a
    // property of the LOG — the witness COPIES the whole table
    // directory, scrambles every manifest mtime a day into the
    // future (what a backup restore / storage migration does), and
    // time-travels the COPY at the original instants. Resolution by
    // mtime would serve the wrong version; the requires pin both
    // versions and the compared output is v1's content.
    "s76_ict_time_travel" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txict_orders"
      val copy = Ingest.fixtureDir(dir) + "/txict_copy"
      TxLog.drop(s, base)
      val od = t(s, dir, "orders").select(
        col("o_orderkey").cast("int").as("k"),
        col("o_totalprice").cast("double").as("price"))
      TxLog.commit(od.where(col("k") < 1000)
        .repartitionByRange(2, col("k")), base, None, Some("k"))
      TxLog.append(od.where(col("k") >= 1000 && col("k") < 1400),
        base, Some("k"))
      val t1 = TxLog.ictOf(s, base, 1L).getOrElse(
        sys.error("v1 must carry an in-commit stamp"))
      val t2 = TxLog.ictOf(s, base, 2L).getOrElse(
        sys.error("v2 must carry an in-commit stamp"))
      require(t1 < t2, "stamps are strictly monotonic")
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(copy))
      org.apache.commons.io.FileUtils.copyDirectory(
        new java.io.File(base), new java.io.File(copy))
      val far = t2 + 86400000L
      java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$copy/${TxLog.LogDir}")).forEach(p =>
        java.nio.file.Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(far)))
      TxLog.cachePurge(copy)
      require(TxLog.versionAtTimestamp(s, copy, t1) == 1L &&
        TxLog.versionAtTimestamp(s, copy, t2) == 2L &&
        TxLog.versionAtTimestamp(s, copy, t2 - 1) == 1L,
        "the copy must resolve by the in-commit stamps, not the " +
          "rewritten mtimes")
      TxLog.readTimestampAsOf(s, copy, t1)
        .groupBy((col("k") % 10).cast("int").as("grp"))
        .agg(count(lit(1)).as("n"),
          sum(col("price").cast("decimal(18,6)")).cast("double")
            .as("sum_price"))
        .orderBy("grp")
    }),

    // Deep clone (Delta CREATE TABLE ... DEEP CLONE): an INDEPENDENT
    // materialized copy — every data file and DV sidecar is copied
    // EXECUTOR-side (one Spark job over the file list; at 100 TB the
    // copy IS the job, a driver loop would serialize days of IO), and
    // the manifest publishes dst-relative paths. The requires prove
    // the decoupling shallow clones can't give: the SOURCE IS DROPPED
    // before the clone is read. Routed over the SQL grammar
    // (CREATE TABLE ... DEEP CLONE ... LOCATION). Oracle: the content
    // aggregate, masked rows excluded (the DV rides the copy).
    "s77_deep_clone" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txclone_src"
      val dst = Ingest.fixtureDir(dir) + "/txclone_deep"
      TxLog.drop(s, base); TxLog.drop(s, dst)
      val od = t(s, dir, "orders").where(col("o_orderkey") < 1600)
        .select(col("o_orderkey").cast("long").as("k"),
          col("o_totalprice").cast("double").as("price"))
      TxLog.commit(od.repartitionByRange(4, col("k")), base, None, Some("k"))
      TxLog.deleteRangeMor(s, base, "k", 300L, 700L)
      graft.sources.TxLogSqlDml.ensureInjected(s)
      val sqlS = s.newSession()
      sqlS.sql("DROP TABLE IF EXISTS txclone_w")
      sqlS.sql("CREATE TABLE txclone_w USING graft.sources.TxLogSource " +
        s"OPTIONS (path '$base')")
      try {
        val r = sqlS.sql("CREATE TABLE tx_deep DEEP CLONE txclone_w " +
          s"LOCATION '$dst'").collect()
        require(r.head.getLong(1) == 1L, "a clone publishes version 1")
      } finally sqlS.sql("DROP TABLE IF EXISTS txclone_w")
      val entries = TxLog.manifest(s, dst, 1L)._1
      require(entries.forall(e =>
        !e.path.startsWith("/") && !e.path.contains("://")),
        "deep clone must hold dst-relative paths only")
      require(entries.exists(_.dv.isDefined),
        "the DV mask must ride the clone")
      TxLog.drop(s, base) // the decoupling law
      TxLog.cachePurge(dst)
      TxLog.read(s, dst)
        .groupBy((col("k") % 7).cast("int").as("grp"))
        .agg(count(lit(1)).as("n"),
          sum(col("price").cast("decimal(18,6)")).cast("double")
            .as("sum_price"))
        .orderBy("grp")
    }),

    // Column DEFAULT values (Delta's allowColumnDefaults): a constant
    // fill for FUTURE writes that omit the column — and only future
    // writes. The fixture walks the full lifecycle: rows land before
    // the column exists (read NULL forever — never a read-time
    // backfill), an ADD COLUMNS + SET DEFAULT binds the fill, an
    // omitting append takes it, a supplying append overrides it.
    // Oracle: the per-tier aggregate, with the NULL tier made
    // explicit.
    "s78_column_defaults" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txdflt_orders"
      TxLog.drop(s, base)
      val od = t(s, dir, "orders")
        .select(col("o_orderkey").cast("long").as("k"),
          col("o_totalprice").cast("double").as("price"))
      TxLog.commit(od.where(col("k") < 1200)
        .repartitionByRange(2, col("k")), base, None, Some("k"))
      TxLog.alterAddColumns(s, base,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("tier",
            org.apache.spark.sql.types.StringType))))
      TxLog.alterColumnDefault(s, base, "tier", Some("'std'"))
      TxLog.append(od.where(col("k") >= 1200 && col("k") < 2400),
        base, Some("k"))                             // omitted → 'std'
      TxLog.append(od.where(col("k") >= 2400 && col("k") < 3000)
        .withColumn("tier", lit("vip")), base, Some("k")) // supplied wins
      TxLog.readEvolved(s, base)
        .groupBy(coalesce(col("tier"), lit("none")).as("tier"))
        .agg(count(lit(1)).as("n"),
          sum(col("price").cast("decimal(18,6)")).cast("double")
            .as("sum_price"))
        .orderBy("tier")
    }),

    // DROP FEATURE (Delta 3.4's protocol downgrade): the verb that
    // lets an OLDER engine build read/write a long-lived table again.
    // The fixture loads the table with rowTracking + a type widening,
    // drops both over SQL, and the requires pin what makes the drop
    // sound: typeWidening's in-commit cleanup rewrites the narrow
    // files (so PLAIN footer inference — no #widencol pinning —
    // serves the table, proven by a raw mergeSchema read), and the
    // protocol floors genuinely FALL back to (1,1). Oracle: the
    // content aggregate.
    "s79_drop_feature" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txdropf_orders"
      TxLog.drop(s, base)
      val od = t(s, dir, "orders")
        .select(col("o_orderkey").cast("long").as("k"),
          col("o_totalprice").cast("double").as("price"))
      TxLog.commit(od.where(col("k") < 2000)
        .select(col("k").cast("int").as("k"), col("price"))
        .repartitionByRange(3, col("k")), base, None, Some("k"))
      TxLog.enableRowTracking(s, base)
      TxLog.alterWidenColumn(s, base, "k",
        org.apache.spark.sql.types.LongType)
      TxLog.append(od.where(col("k") >= 2000 && col("k") < 3000),
        base, Some("k")) // lands wide
      graft.sources.TxLogSqlDml.ensureInjected(s)
      val sqlS = s.newSession()
      sqlS.sql("DROP TABLE IF EXISTS txdropf_reg_w")
      sqlS.sql("CREATE TABLE txdropf_reg_w USING graft.sources.TxLogSource " +
        s"OPTIONS (path '$base')")
      try {
        sqlS.sql("ALTER TABLE txdropf_reg_w DROP FEATURE typeWidening")
        sqlS.sql("ALTER TABLE txdropf_reg_w DROP FEATURE rowTracking")
      } finally sqlS.sql("DROP TABLE IF EXISTS txdropf_reg_w")
      val detail = TxLog.describeDetail(s, base).head()
      require(detail.getAs[Int]("min_writer_version") == 1 &&
        detail.getAs[Int]("min_reader_version") == 1,
        "the floors must fall back to (1,1)")
      val live = TxLog.manifest(s, base,
        TxLog.latestVersion(s, base).get)._1
      val raw = s.read.option("mergeSchema", "true")
        .parquet(live.map(e => TxLog.resolve(base, e.path)): _*)
      require(raw.schema("k").dataType ==
        org.apache.spark.sql.types.LongType,
        "plain inference must serve the uniform wide type post-drop")
      TxLog.read(s, base)
        .groupBy((col("k") % 9).cast("int").as("grp"))
        .agg(count(lit(1)).as("n"),
          sum(col("price").cast("decimal(18,6)")).cast("double")
            .as("sum_price"))
        .orderBy("grp")
    }),

    // table_changes('t', start [, end]) — Delta's SQL CDF surface as
    // a table-valued function (the injectTableFunction rung): a BI
    // client or dbt model reads the row-precise change feed with ONE
    // SQL expression, no API access. The requires pin the audit
    // columns Delta contracts: _commit_timestamp is the in-commit
    // stamp (non-null, nondecreasing across versions) and the
    // default endVersion is the table's latest. Oracle: the per-type
    // change aggregate for versions [2, 3] (an insert batch + a MOR
    // delete).
    "s80_table_changes" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txtvf_orders"
      TxLog.drop(s, base)
      val od = t(s, dir, "orders")
        .select(col("o_orderkey").cast("long").as("k"),
          col("o_totalprice").cast("double").as("price"))
      TxLog.commit(od.where(col("k") < 1000)
        .repartitionByRange(2, col("k")), base, None, Some("k"))
      TxLog.append(od.where(col("k") >= 1000 && col("k") < 1600),
        base, Some("k"))
      TxLog.deleteRangeMor(s, base, "k", 200L, 400L)
      graft.sources.TxLogSqlDml.ensureInjected(s)
      val sqlS = s.newSession()
      org.apache.spark.sql.graftbridge.ColumnBridge
        .registerTableFunction(sqlS, graft.GraftExtensions.tableChangesFunction)
      sqlS.sql("DROP TABLE IF EXISTS txtvf_w")
      sqlS.sql("CREATE TABLE txtvf_w USING graft.sources.TxLogSource " +
        s"OPTIONS (path '$base')")
      try {
        // audit-column contract over the FULL feed (default end)
        val ts = sqlS.sql(
          "SELECT _commit_version AS v, min(_commit_timestamp) AS lo, " +
            "max(_commit_timestamp) AS hi " +
            "FROM table_changes('txtvf_w', 1) GROUP BY 1 ORDER BY 1")
          .collect()
        require(ts.length == 3 && ts.forall(r =>
          !r.isNullAt(1) && !r.isNullAt(2)),
          "every change row must carry the in-commit stamp")
        require(ts.sliding(2).forall { case Array(a, b) =>
          !a.getTimestamp(2).after(b.getTimestamp(1)) },
          "in-commit stamps must be nondecreasing across versions")
        // timestamp bounds resolve through the in-commit stamps
        val t2 = TxLog.ictOf(s, base, 2L).getOrElse(
          sys.error("v2 must carry #ict"))
        val byTs = sqlS.sql(
          s"SELECT count(*) AS n FROM table_changes('txtvf_w', '$t2', '$t2')")
          .head.getLong(0)
        val byV = sqlS.sql(
          "SELECT count(*) AS n FROM table_changes('txtvf_w', 2, 2)")
          .head.getLong(0)
        require(byTs == byV && byV > 0,
          s"a timestamp bound must resolve to its commit: $byTs vs $byV")
        sqlS.sql(
          """SELECT _change_type, count(*) AS n,
                    cast(sum(k) AS BIGINT) AS sum_k
             FROM table_changes('txtvf_w', 2, 3)
             GROUP BY 1 ORDER BY 1""")
      } finally sqlS.sql("DROP TABLE IF EXISTS txtvf_w")
    }),

    // COPY INTO (Databricks' idempotent bulk load — the reference's
    // scheduled bronze ingestion, load_bronze_to_table.py, as ONE SQL
    // verb): only never-loaded files land, in one ACID append; the
    // per-file markers ride the txn map, so re-running is exactly-once
    // with no extra state store and no protocol bump. The requires
    // pin the contract: first run loads both waves, the re-run loads
    // ZERO, a third file loads alone. Oracle: the content aggregate.
    "s81_copy_into" -> ((s, dir) => {
      val src = Ingest.fixtureDir(dir) + "/txcopy_src"
      val base = Ingest.fixtureDir(dir) + "/txcopy_orders"
      val fsys = new org.apache.hadoop.fs.Path(src)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fsys.delete(new org.apache.hadoop.fs.Path(src), true)
      TxLog.drop(s, base)
      val od = t(s, dir, "orders")
        .select(col("o_orderkey").cast("long").as("k"),
          col("o_totalprice").cast("double").as("price"))
      def wave(name: String, lo: Long, hi: Long): Unit = {
        val tmp = s"$src/__tmp_$name"
        od.where(col("k") >= lo && col("k") < hi).coalesce(1)
          .write.mode("overwrite").parquet(tmp)
        val part = fsys.listStatus(new org.apache.hadoop.fs.Path(tmp))
          .find(_.getPath.getName.endsWith(".parquet")).get.getPath
        fsys.rename(part,
          new org.apache.hadoop.fs.Path(s"$src/$name.parquet"))
        fsys.delete(new org.apache.hadoop.fs.Path(tmp), true)
      }
      wave("a", 0L, 1200L); wave("b", 1200L, 2000L)
      TxLog.append(od.where(col("k") >= 2400 && col("k") < 2600),
        base, Some("k")) // seeds the table outside the copy waves
      graft.sources.TxLogSqlDml.ensureInjected(s)
      val sqlS = s.newSession()
      sqlS.sql("DROP TABLE IF EXISTS txcopy_reg_w")
      sqlS.sql("CREATE TABLE txcopy_reg_w USING graft.sources.TxLogSource " +
        s"OPTIONS (path '$base')")
      try {
        val copy = s"COPY INTO txcopy_reg_w FROM '$src' " +
          "FILEFORMAT = PARQUET PATTERN = '*.parquet'"
        val r1 = sqlS.sql(copy).collect().head
        require(r1.getLong(1) == 2, s"both waves must load: $r1")
        val r2 = sqlS.sql(copy).collect().head
        require(r2.getLong(1) == 0 && r2.getLong(2) == 0,
          s"the re-run must be exactly-once: $r2")
        wave("c", 2000L, 2400L)
        val r3 = sqlS.sql(copy).collect().head
        require(r3.getLong(1) == 1, s"only the new file loads: $r3")
      } finally sqlS.sql("DROP TABLE IF EXISTS txcopy_reg_w")
      TxLog.read(s, base)
        .groupBy((col("k") % 11).cast("int").as("grp"))
        .agg(count(lit(1)).as("n"),
          sum(col("price").cast("decimal(18,6)")).cast("double")
            .as("sum_price"))
        .orderBy("grp")
    }),

    // VACUUM LITE (Delta 3.3's log-driven vacuum): the reclaim set is
    // computed from the LOG alone — dropped versions' references
    // minus kept liveness — with ZERO data-tree listing, and the
    // per-file deletes fan out executor-side. At 100 TB the LIST is
    // the slow call on object stores; LITE never issues one. The
    // requires pin that an OPTIMIZE's superseded inputs were
    // physically reclaimed (> 0 files), only the final version
    // survives, and content is untouched. Oracle: the content
    // aggregate.
    "s82_vacuum_lite" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txvlite_orders"
      TxLog.drop(s, base)
      val od = t(s, dir, "orders")
        .select(col("o_orderkey").cast("long").as("k"),
          col("o_totalprice").cast("double").as("price"))
      TxLog.commit(od.where(col("k") < 1800)
        .repartitionByRange(4, col("k")), base, None, Some("k"))
      Seq(0, 1).foreach(i => TxLog.append(
        od.where(col("k") >= 1800 && col("k") < 2400 &&
          col("k") % 2 === i).coalesce(1), base, Some("k")))
      TxLog.compact(s, base, 1L << 20, 1L << 22) // supersede the inputs
      graft.sources.TxLogSqlDml.ensureInjected(s)
      val sqlS = s.newSession()
      sqlS.sql("DROP TABLE IF EXISTS txvlite_reg_w")
      sqlS.sql("CREATE TABLE txvlite_reg_w USING graft.sources.TxLogSource " +
        s"OPTIONS (path '$base')")
      try {
        val rows = sqlS.sql("VACUUM txvlite_reg_w LITE RETAIN 1 VERSIONS")
          .collect()
        require(rows.length == 1 && rows.head.getLong(1) >= 1,
          s"LITE must reclaim the superseded inputs: ${rows.toSeq}")
      } finally sqlS.sql("DROP TABLE IF EXISTS txvlite_reg_w")
      TxLog.cachePurge(base)
      TxLog.read(s, base)
        .groupBy((col("k") % 13).cast("int").as("grp"))
        .agg(count(lit(1)).as("n"),
          sum(col("price").cast("decimal(18,6)")).cast("double")
            .as("sum_price"))
        .orderBy("grp")
    }),

    // Maintenance SQL grammar (the injectParser rung): OPTIMIZE
    // bin-packs straggler appends and VACUUM trims history, both as
    // plain SQL a JDBC operator could issue — the requires pin that
    // the file count dropped and only the final version survived,
    // while content is untouched. Oracle: the content aggregate.
    "s53_sql_optimize" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txsqlopt_lineitem"
      TxLog.drop(s, base)
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_quantity", "l_returnflag")
      TxLog.commit(
        li.where(col("l_orderkey") % 10 !== 0)
          .repartitionByRange(8, col("l_orderkey")),
        base, None, Some("l_orderkey"))
      Seq(0, 1, 2).foreach(i => TxLog.append(
        li.where(col("l_orderkey") % 10 === 0 &&
          col("l_orderkey") % 3 === i).coalesce(1), base, Some("l_orderkey")))
      val preFiles = TxLog.manifest(s, base, 4L)._1.size
      graft.sources.TxLogSqlDml.ensureInjected(s)
      val sqlS = s.newSession()
      sqlS.sql("DROP TABLE IF EXISTS txsql_opt_w")
      sqlS.sql("CREATE TABLE txsql_opt_w " +
        s"USING graft.sources.TxLogSource OPTIONS (path '$base')")
      try {
        sqlS.sql("OPTIMIZE txsql_opt_w")
        val postFiles = TxLog.manifest(s, base,
          TxLog.latestVersion(s, base).get)._1.size
        require(postFiles < preFiles,
          s"OPTIMIZE must fold stragglers: $preFiles -> $postFiles")
        val kept = sqlS.sql("VACUUM txsql_opt_w RETAIN 1 VERSIONS")
          .collect().map(_.getLong(0)).toSeq
        require(kept.size == 1, s"VACUUM must keep one version: $kept")
      } finally sqlS.sql("DROP TABLE IF EXISTS txsql_opt_w")
      TxLog.read(s, base)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,6)")).cast("double")
            .as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // The reference's dbt incremental lifecycle END-TO-END on the log
    // (SURVEY §3 E2, stg_properties.sql:1-16): day-1 state
    // materialized into a txlog table; day-2 increment selected by
    // the is_incremental() watermark against the CURRENT table state,
    // deduped latest-per-key, and applied as SQL
    // `MERGE INTO ... WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED
    // THEN INSERT *` — exactly the statement dbt-spark emits over
    // Thrift for incremental_strategy='merge'. Zero files rewritten
    // (merge-on-read), snapshot-isolated readers throughout. The
    // oracle is the same latest-per-user recompute as
    // pipeline_incremental_run — two routes, one truth.
    "s54_dbt_merge_lifecycle" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val d2 = to_timestamp(lit("2024-01-10 00:00:00"))
      val d3 = to_timestamp(lit("2024-01-20 00:00:00"))
      def latest(df: DataFrame) = graft.operators.Dedup.latestByKey(
        df, Seq("user_id"), Seq(col("ts").desc, col("event_id").desc))
      val base = Ingest.fixtureDir(dir) + "/txdbt_state"
      val incrPath = Ingest.fixtureDir(dir) + "/txdbt_incr"
      TxLog.drop(s, base)
      // run 1: initial materialization (dbt full-refresh)
      TxLog.commit(
        latest(ev.where(col("ts") < d2))
          .select("user_id", "event_id", "event_type", "value", "ts"),
        base, None, Some("user_id"))
      // run 2: watermark increment against the LIVE table state
      val incr = latest(graft.operators.Incremental.newerThanWatermark(
        ev.where(col("ts") < d3), TxLog.read(s, base), "ts", "ts"))
        .select("user_id", "event_id", "event_type", "value", "ts")
      incr.write.mode("overwrite").parquet(incrPath)
      graft.sources.TxLogSqlDml.ensureInjected(s)
      val sqlS = s.newSession()
      sqlS.sql("DROP TABLE IF EXISTS txdbt_state_w")
      sqlS.sql("CREATE TABLE txdbt_state_w " +
        s"USING graft.sources.TxLogSource OPTIONS (path '$base')")
      try {
        val before = TxLog.manifestFiles(s, base, 1L).toSet
        sqlS.sql("MERGE INTO txdbt_state_w t USING (SELECT * FROM " +
          s"parquet.`$incrPath`) s ON t.user_id = s.user_id " +
          "WHEN MATCHED THEN UPDATE SET * " +
          "WHEN NOT MATCHED THEN INSERT *")
        val v2 = TxLog.latestVersion(s, base).get
        require(v2 == 2L, s"one atomic MERGE commit expected, at $v2")
        // merge-on-read write-volume evidence: the NEW files hold
        // exactly the increment's rows — matched state rows were
        // MASKED (or their fully-dead files dropped), never rewritten
        val newRows = TxLog.manifest(s, base, v2)._1
          .filterNot(e => before.contains(e.path)).map(_.rows).sum
        val incrRows = s.read.parquet(incrPath).count()
        require(newRows == incrRows,
          s"write volume must be O(increment): $newRows vs $incrRows")
      } finally sqlS.sql("DROP TABLE IF EXISTS txdbt_state_w")
      TxLog.read(s, base)
        .select("user_id", "event_id", "event_type", "value")
        .orderBy("user_id")
    }),

    // SQL RESTORE + DESCRIBE DETAIL (the last two Delta maintenance
    // verbs a SQL/JDBC user reaches for): RESTORE TABLE ... TO
    // VERSION AS OF rolls the table back by REPUBLISHING the target
    // version (history intact, no file moves), RESTORE ... TO
    // TIMESTAMP AS OF resolves latest-commit-at-or-before first, and
    // DESCRIBE DETAIL reports the one-row inventory (live counts,
    // bytes, metadata) after each roll. Final state = v2 restored on
    // top of a v1 rollback, so the oracle is the plain full recompute.
    "s55_sql_restore_detail" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txsqlrestore_events"
      TxLog.drop(s, base)
      val ev = t(s, dir, "events")
        .select("event_id", "event_type", "value")
      TxLog.commit(
        ev.where(col("event_id") < 500)
          .repartitionByRange(4, col("event_id")),
        base, None, Some("event_id"))
      TxLog.append(ev.where(col("event_id") >= 500), base, Some("event_id"))
      val t0 = 1700000000000L
      TxLog.setCommitTime(s, base, 1L, t0)
      TxLog.setCommitTime(s, base, 2L, t0 + 60000L)
      val v1n = ev.where(col("event_id") < 500).count()
      val alln = ev.count()
      graft.sources.TxLogSqlDml.ensureInjected(s)
      val sqlS = s.newSession()
      sqlS.sql("DROP TABLE IF EXISTS txsql_restore_w")
      sqlS.sql("CREATE TABLE txsql_restore_w " +
        s"USING graft.sources.TxLogSource OPTIONS (path '$base')")
      try {
        val r1 = sqlS.sql(
          "RESTORE TABLE txsql_restore_w TO VERSION AS OF 1").head
        require(r1.getLong(0) == 1L && r1.getLong(1) == 3L,
          s"restore must republish v1 as v3: $r1")
        val d1 = sqlS.sql("DESCRIBE DETAIL txsql_restore_w").head
        require(d1.getAs[String]("format") == "txlog" &&
          d1.getAs[Long]("version") == 3L &&
          d1.getAs[Long]("num_rows") == v1n &&
          d1.getAs[Long]("size_bytes") > 0L,
          s"DESCRIBE DETAIL must reflect the rolled-back state: $d1")
        // timestamp restore: latest commit at-or-before t0+90s is v2
        // (v3's instant is wall-clock NOW, far above the pinned pair)
        val r2 = sqlS.sql("RESTORE txsql_restore_w TO TIMESTAMP AS OF " +
          s"'${t0 + 90000L}'").head
        require(r2.getLong(0) == 2L && r2.getLong(1) == 4L,
          s"timestamp restore must resolve v2 and publish v4: $r2")
        val d2 = sqlS.sql("DESCRIBE DETAIL txsql_restore_w").head
        require(d2.getAs[Long]("num_rows") == alln,
          s"detail after the second roll must see all rows: $d2")
      } finally sqlS.sql("DROP TABLE IF EXISTS txsql_restore_w")
      TxLog.read(s, base)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("event_type")
    }),

    // The DSv2 TableCatalog rung (DeltaCatalog analog): a warehouse
    // of txlog tables addressable as `<catalog>.<ns>.<table>`, with
    // CTAS, INSERT INTO, and Spark's NATIVE time-travel SQL — the
    // analyzer resolves `VERSION AS OF n` through
    // TxLogCatalog.loadTable(ident, version), no reader options, no
    // injected grammar. The requires pin the chain shape (v1 empty
    // CREATE, v2 CTAS batch, v3 increment) and that the pinned
    // snapshot answers through the same stats-pruned scan. Oracle:
    // the full recompute from events.
    // Partition-scoped INSERT OVERWRITE (static + dynamic, Delta's
    // replaceWhere-on-partitions / partitionOverwriteMode=dynamic):
    // the named (or batch-present) partition tuples swap for the new
    // files while every other partition carries BY REFERENCE — the
    // commit is metadata + new data only, never a read or rewrite of
    // untouched partitions. The requires pin the carried file set.
    "s63_partition_overwrite" -> ((s, dir) => {
      val wh = Ingest.fixtureDir(dir) + "/txpow_warehouse"
      TxLog.drop(s, wh + "/lake/events_pow")
      graft.sources.TxLogSqlDml.ensureInjected(s)
      val sqlS = s.newSession()
      sqlS.conf.set("spark.sql.catalog.gpow", "graft.sources.TxLogCatalog")
      sqlS.conf.set("spark.sql.catalog.gpow.warehouse", wh)
      sqlS.sql("CREATE NAMESPACE IF NOT EXISTS gpow.lake")
      sqlS.sql("CREATE TABLE gpow.lake.events_pow (event_id BIGINT, " +
        "event_type STRING, value DOUBLE) " +
        "USING graft.sources.TxLogSource PARTITIONED BY (event_type)")
      t(sqlS, dir, "events").select("event_id", "event_type", "value")
        .createOrReplaceTempView("ev_pow_src")
      sqlS.sql("INSERT INTO gpow.lake.events_pow " +
        "SELECT * FROM ev_pow_src")
      val base = wh + "/lake/events_pow"
      val before = TxLog.manifest(sqlS, base,
        TxLog.latestVersion(sqlS, base).get)._1
      // static overwrite of ONE partition: purchases re-land doubled
      sqlS.sql("INSERT OVERWRITE gpow.lake.events_pow " +
        "PARTITION (event_type = 'purchase') " +
        "SELECT event_id, value * 2 AS value FROM ev_pow_src " +
        "WHERE event_type = 'purchase'")
      val after = TxLog.manifest(sqlS, base,
        TxLog.latestVersion(sqlS, base).get)._1.map(_.path).toSet
      val untouched = before.filter(_.statsFor("event_type")
        .exists(_.min != "purchase")).map(_.path)
      require(untouched.nonEmpty && untouched.forall(after.contains),
        "untouched partitions must carry by reference")
      require(before.filter(_.statsFor("event_type")
          .exists(_.min == "purchase")).map(_.path).forall(!after.contains(_)),
        "the overwritten partition's old files must drop")
      sqlS.sql("SELECT event_type, count(*) AS n, " +
        "cast(sum(cast(value AS decimal(18,6))) AS double) AS sum_value " +
        "FROM gpow.lake.events_pow GROUP BY event_type " +
        "ORDER BY event_type")
    }),

    "s56_catalog_sql_lifecycle" -> ((s, dir) => {
      val wh = Ingest.fixtureDir(dir) + "/txcat_warehouse"
      TxLog.drop(s, wh + "/lake/events_cat")
      graft.sources.TxLogSqlDml.ensureInjected(s)
      val sqlS = s.newSession()
      sqlS.conf.set("spark.sql.catalog.graftcat",
        "graft.sources.TxLogCatalog")
      sqlS.conf.set("spark.sql.catalog.graftcat.warehouse", wh)
      sqlS.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
      val ev = t(sqlS, dir, "events")
        .select("event_id", "event_type", "value")
      ev.where(col("event_id") < 500).createOrReplaceTempView("ev_p1")
      ev.where(col("event_id") >= 500).createOrReplaceTempView("ev_p2")
      sqlS.sql("CREATE TABLE graftcat.lake.events_cat " +
        "USING graft.sources.TxLogSource AS SELECT * FROM ev_p1")
      sqlS.sql("INSERT INTO graftcat.lake.events_cat " +
        "SELECT * FROM ev_p2")
      val n1 = ev.where(col("event_id") < 500).count()
      // CTAS is ATOMIC since the StagingTableCatalog rung: create +
      // data land as ONE commit (v1), the INSERT is v2
      require(sqlS.sql("SELECT count(*) AS n FROM " +
        "graftcat.lake.events_cat VERSION AS OF 1").head.getLong(0) == n1,
        "VERSION AS OF 1 must see exactly the (atomic) CTAS batch")
      require(sqlS.sql("SELECT count(*) AS n FROM " +
        "graftcat.lake.events_cat VERSION AS OF 2").head.getLong(0) ==
        ev.count(), "VERSION AS OF 2 is CTAS + INSERT")
      require(sqlS.sql("SELECT count(*) AS n FROM " +
        "graftcat.lake.events_cat VERSION AS OF 1 WHERE event_id < 100")
        .head.getLong(0) ==
        ev.where(col("event_id") < 100).count(),
        "stats-pruned filters must work through the pinned snapshot")
      TxLog.read(s, wh + "/lake/events_cat")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("event_type")
    }),

    // ALTER TABLE ADD COLUMNS (Delta's versioned metaData action):
    // a metadata-only commit widens the DECLARED schema via a
    // `#schema` manifest line — no file moves or rewrites, pre-ALTER
    // rows scan the new column as NULL, the next append fills it, and
    // the line is versioned with the log so time travel below the
    // ALTER stays narrow. The requires pin exactly that; the oracle
    // reproduces the same widened union in portable SQL.
    "s57_alter_add_column" -> ((s, dir) => {
      import org.apache.spark.sql.types.{StringType, StructField, StructType}
      val base = Ingest.fixtureDir(dir) + "/txalter_events"
      TxLog.drop(s, base)
      val ev = t(s, dir, "events").select("event_id", "event_type", "value")
      TxLog.commit(ev.where(col("event_id") < 600), base, None,
        Some("event_id"))
      val vAlter = TxLog.alterAddColumns(s, base,
        StructType(Seq(StructField("note", StringType))))
      require(vAlter == 2L, s"ALTER must publish version 2, got $vAlter")
      require(TxLog.declaredSchemaOf(s, base, 1L).isEmpty &&
        !TxLog.readVersion(s, base, 1L).columns.contains("note"),
        "time travel below the ALTER must stay narrow")
      require(TxLog.readEvolved(s, base).where(col("note").isNotNull)
        .count() == 0L, "a just-declared column scans as all-NULL")
      TxLog.append(ev.where(col("event_id") >= 600)
        .withColumn("note", concat(lit("n-"), col("event_type"))),
        base, Some("event_id"))
      require(TxLog.declaredSchemaOf(s, base, 3L)
        .exists(_.fieldNames.contains("note")),
        "the #schema line must carry forward through ordinary appends")
      TxLog.readEvolved(s, base)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          count(col("note")).as("n_noted"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("event_type")
    }),

    // CONVERT in place (Delta `CONVERT TO DELTA` analog): an existing
    // plain-parquet directory becomes a txlog table with ONE metadata
    // commit — zero bytes copied or moved, per-file stats computed in
    // the same pass so file skipping works from version 1, and every
    // later verb (here an ordinary append) treats it as log-born. At
    // 100 TB this is the difference between adopting a legacy lake
    // and rewriting it. Oracle: the adopted slice ∪ appended slice.
    "s58_convert_in_place" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txconvert_events"
      TxLog.drop(s, base)
      val ev = t(s, dir, "events").select("event_id", "event_type", "value")
      ev.where(col("event_id") < 700)
        .repartitionByRange(4, col("event_id"))
        .write.mode("overwrite").parquet(base)
      require(TxLog.convertParquet(s, base, Seq("event_id")) == 1L,
        "conversion must publish version 1")
      val (kept, all) = TxLog.pruneRanges(s, base,
        Seq(("event_id", 0L, 49L)))
      require(kept.size < all.size,
        s"conversion-time stats must prune (kept ${kept.size} of " +
          s"${all.size})")
      TxLog.append(ev.where(col("event_id") >= 700), base,
        Some("event_id"))
      TxLog.read(s, base)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("event_type")
    }),

    // Column mapping (Delta name-mode RENAME/DROP COLUMN): a rename
    // rebinds the logical name while the frozen PHYSICAL name keeps
    // keying every data file and manifest stat — a metadata-only
    // commit that moves zero bytes at any table size. DROP hides the
    // bytes; a re-ADDed column of the same name is born under a fresh
    // physical name, so the dropped data can never resurface. Every
    // verb downstream (pruning, MOR delete, reads) speaks the new
    // logical names. Oracle: the same aggregate straight off events,
    // with the re-ADDed column contributing zero non-NULLs.
    "s59_column_mapping" -> ((s, dir) => {
      import org.apache.spark.sql.types.{StringType, StructField, StructType}
      val base = Ingest.fixtureDir(dir) + "/txcmap_events"
      TxLog.drop(s, base)
      val ev = t(s, dir, "events").select("event_id", "event_type", "value")
      TxLog.commit(ev.repartitionByRange(8, col("event_id")), base, None,
        Some("event_id"))
      val files1 = TxLog.manifestFiles(s, base, 1L).toSet
      TxLog.renameColumn(s, base, "value", "amount")
      TxLog.renameColumn(s, base, "event_id", "eid")
      require(TxLog.manifestFiles(s, base, 3L).toSet == files1,
        "RENAME COLUMN must be metadata-only: zero data files touched")
      // pruning by the LOGICAL name reaches the physical stats
      val (kept, all) = TxLog.pruneRange(s, base, "eid", 0L, 49L)
      require(kept.size < all.size,
        s"logical-name skip must prune: kept ${kept.size} of ${all.size}")
      // DROP + re-ADD must never resurrect the dropped bytes
      TxLog.dropColumn(s, base, "event_type")
      TxLog.alterAddColumns(s, base,
        StructType(Seq(StructField("event_type", StringType))))
      require(TxLog.read(s, base).where(col("event_type").isNotNull)
        .count() == 0L,
        "a re-ADDed column must scan as NULL, not the dropped bytes")
      // row-level DML through the logical names (mask-only commit)
      TxLog.deleteRangeMor(s, base, "eid", 100L, 199L)
      TxLog.read(s, base)
        .groupBy((col("eid") % 7).as("bucket"))
        .agg(count(lit(1)).as("n"),
          count(col("event_type")).as("n_type"),
          sum(col("amount").cast("decimal(18,6)")).cast("double")
            .as("sum_amount"))
        .orderBy("bucket")
    }),

    // IDENTITY column (Delta GENERATED ALWAYS AS IDENTITY): two
    // appends get system-assigned surrogate ids — unique, increasing
    // across commits, gaps allowed — via per-partition counters above
    // the manifest's high-water (no shuffle, no global sort: O(batch)
    // at any table size). The requires pin cross-batch monotonicity
    // through the manifest high-water; the readback aggregates are
    // the deterministic face of a gap-tolerant id space. Oracle:
    // row counts from events (ids unique ⇒ n_distinct == n_rows).
    "s45_identity_append" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txid_events"
      TxLog.drop(s, base)
      val ev = t(s, dir, "events")
      TxLog.appendIdentity(
        ev.where(col("event_id") < 300)
          .select("user_id", "event_type", "value"),
        base, "row_id", Some("row_id"))
      val w1 = TxLog.identityOf(s, base, 1L)("row_id")
      TxLog.appendIdentity(
        ev.where(col("event_id").between(300, 599))
          .select("user_id", "event_type", "value"),
        base, "row_id", Some("row_id"))
      val w2 = TxLog.identityOf(s, base, 2L)("row_id")
      require(w2 > w1 && w1 > 0,
        s"identity high-water must grow across commits: $w1 -> $w2")
      TxLog.read(s, base)
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("row_id")).as("n_distinct_ids"),
          (count(lit(1)) === countDistinct(col("row_id"))).as("all_unique"),
          (min(col("row_id")) >= 1).as("ids_positive"))
    }),

    // Merge-on-read UPDATE (Delta's DV update path — mask + append):
    // the same band+residual shape as s29's COW update, but the hit
    // rows are MASKED in place and their updated images land as new
    // files in the SAME commit — the require pins that every original
    // file rides untouched and only fresh files were added. Write
    // cost O(updated rows), never a band rewrite. Oracle: identical
    // CASE recompute to s29.
    "s42_mor_update" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txmorupd_events"
      TxLog.drop(s, base)
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      TxLog.commit(ev.repartitionByRange(8, col("event_id")),
        base, None, Some("event_id"))
      val before = TxLog.manifestFiles(s, base, 1L).toSet
      TxLog.updateRangeMor(s, base, "event_id", cowLo, cowHi,
        set = Map("value" -> col("value") * 3),
        residual = col("event_type") === "view")
      val after = TxLog.manifestFiles(s, base, 2L).toSet
      require(before.subsetOf(after) && after.size > before.size,
        s"MOR update must carry every original file and append: " +
          s"${before.size} -> ${after.size}")
      TxLog.read(s, base)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("event_type")
    }),

    // Merge-on-read MERGE (Delta's DV merge path): matched target
    // rows are masked, the whole CDC batch appends — row-level result
    // identical to s24's COW merge (same oracle recompute), but ZERO
    // target files are rewritten: files leave the manifest only by
    // becoming fully masked (the require pins no rewrites). The shape
    // that keeps a continuous CDC feed against a 100 TB table from
    // amplifying every batch into band rewrites.
    "s43_mor_merge" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txmormrg_events"
      TxLog.drop(s, base)
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      TxLog.commit(ev.repartitionByRange(8, col("event_id")),
        base, None, Some("event_id"))
      val before = TxLog.manifestFiles(s, base, 1L).toSet
      val source = ev.where(col("event_id").between(cowLo, cowHi))
        .withColumn("value", col("value") * 2)
      TxLog.mergeMor(s, base, source, Seq("event_id"), "event_id")
      val v2 = TxLog.manifest(s, base, 2L)._1
      val after = v2.map(_.path).toSet
      require(before.intersect(after).nonEmpty,
        "MOR merge must carry out-of-band files by reference")
      // no-rewrite pin: the only NEW rows in v2 are the source batch
      // itself — a rewrite would have to fold surviving band rows into
      // fresh files, inflating the added-row total past the source's
      val addedRows = v2.filterNot(e => before.contains(e.path))
        .map(_.rows).sum
      require(addedRows == source.count(),
        s"MOR merge must append exactly the source batch " +
          s"($addedRows rows added)")
      TxLog.read(s, base)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("event_type")
    }),

    // Bloom-filter point-lookup index (Delta CREATE BLOOMFILTER INDEX
    // analog): the table is clustered on user_id, so a lookup by the
    // md5 surrogate key — random relative to the layout — overlaps
    // EVERY file's min/max band and stats cannot prune. One index
    // build (zero files rewritten) stores each file's k xxhash64 bit
    // positions in a sidecar; the probe reads at most k tiny position
    // rows per file and opens only files holding ALL k bits. The
    // requires pin a real skip per lookup. At 100 TB this is the
    // needle-in-haystack verb: k sidecar rows instead of 10^5 footers.
    // The oracle selects the same rows by the pre-image ids.
    "s41_bloom_point_lookup" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txbloom_events"
      TxLog.drop(s, base)
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"),
          md5(col("event_id").cast("string").cast("binary")).as("sk"))
      TxLog.commit(ev.repartitionByRange(8, col("user_id")),
        base, None, Some("user_id"))
      TxLog.buildBloomIndex(s, base, "sk", bitsPerRow = 24, k = 5)
      val ids = Seq(42L, 123L, 321L)
      ids.map { id =>
          val sk = ev.sparkSession.range(1)
            .select(md5(lit(id.toString).cast("binary"))).head().getString(0)
          val (kept, all) = TxLog.prunePoint(s, base, "sk", sk)
          require(kept.size < all.size,
            s"bloom must skip files for id $id: kept ${kept.size} of ${all.size}")
          TxLog.readPoint(s, base, "sk", sk)
        }
        .reduce(_.unionByName(_))
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
    }),

    // Declared partitioning on the log (Delta PARTITIONED BY analog):
    // a #partition meta line carried by every commit makes every
    // write split one-file-per-tuple with exact min==max stats, so an
    // equality predicate on the partition column prunes to the owning
    // files at the manifest — the layout for the classic
    // low-cardinality scan axis (event type, ingest day) at 100 TB.
    // The requires pin purity, the carried declaration, and that the
    // prune actually skipped files.
    "s60_partitioned_table" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txpart_events"
      TxLog.drop(s, base)
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      // CTAS declares the partitioning; the append proves every later
      // write keeps the split without restating it
      TxLog.commitPartitioned(ev.where(col("event_id") % 2 === 0), base,
        Seq("event_type"), Seq("event_id"))
      TxLog.append(ev.where(col("event_id") % 2 === 1), base)
      val es = TxLog.manifest(s, base, TxLog.latestVersion(s, base).get)._1
      require(es.forall(_.statsFor("event_type").forall(st =>
        st.min == st.max)), "partitioned write landed an impure file")
      val (kept, all) = TxLog.pruneRanges(s, base,
        Seq(("event_type", "purchase", "purchase")))
      require(kept.size < all.size,
        s"partition pruning must skip files: kept ${kept.size}/${all.size}")
      TxLog.readRange(s, base, "event_type", "purchase", "purchase")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("user_id")
    }),

    // GENERATED ALWAYS AS column as the PARTITION column (Delta
    // generated columns + the derived-partition pattern): the table
    // declares day = CAST(ts AS DATE); appends supply RAW events and
    // the engine derives the day, splits one-file-per-day, and
    // stats-indexes it — daily partition pruning with zero caller
    // cooperation, the canonical 100 TB fact-table layout. The
    // requires pin derivation, purity, and the one-day prune.
    "s64_generated_day_partition" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txgen_events"
      TxLog.drop(s, base)
      val ev = t(s, dir, "events")
        .select("event_id", "event_type", "value", "ts")
      TxLog.createTable(s, base,
        ev.schema.add("day", org.apache.spark.sql.types.DateType),
        partitionCols = Seq("day"),
        generated = Seq("day" -> "CAST(ts AS DATE)"))
      TxLog.append(ev, base) // no day column supplied — derived
      val es = TxLog.manifest(s, base, TxLog.latestVersion(s, base).get)._1
      require(es.size >= 25, s"one file per derived day: ${es.size}")
      require(es.forall(_.statsFor("day").forall(st => st.min == st.max)),
        "derived-day files must be partition-pure")
      val (kept, all) = TxLog.pruneRanges(s, base,
        Seq(("day", "2024-01-15", "2024-01-15")))
      require(kept.size == 1 && all.size == es.size,
        s"a one-day query must open one file: ${kept.size}/${all.size}")
      TxLog.read(s, base)
        .groupBy("day")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("day")
    }),

    // The composite lifecycle the round's features exist for: a fact
    // table partitioned on a GENERATED day column — raw appends
    // derive and split; one bad day is RESTATED with partition-scoped
    // INSERT OVERWRITE (old day file drops metadata-only, 29 other
    // days carried by reference, generated-consistency validated);
    // SHOW PARTITIONS reads the inventory without opening a file.
    // The classic daily-backfill correction at 100 TB: the commit
    // costs one day of data, never the table.
    "s66_day_restatement" -> ((s, dir) => {
      val wh = Ingest.fixtureDir(dir) + "/txday_warehouse"
      val base = wh + "/lake/fact"
      TxLog.drop(s, base)
      graft.sources.TxLogSqlDml.ensureInjected(s)
      val sqlS = s.newSession()
      sqlS.conf.set("spark.sql.catalog.gday", "graft.sources.TxLogCatalog")
      sqlS.conf.set("spark.sql.catalog.gday.warehouse", wh)
      sqlS.sql("CREATE NAMESPACE IF NOT EXISTS gday.lake")
      sqlS.sql("CREATE TABLE gday.lake.fact (event_id BIGINT, " +
        "event_type STRING, value DOUBLE, ts TIMESTAMP, " +
        "day DATE GENERATED ALWAYS AS (CAST(ts AS DATE))) " +
        "USING graft.sources.TxLogSource PARTITIONED BY (day)")
      val ev = t(sqlS, dir, "events")
        .select("event_id", "event_type", "value", "ts")
      TxLog.append(ev, base) // day derived + split, one file per day
      val before = TxLog.manifest(sqlS, base,
        TxLog.latestVersion(sqlS, base).get)._1
      ev.createOrReplaceTempView("ev_day_src")
      // restate 2024-01-15: the correction doubles its values
      sqlS.sql("INSERT OVERWRITE gday.lake.fact " +
        "PARTITION (day = DATE'2024-01-15') " +
        "SELECT event_id, event_type, value * 2 AS value, ts " +
        "FROM ev_day_src WHERE CAST(ts AS DATE) = DATE'2024-01-15'")
      val after = TxLog.manifest(sqlS, base,
        TxLog.latestVersion(sqlS, base).get)._1.map(_.path).toSet
      val untouched = before.filter(_.statsFor("day")
        .exists(_.min != "2024-01-15")).map(_.path)
      require(untouched.nonEmpty && untouched.forall(after.contains),
        "the 29 untouched days must carry by reference")
      require(before.filter(_.statsFor("day").exists(_.min == "2024-01-15"))
          .map(_.path).forall(!after.contains(_)),
        "the restated day's old file must drop metadata-only")
      require(sqlS.sql("SHOW PARTITIONS gday.lake.fact").count() == 30,
        "the inventory must list all 30 day tuples")
      sqlS.sql("SELECT day, count(*) AS n, " +
        "cast(sum(cast(value AS decimal(18,6))) AS double) AS sum_value " +
        "FROM gday.lake.fact GROUP BY day ORDER BY day")
    }),

    // Atomic CREATE OR REPLACE TABLE AS SELECT (StagingTableCatalog,
    // Delta's REPLACE): the dbt full-refresh shape — the staged CTAS
    // lands files inert and ONE manifest commit swaps the table;
    // readers see the old table until that instant, history below the
    // swap stays time-travelable, and the old definition's metadata
    // resets. The requires pin one-commit atomicity and the surviving
    // history.
    "s67_replace_table" -> ((s, dir) => {
      val wh = Ingest.fixtureDir(dir) + "/txreplace_warehouse"
      val base = wh + "/lake/ords"
      TxLog.drop(s, base)
      graft.sources.TxLogSqlDml.ensureInjected(s)
      val sqlS = s.newSession()
      sqlS.conf.set("spark.sql.catalog.grt", "graft.sources.TxLogCatalog")
      sqlS.conf.set("spark.sql.catalog.grt.warehouse", wh)
      sqlS.sql("CREATE NAMESPACE IF NOT EXISTS grt.lake")
      t(sqlS, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .createOrReplaceTempView("ords_src")
      sqlS.sql("CREATE OR REPLACE TABLE grt.lake.ords " +
        "USING graft.sources.TxLogSource " +
        "AS SELECT * FROM ords_src WHERE o_orderkey < 3000")
      val v1 = TxLog.latestVersion(sqlS, base).get
      // the full-refresh: new definition, doubled prices, wider range
      sqlS.sql("CREATE OR REPLACE TABLE grt.lake.ords " +
        "USING graft.sources.TxLogSource " +
        "AS SELECT o_orderkey, o_orderstatus, " +
        "o_totalprice * 2 AS o_totalprice FROM ords_src " +
        "WHERE o_orderkey < 6000")
      require(TxLog.latestVersion(sqlS, base).contains(v1 + 1),
        "the replace must land as ONE commit")
      require(TxLog.readVersion(sqlS, base, v1).count() ==
        t(sqlS, dir, "orders").where(col("o_orderkey") < 3000).count(),
        "history below the swap must stay time-travelable")
      sqlS.sql("SELECT o_orderstatus, count(*) AS n, " +
        "cast(sum(cast(o_totalprice AS decimal(18,6))) AS double) " +
        "AS sum_price FROM grt.lake.ords " +
        "GROUP BY o_orderstatus ORDER BY o_orderstatus")
    }),

    // SHOW PARTITIONS (Delta/Hive analog) as pure manifest metadata —
    // the partition inventory with file/live-row counts answers from
    // the driver's snapshot, zero data files opened, at ANY table
    // size. The require pins the per-tuple file count the partitioned
    // write produced.
    "s65_show_partitions" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txshowpart_events"
      TxLog.drop(s, base)
      val ev = t(s, dir, "events")
        .select("event_id", "event_type", "value")
      TxLog.commitPartitioned(ev, base, Seq("event_type"))
      graft.sources.TxLogSqlDml.ensureInjected(s)
      val sqlS = s.newSession()
      sqlS.sql("DROP TABLE IF EXISTS txshowpart_w")
      sqlS.sql("CREATE TABLE txshowpart_w " +
        s"USING graft.sources.TxLogSource OPTIONS (path '$base')")
      try {
        val out = sqlS.sql("SHOW PARTITIONS txshowpart_w")
        require(out.collect().forall(_.getLong(1) == 1L),
          "one commit must land exactly one file per tuple")
        out.select("partition", "num_rows").orderBy("partition")
      } finally sqlS.sql("DROP TABLE IF EXISTS txshowpart_w")
    }),

    // Manifest-stats file skipping (Delta data-skipping analog): a
    // narrow id-range scan resolves the manifest's per-file min/max
    // FIRST and opens only the overlapping band files — at 10^5 files
    // this is the planner-independent layer of pruning that works on
    // any store, before parquet row-group stats even load. The
    // require pins that files were actually skipped.
    "s25_manifest_skipping_scan" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txskip_events"
      TxLog.drop(s, base)
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      TxLog.commit(ev.repartitionByRange(8, col("event_id")),
        base, None, Some("event_id"))
      val (kept, all) = TxLog.pruneRange(s, base, "event_id", cowLo, cowHi)
      require(kept.size < all.size,
        s"manifest stats must skip files: kept ${kept.size} of ${all.size}")
      TxLog.readRange(s, base, "event_id", cowLo, cowHi)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("event_type")
    }),

    // Small-file compaction through the manifest log (Delta OPTIMIZE
    // analog): a big range-clustered seed plus three tiny streamed
    // batches (appendOnce, the small-file problem in miniature), then
    // compact bin-packs ONLY the tiny files — the seed's band files
    // are carried by reference, the txn high-water map survives
    // maintenance, and old versions stay readable until vacuum. The
    // oracle is the logical table contents, which compaction must not
    // change.
    "s26_log_compaction" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txcompact_events"
      TxLog.drop(s, base)
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      TxLog.commit(
        ev.where(col("event_id") >= 200)
          .repartitionByRange(4, col("event_id")),
        base, None, Some("event_id"))
      Seq((0L, 50L, 0L), (50L, 100L, 1L), (100L, 150L, 2L)).foreach {
        case (lo, hi, bid) =>
          TxLog.appendOnce(
            ev.where(col("event_id") >= lo && col("event_id") < hi)
              .coalesce(1),
            base, "ingest", bid, Some("event_id"))
      }
      val before = TxLog.manifestFiles(s, base, 4L).size
      val v = TxLog.compact(s, base, smallThresholdRows = 60,
        targetRows = 1000000, statsCol0 = Some("event_id"))
      val after = TxLog.manifestFiles(s, base, v).size
      require(after < before,
        s"compaction must shrink the file count: $before -> $after")
      TxLog.read(s, base)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("event_type")
    }),

    // Version change feed over the manifest log (Delta CDF's insert
    // case): files added per version ARE the rows each append
    // committed, tagged _commit_version — the surface an incremental
    // downstream consumer reads instead of re-scanning the table. The
    // oracle recomputes each batch's aggregate from the id slices.
    "s27_change_feed" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txcdf_events"
      TxLog.drop(s, base)
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      TxLog.commit(
        ev.where(col("event_id") >= 200)
          .repartitionByRange(4, col("event_id")),
        base, None, Some("event_id"))
      TxLog.append(ev.where(col("event_id") < 100), base, Some("event_id"))
      TxLog.append(ev.where(col("event_id").between(100, 199)),
        base, Some("event_id"))
      TxLog.changesBetween(s, base, 1L, 3L)
        .groupBy(col("_commit_version").cast("int").as("commit_version"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("commit_version")
    }),

    // DSv2 WRITE path of the log table: the seed lands via
    // df.write.mode("overwrite") and the increment via mode("append"),
    // both with inline per-file stats riding the executor commit
    // messages (no read-back scan); the require pins that the written
    // entries carry rows + stats so skipping stays sharp. The oracle
    // is the plain events aggregate.
    "s36_dsv2_write" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txdsv2w_events"
      TxLog.drop(s, base)
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      ev.where(col("event_id") < 500)
        .repartitionByRange(4, col("event_id"))
        .write.format("graft.sources.TxLogSource")
        .option("statsColumns", "event_id")
        .mode("overwrite").save(base)
      ev.where(col("event_id") >= 500)
        .write.format("graft.sources.TxLogSource")
        .option("statsColumns", "event_id")
        .mode("append").save(base)
      val entries = TxLog.manifest(s, base, 2L)._1
      require(entries.forall(e => e.rows > 0 &&
        e.statsFor("event_id").isDefined),
        s"DSv2-written entries must carry inline rows+stats: $entries")
      TxLog.read(s, base)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("event_type")
    }),

    // The native streaming SINK (DSv2 StreamingWrite — no foreachBatch
    // anywhere): the bronze log streams version-per-batch through the
    // source and lands in the silver log one VERSION PER EPOCH with
    // the (queryId → epoch) high-water carried in the manifest — the
    // replay-safe exactly-once contract, now entirely inside the
    // format. The oracle is the full events aggregate.
    "stream_txlog_sink" -> ((s, dir) => {
      val bronze = Ingest.fixtureDir(dir) + "/txsink_bronze"
      val silver = Ingest.fixtureDir(dir) + "/txsink_silver"
      TxLog.drop(s, bronze); TxLog.drop(s, silver)
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      TxLog.commit(
        ev.where(col("event_id") >= 500)
          .repartitionByRange(4, col("event_id")),
        bronze, None, Some("event_id"))
      TxLog.append(ev.where(col("event_id") < 500), bronze, Some("event_id"))
      val nonce = "graft_txsink_" + System.nanoTime()
      val q = s.readStream.format("graft.sources.TxLogSource")
        .option("maxVersionsPerTrigger", "1")
        .load(bronze)
        .writeStream.format("graft.sources.TxLogSource")
        .option("path", silver)
        .option("statsColumns", "event_id")
        .option("checkpointLocation", "/tmp/graft_stream_ckpt/" + nonce)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.streaming.StreamTune.dropScratch("/tmp/graft_stream_ckpt/" + nonce)
      require(TxLog.latestVersion(s, silver).contains(2L),
        "two bronze versions must land as exactly two silver epochs")
      TxLog.read(s, silver)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("event_type")
    }),

    // Metadata-only aggregates over the log (Delta's metadata-query
    // optimization, via DSv2 complete aggregate pushdown): an
    // un-filtered COUNT(*)/MIN/MAX over the log-backed table is
    // answered from manifest row counts and per-file stats — ZERO
    // data files opened at any table size (the require pins the
    // TxLogAggScan plan node). The oracle computes the same three
    // values the ordinary way.
    "s35_metadata_agg" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txmeta_events"
      TxLog.drop(s, base)
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      TxLog.commit(ev.repartitionByRange(8, col("event_id")),
        base, None, Some("event_id"))
      val df = s.read.format("graft.sources.TxLogSource").load(base)
        .agg(count(lit(1)).as("n_rows"),
          min(col("event_id")).as("min_id"),
          max(col("event_id")).as("max_id"))
      require(df.queryExecution.executedPlan.toString.contains("TxLogAggScan"),
        "the aggregate must be answered from manifest metadata " +
          "(TxLogAggScan), not a data scan")
      df
    }),

    // CDF update images (VERDICT r11 missing #2 — Delta
    // readChangeFeed's update_preimage/update_postimage contract): a
    // merge-on-read UPDATE version emits its newly-masked rows as
    // 'update_preimage' and its re-landed images as
    // 'update_postimage', so a consumer computing per-key diffs can
    // tell an update from delete+insert churn. The oracle recomputes
    // the three slices (seed insert, pre, post) from the raw table.
    "s69_cdf_update_images" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txcdfu_events"
      TxLog.drop(s, base)
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      TxLog.commit(
        ev.where(col("event_id") >= 100)
          .repartitionByRange(4, col("event_id")),
        base, None, Some("event_id"))
      TxLog.updateRangeMor(s, base, "event_id", 200L, 449L,
        Map("value" -> (col("value") * 2)),
        residual = col("event_type") === "click")
      TxLog.changesWithDeletes(s, base, 0L, 2L)
        .groupBy(col("_commit_version").cast("int").as("commit_version"),
          col("_change_type").as("change_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("commit_version", "change_type")
    }),

    // Change feed WITH delete markers (Delta CDF shape): band files
    // are landed one-per-slice so file boundaries are id-exact, then
    // one whole-band delete (pure delete markers, the emptied file
    // vanishes) and one partial-band delete (the rewritten file shows
    // as delete+insert pairs for its unchanged rows — the file is the
    // unit of change, the materialization caveat Delta documents for
    // CDF without stored vectors). The oracle recomputes each
    // (version, change_type) slice from the id bands.
    "s34_change_feed_deletes" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txcdfdel_events"
      TxLog.drop(s, base)
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      TxLog.commit(ev.where(col("event_id") < 250).coalesce(1),
        base, None, Some("event_id"))
      TxLog.append(ev.where(col("event_id").between(250, 499)).coalesce(1),
        base, Some("event_id"))
      TxLog.append(ev.where(col("event_id") >= 500).coalesce(1),
        base, Some("event_id"))
      TxLog.deleteRange(s, base, "event_id", 0L, 249L)   // v4: whole band
      TxLog.deleteRange(s, base, "event_id", 250L, 299L) // v5: partial band
      TxLog.changesWithDeletes(s, base, 3L, 5L)
        .groupBy(col("_commit_version").cast("int").as("commit_version"),
          col("_change_type").as("change_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("commit_version", "change_type")
    }),

    // RESTORE over the manifest log (Delta RESTORE VERSION AS OF):
    // version 3 is the "bad deploy" (a band delete); restore(2) rolls
    // back by republishing v2's entries as v4 — no file moves, the
    // bad version stays readable, and the readback equals the
    // pre-delete table. The oracle is the full events aggregate.
    "s37_restore_version" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txrestore_events"
      TxLog.drop(s, base)
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      TxLog.commit(ev.where(col("event_id") < 500)
          .repartitionByRange(4, col("event_id")),
        base, None, Some("event_id"))
      TxLog.append(ev.where(col("event_id") >= 500), base, Some("event_id"))
      TxLog.deleteRange(s, base, "event_id", cowLo, cowHi) // the bad deploy
      val v = TxLog.restore(s, base, 2L)
      require(v == 4L && TxLog.manifestFiles(s, base, 4L).toSet ==
        TxLog.manifestFiles(s, base, 2L).toSet,
        "restore must republish v2's files verbatim as v4")
      TxLog.read(s, base)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("event_type")
    }),

    // Shallow clone (Delta SHALLOW CLONE): the clone's v1 manifest
    // references the source's files by absolute path — zero data
    // copied, stats carried so skipping works immediately — and a COW
    // update then diverges the clone locally while the source stays
    // byte-identical (the require pins both). The oracle recomputes
    // the clone's state with a CASE.
    "s38_shallow_clone" -> ((s, dir) => {
      val src = Ingest.fixtureDir(dir) + "/txclone_src"
      val dst = Ingest.fixtureDir(dir) + "/txclone_dst"
      TxLog.drop(s, src); TxLog.drop(s, dst)
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      TxLog.commit(ev.repartitionByRange(8, col("event_id")),
        base = src, expected = None, statsCol = Some("event_id"))
      TxLog.cloneShallow(s, src, dst)
      TxLog.updateRange(s, dst, "event_id", cowLo, cowHi,
        set = Map("value" -> col("value") * 5),
        residual = col("event_type") === "signup")
      val srcRows = TxLog.read(s, src).count()
      val cloneV2 = TxLog.manifest(s, dst, 2L)._1
      require(cloneV2.exists(e => e.path.startsWith("/")) &&
        cloneV2.exists(e => !e.path.startsWith("/")),
        "diverged clone must mix source references and local files")
      require(srcRows == TxLog.read(s, dst).count(),
        "the COW update must not change row counts on either side")
      TxLog.read(s, dst)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("event_type")
    }),

    // Version history over the manifest log (Delta DESCRIBE HISTORY):
    // per-version row counts ride the manifests, so the full history
    // answer costs zero data I/O — the oracle recomputes each
    // version's cumulative count from the id slices the commits used.
    "s33_log_history" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txhistory_events"
      TxLog.drop(s, base)
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      TxLog.commit(
        ev.where(col("event_id") >= 200)
          .repartitionByRange(4, col("event_id")),
        base, None, Some("event_id"))
      TxLog.append(ev.where(col("event_id") < 100), base, Some("event_id"))
      TxLog.append(ev.where(col("event_id").between(100, 199)),
        base, Some("event_id"))
      TxLog.history(s, base)
        .select(col("version").cast("int").as("version"),
          col("n_rows"))
        .orderBy("version")
    }),

    // Atomic range replacement through the manifest log (Delta
    // replaceWhere — the daily-reload verb): one published version
    // drops every row in the id band and installs the recomputed
    // batch (here: only the band's click events, values ×10) in its
    // place; out-of-band files ride by reference, and a replacement
    // row outside the declared range is rejected up front. Distinct
    // from UPDATE: non-click band rows are GONE, not carried. The
    // oracle recomputes survivors + replacements with NOT/CASE.
    "s32_replace_range" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txreplace_events"
      TxLog.drop(s, base)
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      TxLog.commit(ev.repartitionByRange(8, col("event_id")),
        base, None, Some("event_id"))
      val before = TxLog.manifestFiles(s, base, 1L).toSet
      val reload = ev.where(col("event_id").between(cowLo, cowHi) &&
          col("event_type") === "click")
        .withColumn("value", col("value") * 10)
      TxLog.replaceRange(s, base, "event_id", cowLo, cowHi, reload)
      val after = TxLog.manifestFiles(s, base, 2L).toSet
      val carried = before.intersect(after).size
      require(carried >= 1 && carried < before.size,
        s"band replace must carry some files and rewrite some: " +
          s"$carried of ${before.size}")
      TxLog.read(s, base)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("event_type")
    }),

    // Schema evolution across manifest versions (Delta mergeSchema on
    // both sides of the log): version 1 lands the original schema,
    // version 2 appends rows carrying a NEW column, and readEvolved
    // unions the file schemas — pre-evolution rows surface NULL in the
    // new column, exactly the reference's mergeSchema=true load
    // (load_bronze_to_table.py:158). The aggregate pins both halves:
    // the old rows' NULL count and the new column's sum.
    "s30_schema_evolution" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txevolve_events"
      TxLog.drop(s, base)
      val ev = t(s, dir, "events").select("event_id", "user_id", "value")
      TxLog.commit(ev.where(col("event_id") < 500)
          .repartitionByRange(2, col("event_id")),
        base, None, Some("event_id"))
      TxLog.append(
        ev.where(col("event_id") >= 500)
          .withColumn("value_x2", col("value") * 2),
        base, Some("event_id"))
      TxLog.readEvolved(s, base)
        .agg(count(lit(1)).as("n_rows"),
          count(col("value_x2")).as("n_evolved"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"),
          sum(col("value_x2").cast("decimal(18,6)")).cast("double")
            .as("sum_value_x2"))
    }),

    // Streaming FROM the manifest log (the Delta streaming-source
    // analog, via the custom DSv2 TxLogSource): each committed version
    // is one micro-batch (offset = version, checkpoint-resumable), a
    // batch's rows are the files that version ADDED (manifest diff —
    // never a table rescan), and changeFeed tags rows with their
    // commit version. The seed + two appends drain under AvailableNow
    // in version-sized batches into a parquet sink; the oracle
    // recomputes each version's aggregate from its id slice.
    // Bounded initial-snapshot backfill (Delta maxFilesPerTrigger with
    // (reservoirVersion, index) offsets): at 100 TB "version 1" IS the
    // table, so a stream starting from scratch must chunk the snapshot
    // across micro-batches — the offsets carry an intra-version file
    // index. The require pins that the drain actually took multiple
    // bounded batches; the oracle checks no row was lost or doubled.
    "stream_txlog_backfill" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txbackfill_events"
      TxLog.drop(s, base)
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      TxLog.commit(ev.repartitionByRange(8, col("event_id")), base, None,
        Some("event_id"))
      val outDir = Ingest.fixtureDir(dir) + "/txbackfill_out"
      TxLog.drop(s, outDir)
      val nonce = "graft_txlog_backfill_" + System.nanoTime()
      val ckpt = "/tmp/graft_stream_ckpt/" + nonce
      val q = s.readStream.format("graft.sources.TxLogSource")
        .option("maxFilesPerTrigger", "3")
        .load(base)
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val batches = new java.io.File(s"$ckpt/offsets").listFiles()
        .count(!_.getName.startsWith("."))
      require(batches == 3,
        s"8 files at 3/trigger must drain in 3 bounded batches, got $batches")
      graft.streaming.StreamTune.dropScratch(ckpt)
      s.read.parquet(outDir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("event_id")).as("n_ids"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("event_type")
    }),

    "stream_txlog_source" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txstream_events"
      TxLog.drop(s, base)
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      TxLog.commit(
        ev.where(col("event_id") >= 200)
          .repartitionByRange(4, col("event_id")),
        base, None, Some("event_id"))
      TxLog.append(ev.where(col("event_id") < 100), base, Some("event_id"))
      TxLog.append(ev.where(col("event_id").between(100, 199)),
        base, Some("event_id"))
      // fixed output dir, dropped up front (repeated invocations must
      // not accumulate fixture copies under /tmp); the CHECKPOINT is
      // nonce-fresh so each invocation re-streams from version 0
      val outDir = Ingest.fixtureDir(dir) + "/txstream_out"
      TxLog.drop(s, outDir)
      val nonce = "graft_txlog_stream_" + System.nanoTime()
      val ckpt = "/tmp/graft_stream_ckpt/" + nonce
      val q = s.readStream.format("graft.sources.TxLogSource")
        .option("changeFeed", "true")
        .option("maxVersionsPerTrigger", "1")
        .load(base)
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.streaming.StreamTune.dropScratch(ckpt)
      s.read.parquet(outDir)
        .groupBy(col("_commit_version").cast("int").as("commit_version"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("commit_version")
    }),

    // Row-precise CDF streaming (Delta readChangeFeed with deletion
    // vectors): the stream tags every row _commit_version AND
    // _change_type, and a MOR delete — invisible to the plain insert
    // feed, which diffs file sets — ships exactly its masked rows as
    // 'delete' markers to the downstream consumer. The fixture is
    // commit → MOR-delete(band clicks) → append; the readback
    // aggregates the feed per (version, change_type). The oracle
    // recomputes all four slices from events.
    "stream_txlog_cdf" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/txcdf_events"
      TxLog.drop(s, base)
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      TxLog.commit(
        ev.where(col("event_id") >= 200)
          .repartitionByRange(4, col("event_id")),
        base, None, Some("event_id"))
      TxLog.deleteRangeMor(s, base, "event_id", morLo, morHi,
        residual = col("event_type") === "click")
      TxLog.append(ev.where(col("event_id") < 100), base, Some("event_id"))
      val outDir = Ingest.fixtureDir(dir) + "/txcdf_out"
      TxLog.drop(s, outDir)
      val nonce = "graft_txlog_cdf_" + System.nanoTime()
      val ckpt = "/tmp/graft_stream_ckpt/" + nonce
      val q = s.readStream.format("graft.sources.TxLogSource")
        .option("changeFeedTypes", "true")
        .option("maxVersionsPerTrigger", "1")
        .load(base)
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.streaming.StreamTune.dropScratch(ckpt)
      s.read.parquet(outDir)
        .groupBy(col("_commit_version").cast("int").as("commit_version"),
          col("_change_type").as("change_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("commit_version", "change_type")
    }),

    // The full medallion hop as a log-to-log stream (the reference's
    // Delta→Delta bronze→silver cadence): TxLogSource consumes the
    // bronze log version-per-batch, the transform drops error events,
    // and appendOnce lands the silver log exactly-once per micro-batch
    // — including across a restart with new bronze commits in between
    // (the helper pins 3 bronze versions → exactly 3 silver versions
    // and the checkpoint-global batch high-water). The oracle is the
    // cleaned events aggregate.
    "stream_txlog_medallion" -> ((s, dir) =>
      graft.streaming.StreamingOps.logToLogPipeline(s, dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("event_type")),

    // CDC replication end-to-end (the DLT APPLY CHANGES INTO loop): a
    // replica log consumes the source's row-precise typed change feed
    // and applies every micro-batch with TxLog.applyChanges — deletes
    // MASK matched keys (merge-on-read), inserts append, and the
    // batch high-water rides the same commit, exactly-once on both
    // halves across a restart with new source commits in between. The
    // helper requires replica ≡ source bit-for-bit, 4 versions, and
    // the checkpoint-global high-water. Oracle: the source's final
    // state recomputed from events.
    "stream_txlog_replica" -> ((s, dir) =>
      graft.streaming.StreamingOps.cdcReplicaPipeline(s, dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("event_type")),

    // Dynamic partition pruning: the fact table is partitioned by day;
    // the dim-side filter (5 peak days of 30) becomes a RUNTIME
    // partition filter on the fact scan — at 100 TB the scan opens 5
    // partitions, not 30, without the query author naming them.
    // VersionedSpec asserts the dynamicpruning expression in the plan.
    "j14_dpp_star_join" -> ((s, dir) => {
      val base = Ingest.fixtureDir(dir) + "/dpp_events"
      t(s, dir, "events")
        .withColumn("day", to_date(col("ts")))
        .select("event_id", "user_id", "event_type", "value", "day")
        .write.mode("overwrite").partitionBy("day").parquet(base)
      val dim = s.range(0, 30)
        .select(date_add(lit("2024-01-01").cast("date"),
          col("id").cast("int")).as("day"))
        .withColumn("is_peak",
          col("day").cast("string").isin(peakDays: _*))
      s.read.parquet(base)
        .join(dim.where(col("is_peak")).select("day"), Seq("day"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("event_type")
    }),

    // Cost-based broadcast: the dim (customer) is durably catalogued
    // and ANALYZEd with column stats; under CBO the 1%-selective
    // filter's estimated output shrinks below the (lowered) broadcast
    // threshold, so Catalyst picks a broadcast join from STATISTICS —
    // no hint anywhere. VersionedSpec asserts broadcast-with-stats vs
    // shuffle-without-CBO under the identical threshold.
    "j15_cbo_stats_join" -> ((s, dir) => {
      ensureAnalyzedDim(s, dir)
      // 4 KB threshold: far below the column-pruned SCAN estimate
      // (~10 KB here), but above the CBO post-filter estimate
      // (~63 rows) — so the broadcast decision can only come from
      // column statistics, never from file size.
      val df = planned(s, Seq(
        "spark.sql.cbo.enabled" -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> "4096")) {
        s.table("stats_demo.customer_dim")
          .where(col("c_acctbal") < -500)
          .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast("decimal(18,6)")).cast("double")
              .as("total_price"))
          .orderBy("c_mktsegment")
      }
      df
    }),

    // Deterministic stratified downsampling: cap the dominant stratum
    // (en → 10%) while keeping the rest at 50% — corpus rebalancing
    // before LLM training. Membership is the shared md5 bucket, so the
    // sample is growth-stable (new docs never flip old ones), rerun-
    // identical with no seed plumbing, and engine-reproducible — none
    // of which holds for rand()-based sample()/sampleBy().
    "p11_stratified_sample" -> ((s, dir) =>
      t(s, dir, "documents")
        .where(TextAnalysis.stableBucket(col("doc_id")) <
          when(col("lang") === "en", 100).otherwise(500))
        .select("doc_id", "lang")
        .orderBy("doc_id")))

  /** CDC id band shared by the COW-merge/skipping queries and their
    * oracles — non-empty at every SF (event_id is 0..N-1, N ≥ 1000). */
  private val (cowLo, cowHi) = (100L, 299L)
  /** Second MOR-delete band, overlapping [cowLo, cowHi] so the mask
    * merge (old positions stay dead) is exercised by s39/s40. */
  private val (morLo, morHi) = (200L, 449L)

  /** Shared s39/s40 fixture (the two witnesses and their oracles must
    * stay in lockstep on bands + residuals): clustered commit, then
    * the two overlapping masked deletes. Returns v1's file set. */
  private def morFixture(s: SparkSession, dir: String,
                         base: String): Set[String] = {
    TxLog.drop(s, base)
    val ev = t(s, dir, "events")
      .select("event_id", "user_id", "event_type", "value")
    TxLog.commit(ev.repartitionByRange(8, col("event_id")),
      base, None, Some("event_id"))
    val before = TxLog.manifestFiles(s, base, 1L).toSet
    TxLog.deleteRangeMor(s, base, "event_id", cowLo, cowHi,
      residual = col("event_type") === "click")
    TxLog.deleteRangeMor(s, base, "event_id", morLo, morHi,
      residual = col("event_type") === "view")
    before
  }

  /** The DPP dim filter — shared between query and oracle. */
  private val peakDays = Seq(
    "2024-01-03", "2024-01-07", "2024-01-12", "2024-01-18", "2024-01-25")

  /** Durable ANALYZEd dim for the CBO witness: catalogued customer
    * table with column statistics. Recreated per invocation so stats
    * always match the current scale factor's data. */
  private def ensureAnalyzedDim(s: SparkSession, dir: String): Unit = {
    s.sql("CREATE DATABASE IF NOT EXISTS stats_demo")
    // External table + drop-first, same as Medallion.write: a catalog
    // entry (or leftover managed location) from another session/SF
    // must never pin stale data or block the save.
    s.sql("DROP TABLE IF EXISTS stats_demo.customer_dim")
    t(s, dir, "customer")
      .write.mode("overwrite").format("parquet")
      .option("path", Ingest.fixtureDir(dir) + "/stats_customer_dim")
      .saveAsTable("stats_demo.customer_dim")
    s.sql("ANALYZE TABLE stats_demo.customer_dim " +
      "COMPUTE STATISTICS FOR ALL COLUMNS")
  }

  /** Run `build` under temporary planning confs and force the plan
    * while they hold (plans are otherwise lazy); restore afterwards so
    * no other registry query plans under fixture-tuned settings. The
    * pinned QueryExecution keeps the armed plan for DIRECT consumers
    * (the plan-shape specs, `df.collect()`); a derived Dataset (e.g.
    * Verify's `.coalesce(1).write`) re-plans under the restored confs
    * — results are identical either way, only the plan shape differs,
    * which is why the evidence assertions read the pinned plan. */
  private def planned(s: SparkSession, confs: Seq[(String, String)])
                     (build: => DataFrame): DataFrame = {
    val prev = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val df = build
      df.queryExecution.executedPlan // pin the conf-armed plan
      df
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  /** Bloom-filter planning confs: auto-broadcast is disabled during
    * planning because Spark only injects the bloom filter into
    * SHUFFLE joins — the honest 100 TB framing: when the dim side
    * outgrows broadcast, the bloom probe is what still prunes the
    * fact scan. AQE is free to re-convert to broadcast at runtime
    * under the restored confs; the injected might_contain probe
    * survives. */
  private def bloomPlanned(s: SparkSession)(build: => DataFrame): DataFrame =
    planned(s, Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"))(build)

  val oracles: Map[String, String] = Map(
    "s15_zorder_layout" ->
      s"""SELECT l_returnflag, count(*) AS n,
                cast(sum(cast(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
         FROM lineitem
         WHERE l_orderkey BETWEEN $okLo AND $okHi
           AND l_partkey BETWEEN $pkLo AND $pkHi
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "s14_targeted_delete" ->
      """SELECT cast(user_id % 8 AS INTEGER) AS u_bucket,
                count(*) AS n_events,
                count(DISTINCT user_id) AS n_users
         FROM events WHERE user_id NOT IN (7, 23, 98)
         GROUP BY 1 ORDER BY u_bucket""",
    "j13_bloom_pruned_join" ->
      """SELECT p_brand, count(*) AS n,
                cast(sum(cast(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_size = 1
         GROUP BY p_brand ORDER BY p_brand""",
    "s16_versioned_snapshot" ->
      """SELECT cast(1 AS INTEGER) AS version, count(*) AS n_rows,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events WHERE cast(ts AS DATE) < DATE '2024-01-11'
         UNION ALL
         SELECT cast(2 AS INTEGER), count(*),
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE)
         FROM events WHERE cast(ts AS DATE) < DATE '2024-01-21'
         ORDER BY version""",
    "s23_acid_commit_log" ->
      """SELECT cast(1 AS INTEGER) AS version, count(*) AS n_rows,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events WHERE cast(ts AS DATE) < DATE '2024-01-11'
         UNION ALL
         SELECT cast(2 AS INTEGER), count(*),
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE)
         FROM events WHERE cast(ts AS DATE) < DATE '2024-01-21'
         ORDER BY version""",
    "s17_vacuum_retention" ->
      """SELECT cast(3 AS INTEGER) AS version, count(*) AS n_rows,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events WHERE cast(ts AS DATE) < DATE '2024-01-31'""",
    "s26_log_compaction" ->
      """SELECT event_type, count(*) AS n,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events
         WHERE event_id < 150 OR event_id >= 200
         GROUP BY event_type ORDER BY event_type""",
    "s27_change_feed" ->
      """SELECT cast(2 AS INTEGER) AS commit_version, count(*) AS n,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events WHERE event_id < 100
         UNION ALL
         SELECT cast(3 AS INTEGER), count(*),
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE)
         FROM events WHERE event_id BETWEEN 100 AND 199
         ORDER BY commit_version""",
    "s24_cow_merge_log" ->
      s"""SELECT event_type, count(*) AS n,
                cast(sum(cast(
                  CASE WHEN event_id BETWEEN $cowLo AND $cowHi
                       THEN value * 2 ELSE value END
                  AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events
         GROUP BY event_type ORDER BY event_type""",
    "s37_restore_version" ->
      """SELECT event_type, count(*) AS n,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events GROUP BY event_type ORDER BY event_type""",
    "s47_timestamp_as_of" ->
      """SELECT cast(1 AS INTEGER) AS as_of, count(*) AS n_rows,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events WHERE cast(ts AS DATE) < DATE '2024-01-11'
         UNION ALL
         SELECT cast(2 AS INTEGER), count(*),
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE)
         FROM events
         ORDER BY as_of""",
    "s48_sql_delete" ->
      s"""SELECT event_type, count(*) AS n,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events
         WHERE NOT (event_id BETWEEN $cowLo AND $cowHi
                    AND event_type = 'click')
         GROUP BY event_type ORDER BY event_type""",
    "s49_zorder_compact" ->
      s"""SELECT l_returnflag, count(*) AS n,
                cast(sum(cast(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
         FROM lineitem
         WHERE l_orderkey BETWEEN $okLo AND $okHi
           AND l_partkey BETWEEN $pkLo AND $pkHi
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "s50_bloom_append" ->
      """SELECT p_partkey, p_brand, p_size FROM part
         WHERE p_partkey = 50 ORDER BY p_partkey""",
    "s51_sql_update" ->
      """SELECT o_orderstatus, count(*) AS n,
                cast(sum(cast(
                  CASE WHEN o_orderkey BETWEEN 100 AND 299
                       THEN o_totalprice * 2 ELSE o_totalprice END
                  AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "s52_sql_merge" ->
      """SELECT o_orderstatus, count(*) AS n,
                cast(sum(cast(
                  CASE WHEN o_orderkey < 1000
                       THEN o_totalprice * 2 ELSE o_totalprice END
                  AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "s62_merge_sync_delete" ->
      """SELECT o_orderstatus, count(*) AS n,
                cast(sum(cast(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                  AS sum_price
         FROM orders WHERE o_orderkey BETWEEN 450 AND 1350
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "s68_merge_conditional" ->
      """WITH t AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                    FROM orders WHERE o_orderkey < 900),
              s AS (SELECT o_orderkey, o_orderstatus, o_totalprice,
                           (o_orderkey % 10 = 0) AS deleted
                    FROM orders WHERE o_orderkey BETWEEN 450 AND 1350),
              merged AS (
                SELECT t.o_orderkey, t.o_orderstatus,
                       CASE WHEN t.o_totalprice < 100000
                            THEN s.o_totalprice + t.o_totalprice
                            ELSE t.o_totalprice END AS o_totalprice
                FROM t JOIN s ON t.o_orderkey = s.o_orderkey
                WHERE NOT s.deleted
                UNION ALL
                SELECT t.o_orderkey, 'Z' AS o_orderstatus, t.o_totalprice
                FROM t WHERE t.o_orderkey NOT IN
                  (SELECT o_orderkey FROM s) AND t.o_orderkey >= 100
                UNION ALL
                SELECT s.o_orderkey, s.o_orderstatus, s.o_totalprice
                FROM s WHERE s.o_orderkey NOT IN
                  (SELECT o_orderkey FROM t) AND NOT s.deleted)
         SELECT o_orderstatus, count(*) AS n,
                cast(sum(cast(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                  AS sum_price
         FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "s71_merge_evolve" ->
      """WITH t AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                    FROM orders WHERE o_orderkey < 900),
              s AS (SELECT o_orderkey, o_orderstatus, o_totalprice,
                           CASE CAST(o_orderkey % 3 AS INTEGER)
                                WHEN 0 THEN 'web' WHEN 1 THEN 'app'
                                ELSE 'ops' END AS o_channel
                    FROM orders WHERE o_orderkey BETWEEN 450 AND 1350),
              merged AS (
                SELECT o_orderkey, o_orderstatus, o_totalprice, o_channel
                FROM s
                UNION ALL
                SELECT o_orderkey, o_orderstatus, o_totalprice,
                       NULL AS o_channel
                FROM t WHERE o_orderkey NOT IN
                  (SELECT o_orderkey FROM s))
         SELECT coalesce(o_channel, 'none') AS channel, count(*) AS n,
                cast(sum(cast(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                  AS sum_price
         FROM merged GROUP BY 1 ORDER BY 1""",
    "stream_txlog_lineage" ->
      """WITH t AS (SELECT cast(o_orderkey AS BIGINT) AS k,
                           cast(o_orderkey % 50 AS INTEGER) +
                             CASE WHEN o_orderkey BETWEEN 200 AND 400
                                  THEN 1000 ELSE 0 END AS v
                    FROM orders WHERE o_orderkey < 1800)
         SELECT v, count(*) AS n, cast(sum(k) AS BIGINT) AS sum_k
         FROM t GROUP BY 1 ORDER BY 1""",
    "s82_vacuum_lite" ->
      """WITH t AS (SELECT cast(o_orderkey AS BIGINT) AS k,
                           cast(o_totalprice AS DOUBLE) AS price
                    FROM orders WHERE o_orderkey < 2400)
         SELECT cast(k % 13 AS INTEGER) AS grp, count(*) AS n,
                cast(sum(cast(price AS DECIMAL(18,6))) AS DOUBLE)
                  AS sum_price
         FROM t GROUP BY 1 ORDER BY 1""",
    "s81_copy_into" ->
      """WITH t AS (SELECT cast(o_orderkey AS BIGINT) AS k,
                           cast(o_totalprice AS DOUBLE) AS price
                    FROM orders WHERE o_orderkey < 2600)
         SELECT cast(k % 11 AS INTEGER) AS grp, count(*) AS n,
                cast(sum(cast(price AS DECIMAL(18,6))) AS DOUBLE)
                  AS sum_price
         FROM t GROUP BY 1 ORDER BY 1""",
    "s80_table_changes" ->
      """WITH t AS (SELECT cast(o_orderkey AS BIGINT) AS k FROM orders),
         ch AS (
           SELECT 'insert' AS _change_type, k FROM t
           WHERE k >= 1000 AND k < 1600
           UNION ALL
           SELECT 'delete' AS _change_type, k FROM t
           WHERE k < 1000 AND k BETWEEN 200 AND 400)
         SELECT _change_type, count(*) AS n, cast(sum(k) AS BIGINT) AS sum_k
         FROM ch GROUP BY 1 ORDER BY 1""",
    "s79_drop_feature" ->
      """WITH t AS (SELECT cast(o_orderkey AS BIGINT) AS k,
                           cast(o_totalprice AS DOUBLE) AS price
                    FROM orders WHERE o_orderkey < 3000)
         SELECT cast(k % 9 AS INTEGER) AS grp, count(*) AS n,
                cast(sum(cast(price AS DECIMAL(18,6))) AS DOUBLE)
                  AS sum_price
         FROM t GROUP BY 1 ORDER BY 1""",
    "s78_column_defaults" ->
      """WITH t AS (SELECT cast(o_orderkey AS BIGINT) AS k,
                           cast(o_totalprice AS DOUBLE) AS price,
                           CASE WHEN o_orderkey < 1200 THEN 'none'
                                WHEN o_orderkey < 2400 THEN 'std'
                                ELSE 'vip' END AS tier
                    FROM orders WHERE o_orderkey < 3000)
         SELECT tier, count(*) AS n,
                cast(sum(cast(price AS DECIMAL(18,6))) AS DOUBLE)
                  AS sum_price
         FROM t GROUP BY 1 ORDER BY 1""",
    "s77_deep_clone" ->
      """WITH t AS (SELECT cast(o_orderkey AS BIGINT) AS k,
                           cast(o_totalprice AS DOUBLE) AS price
                    FROM orders WHERE o_orderkey < 1600)
         SELECT cast(k % 7 AS INTEGER) AS grp, count(*) AS n,
                cast(sum(cast(price AS DECIMAL(18,6))) AS DOUBLE)
                  AS sum_price
         FROM t WHERE k NOT BETWEEN 300 AND 700
         GROUP BY 1 ORDER BY 1""",
    "s76_ict_time_travel" ->
      """SELECT cast(o_orderkey % 10 AS INTEGER) AS grp, count(*) AS n,
                cast(sum(cast(cast(o_totalprice AS DOUBLE)
                  AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
         FROM orders WHERE o_orderkey < 1000
         GROUP BY 1 ORDER BY 1""",
    "s75_rowid_scan" ->
      """WITH t AS (SELECT cast(o_orderkey AS INTEGER) AS k,
                           cast(o_orderkey % 100 AS INTEGER) AS v
                    FROM orders WHERE o_orderkey < 2400)
         SELECT v, count(*) AS n, cast(sum(k) AS BIGINT) AS sum_k
         FROM t WHERE k NOT BETWEEN 500 AND 800
         GROUP BY 1 ORDER BY 1""",
    "s74_row_tracking" ->
      """SELECT cast(o_orderkey AS INTEGER) AS k,
                cast(o_orderkey * 3 AS INTEGER) AS v_pre,
                cast(o_orderkey * 3 + 7 AS INTEGER) AS v_post
         FROM orders WHERE o_orderkey BETWEEN 400 AND 500
         ORDER BY k""",
    "s73_cluster_incremental" ->
      """SELECT cast(l_orderkey % 7 AS INTEGER) AS grp, count(*) AS n,
                cast(sum(cast(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                  AS sum_qty
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "s72_widen_matrix" ->
      """WITH src AS (SELECT cast(o_orderkey AS INTEGER) AS o_orderkey,
                             cast(o_orderkey % 97 AS INTEGER) AS o_disc,
                             cast(o_orderdate AS DATE) AS o_day
                      FROM orders),
              merged AS (
                SELECT o_orderkey,
                       cast(o_disc AS DECIMAL(12,2)) AS o_disc,
                       cast(o_day AS TIMESTAMP) AS o_day
                FROM src WHERE o_orderkey < 1000
                UNION ALL
                SELECT o_orderkey,
                       cast(o_disc + 0.25 AS DECIMAL(12,2)) AS o_disc,
                       cast(o_day AS TIMESTAMP) AS o_day
                FROM src WHERE o_orderkey BETWEEN 1000 AND 2000)
         SELECT cast(o_orderkey % 5 AS INTEGER) AS grp, count(*) AS n,
                cast(sum(o_disc) AS DOUBLE) AS sum_disc,
                max(o_day) AS max_day
         FROM merged GROUP BY 1 ORDER BY 1""",
    "s70_alter_widen" ->
      """SELECT cast(o_orderkey % 7 AS INTEGER) AS grp, count(*) AS n,
                cast(sum(o_orderkey) AS BIGINT) AS sum_key
         FROM orders WHERE o_orderkey <= 2000
         GROUP BY 1 ORDER BY 1""",
    "s53_sql_optimize" ->
      """SELECT l_returnflag, count(*) AS n,
                cast(sum(cast(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "s55_sql_restore_detail" ->
      """SELECT event_type, count(*) AS n,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events GROUP BY event_type ORDER BY event_type""",
    "s63_partition_overwrite" ->
      """SELECT event_type, count(*) AS n,
                cast(sum(cast(
                  CASE WHEN event_type = 'purchase' THEN value * 2
                       ELSE value END AS DECIMAL(18,6))) AS DOUBLE)
                  AS sum_value
         FROM events
         GROUP BY event_type ORDER BY event_type""",
    "s56_catalog_sql_lifecycle" ->
      """SELECT event_type, count(*) AS n,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events GROUP BY event_type ORDER BY event_type""",
    "s58_convert_in_place" ->
      """SELECT event_type, count(*) AS n,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events GROUP BY event_type ORDER BY event_type""",
    "s59_column_mapping" ->
      """SELECT event_id % 7 AS bucket, count(*) AS n,
                cast(0 AS BIGINT) AS n_type,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_amount
         FROM events
         WHERE NOT (event_id BETWEEN 100 AND 199)
         GROUP BY 1 ORDER BY 1""",
    "s57_alter_add_column" ->
      """SELECT event_type, count(*) AS n, count(note) AS n_noted,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM (
           SELECT event_type, CAST(NULL AS VARCHAR) AS note, value
           FROM events WHERE event_id < 600
           UNION ALL
           SELECT event_type, 'n-' || event_type AS note, value
           FROM events WHERE event_id >= 600)
         GROUP BY event_type ORDER BY event_type""",
    "s54_dbt_merge_lifecycle" ->
      """SELECT user_id, event_id, event_type, value FROM (
           SELECT *, row_number() OVER (PARTITION BY user_id
             ORDER BY ts DESC, event_id DESC) AS rn
           FROM events WHERE ts < TIMESTAMP '2024-01-20')
         WHERE rn = 1 ORDER BY user_id""",
    "s38_shallow_clone" ->
      s"""SELECT event_type, count(*) AS n,
                cast(sum(cast(
                  CASE WHEN event_id BETWEEN $cowLo AND $cowHi
                            AND event_type = 'signup'
                       THEN value * 5 ELSE value END
                  AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events
         GROUP BY event_type ORDER BY event_type""",
    "s36_dsv2_write" ->
      """SELECT event_type, count(*) AS n,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events GROUP BY event_type ORDER BY event_type""",
    "stream_txlog_sink" ->
      """SELECT event_type, count(*) AS n,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events GROUP BY event_type ORDER BY event_type""",
    "s35_metadata_agg" ->
      """SELECT count(*) AS n_rows, min(event_id) AS min_id,
                max(event_id) AS max_id
         FROM events""",
    "s34_change_feed_deletes" ->
      """SELECT cast(4 AS INTEGER) AS commit_version,
                'delete' AS change_type, count(*) AS n,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events WHERE event_id < 250
         UNION ALL
         SELECT cast(5 AS INTEGER), 'delete', count(*),
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE)
         FROM events WHERE event_id BETWEEN 250 AND 499
         UNION ALL
         SELECT cast(5 AS INTEGER), 'insert', count(*),
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE)
         FROM events WHERE event_id BETWEEN 300 AND 499
         ORDER BY commit_version, change_type""",
    "s33_log_history" ->
      """SELECT cast(1 AS INTEGER) AS version, count(*) AS n_rows
         FROM events WHERE event_id >= 200
         UNION ALL
         SELECT cast(2 AS INTEGER),
                count(*) FILTER (WHERE event_id >= 200 OR event_id < 100)
         FROM events
         UNION ALL
         SELECT cast(3 AS INTEGER), count(*) FROM events
         ORDER BY version""",
    "s32_replace_range" ->
      s"""SELECT event_type, count(*) AS n,
                cast(sum(cast(
                  CASE WHEN event_id BETWEEN $cowLo AND $cowHi
                       THEN value * 10 ELSE value END
                  AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events
         WHERE event_id NOT BETWEEN $cowLo AND $cowHi
            OR event_type = 'click'
         GROUP BY event_type ORDER BY event_type""",
    "s30_schema_evolution" ->
      """SELECT count(*) AS n_rows,
                count(*) FILTER (WHERE event_id >= 500) AS n_evolved,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
                cast(sum(cast(value * 2 AS DECIMAL(18,6)))
                       FILTER (WHERE event_id >= 500) AS DOUBLE)
                  AS sum_value_x2
         FROM events""",
    "stream_txlog_replica" ->
      s"""SELECT event_type, count(*) AS n,
                cast(sum(cast(
                  CASE WHEN event_id BETWEEN 650 AND 800
                            AND event_type = 'purchase'
                            AND event_id >= 200
                       THEN value * 2 ELSE value END
                  AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events
         WHERE (event_id >= 200
                AND NOT (event_id BETWEEN 200 AND 449
                         AND event_type = 'click')
                AND NOT (event_id BETWEEN 300 AND 600
                         AND event_type = 'view'))
            OR event_id < 100
         GROUP BY event_type ORDER BY event_type""",
    "s69_cdf_update_images" ->
      """SELECT cast(1 AS INTEGER) AS commit_version,
                'insert' AS change_type, count(*) AS n,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events WHERE event_id >= 100
         UNION ALL
         SELECT cast(2 AS INTEGER), 'update_preimage', count(*),
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE)
         FROM events WHERE event_id BETWEEN 200 AND 449
           AND event_type = 'click'
         UNION ALL
         SELECT cast(2 AS INTEGER), 'update_postimage', count(*),
                cast(sum(cast(value * 2 AS DECIMAL(18,6))) AS DOUBLE)
         FROM events WHERE event_id BETWEEN 200 AND 449
           AND event_type = 'click'
         ORDER BY commit_version, change_type""",
    "stream_txlog_cdf" ->
      s"""SELECT cast(1 AS INTEGER) AS commit_version,
                'insert' AS change_type, count(*) AS n,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events WHERE event_id >= 200
         UNION ALL
         SELECT cast(2 AS INTEGER), 'delete', count(*),
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE)
         FROM events WHERE event_id BETWEEN $morLo AND $morHi
           AND event_type = 'click'
         UNION ALL
         SELECT cast(3 AS INTEGER), 'insert', count(*),
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE)
         FROM events WHERE event_id < 100
         ORDER BY commit_version, change_type""",
    "stream_txlog_backfill" ->
      """SELECT event_type, count(*) AS n,
                count(DISTINCT event_id) AS n_ids,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events
         GROUP BY event_type ORDER BY event_type""",
    "stream_txlog_source" ->
      """SELECT cast(1 AS INTEGER) AS commit_version, count(*) AS n,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events WHERE event_id >= 200
         UNION ALL
         SELECT cast(2 AS INTEGER), count(*),
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE)
         FROM events WHERE event_id < 100
         UNION ALL
         SELECT cast(3 AS INTEGER), count(*),
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE)
         FROM events WHERE event_id BETWEEN 100 AND 199
         ORDER BY commit_version""",
    "s31_zorder_manifest_skip" ->
      s"""SELECT l_returnflag, count(*) AS n,
                cast(sum(cast(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
         FROM lineitem
         WHERE l_orderkey BETWEEN $okLo AND $okHi
           AND l_partkey BETWEEN $pkLo AND $pkHi
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "stream_txlog_medallion" ->
      """SELECT event_type, count(*) AS n,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events WHERE event_type <> 'error'
         GROUP BY event_type ORDER BY event_type""",
    "s28_cow_delete_log" ->
      s"""SELECT event_type, count(*) AS n,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events
         WHERE NOT (event_id BETWEEN $cowLo AND $cowHi
                    AND event_type = 'click')
         GROUP BY event_type ORDER BY event_type""",
    "s41_bloom_point_lookup" ->
      """SELECT event_id, user_id, event_type, value
         FROM events WHERE event_id IN (42, 123, 321)
         ORDER BY event_id""",
    "s44_check_constraint" ->
      """SELECT event_type, count(*) AS n,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM (SELECT event_type, value FROM events
               UNION ALL
               SELECT event_type, value FROM events WHERE event_id < 50)
         GROUP BY event_type ORDER BY event_type""",
    "s46_event_time_skipping" ->
      """SELECT event_type, count(*) AS n,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events
         WHERE ts BETWEEN TIMESTAMP '2024-01-05 00:00:00'
                      AND TIMESTAMP '2024-01-10 00:00:00'
         GROUP BY event_type ORDER BY event_type""",
    "s45_identity_append" ->
      """SELECT count(*) AS n_rows, count(*) AS n_distinct_ids,
                true AS all_unique, true AS ids_positive
         FROM events WHERE event_id < 600""",
    "s42_mor_update" ->
      s"""SELECT event_type, count(*) AS n,
                cast(sum(cast(
                  CASE WHEN event_id BETWEEN $cowLo AND $cowHi
                            AND event_type = 'view'
                       THEN value * 3 ELSE value END
                  AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events
         GROUP BY event_type ORDER BY event_type""",
    "s43_mor_merge" ->
      s"""SELECT event_type, count(*) AS n,
                cast(sum(cast(
                  CASE WHEN event_id BETWEEN $cowLo AND $cowHi
                       THEN value * 2 ELSE value END
                  AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events
         GROUP BY event_type ORDER BY event_type""",
    "s39_mor_delete" ->
      s"""SELECT event_type, count(*) AS n,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events
         WHERE NOT (event_id BETWEEN $cowLo AND $cowHi
                    AND event_type = 'click')
           AND NOT (event_id BETWEEN $morLo AND $morHi
                    AND event_type = 'view')
         GROUP BY event_type ORDER BY event_type""",
    "s40_mor_purge" ->
      s"""SELECT event_type, count(*) AS n,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events
         WHERE NOT (event_id BETWEEN $cowLo AND $cowHi
                    AND event_type = 'click')
           AND NOT (event_id BETWEEN $morLo AND $morHi
                    AND event_type = 'view')
         GROUP BY event_type ORDER BY event_type""",
    "s29_cow_update_log" ->
      s"""SELECT event_type, count(*) AS n,
                cast(sum(cast(
                  CASE WHEN event_id BETWEEN $cowLo AND $cowHi
                            AND event_type = 'view'
                       THEN value * 3 ELSE value END
                  AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events
         GROUP BY event_type ORDER BY event_type""",
    "s65_show_partitions" ->
      """SELECT concat('event_type=', event_type) AS partition,
                count(*) AS num_rows
         FROM events GROUP BY event_type ORDER BY 1""",
    "s67_replace_table" ->
      """SELECT o_orderstatus, count(*) AS n,
                cast(sum(cast(o_totalprice * 2 AS DECIMAL(18,6)))
                  AS DOUBLE) AS sum_price
         FROM orders WHERE o_orderkey < 6000
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "s66_day_restatement" ->
      """SELECT CAST(ts AS DATE) AS day, count(*) AS n,
                cast(sum(cast(
                  CASE WHEN CAST(ts AS DATE) = DATE '2024-01-15'
                       THEN value * 2 ELSE value END
                  AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events
         GROUP BY 1 ORDER BY 1""",
    "s64_generated_day_partition" ->
      """SELECT CAST(ts AS DATE) AS day, count(*) AS n,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events
         GROUP BY 1 ORDER BY 1""",
    "s60_partitioned_table" ->
      """SELECT user_id, count(*) AS n,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events
         WHERE event_type = 'purchase'
         GROUP BY user_id ORDER BY user_id""",
    "s25_manifest_skipping_scan" ->
      s"""SELECT event_type, count(*) AS n,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events
         WHERE event_id BETWEEN $cowLo AND $cowHi
         GROUP BY event_type ORDER BY event_type""",
    "j14_dpp_star_join" ->
      """SELECT event_type, count(*) AS n,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM (SELECT event_type, value, cast(ts AS DATE) AS d FROM events)
         WHERE d IN (DATE '2024-01-03', DATE '2024-01-07',
               DATE '2024-01-12', DATE '2024-01-18', DATE '2024-01-25')
         GROUP BY event_type ORDER BY event_type""",
    "j15_cbo_stats_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
                cast(sum(cast(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                  AS total_price
         FROM customer JOIN orders ON o_custkey = c_custkey
         WHERE c_acctbal < -500
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "p11_stratified_sample" ->
      """SELECT doc_id, lang FROM (
           SELECT doc_id, lang,
                  ('0x' || substring(md5(cast(doc_id AS VARCHAR)), 1, 8))::BIGINT
                    % 1000 AS b
           FROM documents)
         WHERE b < CASE WHEN lang = 'en' THEN 100 ELSE 500 END
         ORDER BY doc_id""")
}
