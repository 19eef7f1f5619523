package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TxLog

/** Conflict-granular optimistic concurrency (Delta's conflict
  * checker, r13 Missing #2). Laws:
  *
  *  - blind appends never recompute: two racers both land their data
  *    exactly once; the loser re-BASES (one extra manifest write);
  *  - a MERGE racing a DISJOINT-band DELETE re-bases without
  *    recomputing the merge (measured by a source-evaluation
  *    accumulator — the landed output is reused verbatim);
  *  - an OVERLAPPING winner still serializes by recompute, and the
  *    final state equals sequential application;
  *  - a concurrent METADATA change (ADD CONSTRAINT) always forces
  *    recompute, even when file sets are disjoint.
  */
class TxLogOccSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def band(lo: Long, n: Long, tag: String) =
    spark.range(lo, lo + n)
      .select(col("id").as("k"), concat(lit(tag), lit("-"), col("id")).as("s"))
      .coalesce(1)

  /** Source DF whose evaluation count is observable: every pass over
    * the rows bumps the accumulator. */
  private def counted(df: DataFrame, acc: org.apache.spark.util.LongAccumulator) = {
    val enc = org.apache.spark.sql.Encoders.product[(Long, String)]
    df.as[(Long, String)](enc).map { r => acc.add(1L); r }(enc)
      .toDF("k", "s")
  }

  private def dataDirs(base: String): Int = {
    val f = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val d = new org.apache.hadoop.fs.Path(s"$base/data")
    if (!f.exists(d)) 0 else f.listStatus(d).count(_.isDirectory)
  }

  test("two concurrent appends both land exactly once: the CAS loser " +
    "re-publishes against the winner without re-landing its files") {
    val base = "/tmp/graft_txocc/appends"
    TxLog.drop(spark, base)
    TxLog.commit(band(0, 10, "seed"), base, None, Some("k"))
    val d0 = dataDirs(base)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val racers = Seq(
      Future { TxLog.append(band(100, 10, "a"), base, Some("k")) },
      Future { TxLog.append(band(200, 10, "b"), base, Some("k")) })
    racers.foreach(Await.result(_, 120.seconds))
    assert(TxLog.read(spark, base).count() == 30)
    assert(dataDirs(base) == d0 + 2,
      "each append lands ONE txn dir — a re-land (discard + new dir) " +
        "would leave the loser's count at 2")
    assert(TxLog.latestVersion(spark, base).contains(3L),
      "three commits: seed + two appends")
  }

  test("MERGE racing a DISJOINT-band DELETE re-bases: zero recompute, " +
    "the winner's delete is carried, the merge output is reused") {
    val base = "/tmp/graft_txocc/disjoint"
    TxLog.drop(spark, base)
    // two bands in separate files: A = [0,100), B = [1000,1100)
    TxLog.commit(band(0, 100, "a").union(band(1000, 100, "b"))
      .repartitionByRange(2, col("k")), base, None, Some("k"))
    // control: how many source evaluations does an uncontested merge
    // cost? (the stats-bounds agg + the merge job itself)
    val ctlAcc = spark.sparkContext.longAccumulator("occ_ctl")
    TxLog.mergeCow(spark, base,
      counted(Seq((5L, "CTL"), (6L, "CTL")).toDF("k", "s"), ctlAcc),
      Seq("k"), "k")
    val ctl = ctlAcc.value
    assert(ctl > 0)
    // the race: attempt 1's seam (after snapshot read, before publish)
    // fires a COW delete of band B — our merge touches only band A
    val acc = spark.sparkContext.longAccumulator("occ_disjoint")
    var deleted = false
    val v = TxLog.mergeCow(spark, base,
      counted(Seq((7L, "UPD"), (1L, "UPD")).toDF("k", "s"), acc),
      Seq("k"), "k",
      onAttempt = a => if (a == 1 && !deleted) {
        deleted = true
        TxLog.deleteRange(spark, base, "k", 1050L, 1099L)
      })
    assert(acc.value == ctl,
      s"disjoint loss must RE-BASE, not recompute: control cost $ctl " +
        s"evaluations, got ${acc.value}")
    // both effects present: the delete's band gone, the merge applied
    val got = TxLog.read(spark, base).select("k", "s").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got(7L) == "UPD" && got(1L) == "UPD" && got(5L) == "CTL")
    assert(!got.contains(1050L) && !got.contains(1099L),
      "the winner's delete must be carried through the re-base")
    assert(got.contains(1049L) && got.size == 200 - 50)
    assert(v == TxLog.latestVersion(spark, base).get)
  }

  test("MERGE racing an OVERLAPPING delete recomputes — final state " +
    "equals sequential application (delete THEN merge)") {
    val base = "/tmp/graft_txocc/overlap"
    TxLog.drop(spark, base)
    TxLog.commit(band(0, 100, "a").repartitionByRange(2, col("k")),
      base, None, Some("k"))
    val ctlAcc = spark.sparkContext.longAccumulator("occ_ctl2")
    TxLog.mergeCow(spark, base,
      counted(Seq((200L, "CTL")).toDF("k", "s"), ctlAcc), Seq("k"), "k")
    val ctl = ctlAcc.value
    val acc = spark.sparkContext.longAccumulator("occ_overlap")
    var deleted = false
    TxLog.mergeCow(spark, base,
      counted(Seq((10L, "UPD"), (20L, "NEW2")).toDF("k", "s"), acc),
      Seq("k"), "k",
      onAttempt = a => if (a == 1 && !deleted) {
        deleted = true
        TxLog.deleteRange(spark, base, "k", 10L, 15L) // overlaps the merge
      })
    assert(acc.value > ctl,
      s"an overlapping winner must force recompute: control $ctl, " +
        s"got ${acc.value}")
    val got = TxLog.read(spark, base).select("k", "s").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    // sequential semantics: delete removed 10..15, then the merge
    // re-inserted key 10 and updated 20
    assert(got(10L) == "UPD" && got(20L) == "NEW2")
    assert(!got.contains(11L) && !got.contains(15L))
  }

  test("MOR DELETE racing a disjoint append re-bases: the landed " +
    "deletion-vector sidecar is reused, the winner's rows are carried, " +
    "deleted rows stay deleted") {
    val base = "/tmp/graft_txocc/mor"
    TxLog.drop(spark, base)
    TxLog.commit(band(0, 100, "a").union(band(1000, 100, "b"))
      .repartitionByRange(2, col("k")), base, None, Some("k"))
    // race: between the delete's snapshot read and its publish, a
    // disjoint append wins the CAS. deleteRangeMor has no onAttempt
    // seam, so interleave via threads + a latch on version count.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val del = Future {
      TxLog.deleteRangeMor(spark, base, "k", 10L, 19L) }
    val app = Future {
      TxLog.append(band(2000, 10, "c"), base, Some("k")) }
    Seq(del, app).foreach(Await.result(_, 120.seconds))
    val got = TxLog.read(spark, base).select("k").collect()
      .map(_.getLong(0)).toSet
    assert(got == ((0L until 100L) ++ (1000L until 1100L) ++
      (2000L until 2010L)).toSet -- (10L to 19L),
      "both effects land; deleted rows stay deleted")
    // no orphan sidecar dirs: every data dir is referenced or gone
    val latest = TxLog.latestVersion(spark, base).get
    val refs = TxLog.manifest(spark, base, latest)._1
    assert(refs.flatMap(_.dv).nonEmpty, "the DV mask survived the race")
  }

  // ---- r14 next-round #5: re-base for COW DML + maintenance --------

  /** Base-relative dirs of the data tree — the reuse witness: a verb
    * that re-bases publishes files landed BEFORE its retry attempt,
    * so the published dirs are a subset of what existed at the seam. */
  private def dataDirNames(base: String): Set[String] = {
    val f = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val d = new org.apache.hadoop.fs.Path(s"$base/data")
    if (!f.exists(d)) Set.empty
    else f.listStatus(d).filter(_.isDirectory)
      .map(st => "data/" + st.getPath.getName).toSet
  }

  private def dirOf(p: String): String =
    p.split('/').dropRight(1).mkString("/")

  test("COW DELETE racing a disjoint append re-bases: the landed " +
    "rewrite is republished verbatim (no second rewrite job), both " +
    "effects land") {
    val base = "/tmp/graft_txocc/cowdel"
    TxLog.drop(spark, base)
    TxLog.commit(band(0, 100, "a").union(band(1000, 100, "b"))
      .repartitionByRange(2, col("k")), base, None, Some("k"))
    var attempts = 0
    var appended = false
    var dirsAtRetry: Set[String] = Set.empty
    val v = TxLog.deleteRange(spark, base, "k", 0L, 49L,
      onAttempt = a => {
        attempts = a
        if (a == 1 && !appended) {
          appended = true
          TxLog.append(band(2000, 10, "c"), base, Some("k"))
        }
        if (a == 2) dirsAtRetry = dataDirNames(base)
      })
    assert(attempts == 2, s"one CAS loss, one re-base: $attempts")
    // the delete's rewritten files were landed in attempt 1 — the
    // re-base must publish THOSE dirs, not land fresh ones
    val prevPaths = TxLog.manifest(spark, base, v - 1)._1.map(_.path).toSet
    val fresh = TxLog.manifest(spark, base, v)._1.map(_.path)
      .filterNot(prevPaths)
    assert(fresh.nonEmpty && fresh.forall(p => dirsAtRetry(dirOf(p))),
      s"re-base must reuse the attempt-1 land: $fresh vs $dirsAtRetry")
    val got = TxLog.read(spark, base).select("k").as[Long].collect().toSet
    assert(got == ((50L until 100L) ++ (1000L until 1100L) ++
      (2000L until 2010L)).toSet,
      "both the delete and the winner's append must be in effect")
  }

  test("COW UPDATE racing an OVERLAPPING append recomputes: the " +
    "winner's in-range rows take the update too (sequential " +
    "semantics), and the retry lands a fresh rewrite") {
    val base = "/tmp/graft_txocc/cowupd"
    TxLog.drop(spark, base)
    TxLog.commit(band(0, 100, "a").repartitionByRange(2, col("k")),
      base, None, Some("k"))
    var appended = false
    var dirsAtRetry: Set[String] = Set.empty
    val v = TxLog.updateRange(spark, base, "k", 0L, 59L,
      Map("s" -> lit("UPD")),
      onAttempt = a => {
        if (a == 1 && !appended) {
          appended = true
          TxLog.append(band(30, 5, "w"), base, Some("k")) // overlaps
        }
        if (a == 2) dirsAtRetry = dataDirNames(base)
      })
    val prevPaths = TxLog.manifest(spark, base, v - 1)._1.map(_.path).toSet
    val fresh = TxLog.manifest(spark, base, v)._1.map(_.path)
      .filterNot(prevPaths)
    assert(!fresh.forall(p => dirsAtRetry(dirOf(p))),
      "an overlapping winner must force a FRESH rewrite")
    val got = TxLog.read(spark, base).select("k", "s").as[(Long, String)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    // the winner's 5 duplicate keys [30,35) were appended BEFORE the
    // update serialized behind it — every copy in range reads UPD
    assert((0L until 60L).forall(k => got(k).forall(_ == "UPD")),
      "in-range rows (the winner's included) must carry the update")
    assert((30L until 35L).forall(k => got(k).size == 2))
    assert((60L until 100L).forall(k => got(k).forall(_ != "UPD")))
  }

  test("OPTIMIZE racing a blind append re-bases in 2 attempts with " +
    "ZERO re-binning: the bin-packed output is republished verbatim, " +
    "the winner's file stays uncompacted for the next sweep") {
    val base = "/tmp/graft_txocc/opt"
    TxLog.drop(spark, base)
    (0 until 4).foreach(i => TxLog.append(band(i * 10L, 10L, s"s$i"),
      base, Some("k"))) // four small files
    TxLog.append(band(5000, 500, "big"), base, Some("k"))
    var attempts = 0
    var appended = false
    var dirsAtRetry: Set[String] = Set.empty
    var winnerPath: String = null
    val v = TxLog.compact(spark, base, smallThresholdRows = 100L,
      targetRows = 1000L, statsCol0 = Some("k"),
      onAttempt = a => {
        attempts = a
        if (a == 1 && !appended) {
          appended = true
          val av = TxLog.append(band(9000, 5, "w"), base, Some("k"))
          winnerPath = TxLog.manifest(spark, base, av)._1
            .map(_.path).filterNot(TxLog.manifest(spark, base, av - 1)
              ._1.map(_.path).toSet).head
        }
        if (a == 2) dirsAtRetry = dataDirNames(base)
      })
    assert(attempts == 2, s"one CAS loss, one re-base: $attempts")
    val entries = TxLog.manifest(spark, base, v)._1
    val prevPaths = TxLog.manifest(spark, base, v - 1)._1.map(_.path).toSet
    val fresh = entries.map(_.path).filterNot(prevPaths)
    assert(fresh.nonEmpty && fresh.forall(p => dirsAtRetry(dirOf(p))),
      s"re-base must republish the attempt-1 bin-pack: $fresh")
    assert(entries.exists(_.path == winnerPath),
      "the winner's append rides along uncompacted")
    assert(TxLog.read(spark, base).count() == 4 * 10 + 500 + 5,
      "compaction is content-identical through the re-base")
  }

  test("OPTIMIZE racing a MOR delete that MASKS a compaction input " +
    "recomputes — the stale bin-pack (pre-mask rows) is discarded") {
    val base = "/tmp/graft_txocc/optmask"
    TxLog.drop(spark, base)
    (0 until 3).foreach(i => TxLog.append(band(i * 10L, 10L, s"s$i"),
      base, Some("k")))
    var masked = false
    var dirsAtRetry: Set[String] = Set.empty
    val v = TxLog.compact(spark, base, smallThresholdRows = 100L,
      targetRows = 1000L, statsCol0 = Some("k"),
      onAttempt = a => {
        if (a == 1 && !masked) {
          masked = true
          TxLog.deleteRangeMor(spark, base, "k", 0L, 4L)
        }
        if (a == 2) dirsAtRetry = dataDirNames(base)
      })
    val prevPaths = TxLog.manifest(spark, base, v - 1)._1.map(_.path).toSet
    val fresh = TxLog.manifest(spark, base, v)._1.map(_.path)
      .filterNot(prevPaths)
    assert(!fresh.forall(p => dirsAtRetry(dirOf(p))),
      "a masked input invalidates the bin-pack — fresh rewrite required")
    assert(TxLog.read(spark, base).select("k").as[Long].collect().toSet ==
      (5L until 30L).toSet,
      "the winner's mask must hold through the recomputed compaction")
  }

  test("ZORDER racing a blind append re-bases: the tiled output is " +
    "republished verbatim, zero re-tiling") {
    val base = "/tmp/graft_txocc/zord"
    TxLog.drop(spark, base)
    val df = spark.range(0, 400).select(col("id").as("k"),
      (col("id") % 20).as("j"), concat(lit("z-"), col("id")).as("s"))
    graft.operators.TxLog.commitMulti(df.repartition(8), base, None,
      Seq("k", "j"))
    var attempts = 0
    var appended = false
    var dirsAtRetry: Set[String] = Set.empty
    val v = TxLog.compactZorderPhys(spark, base, Seq("k", "j"),
      smallThresholdRows = 100L, targetRows = 400L,
      onAttempt = a => {
        attempts = a
        if (a == 1 && !appended) {
          appended = true
          TxLog.append(spark.range(9000, 9005).select(col("id").as("k"),
            (col("id") % 20).as("j"),
            concat(lit("w-"), col("id")).as("s")).coalesce(1),
            base, Some("k"))
        }
        if (a == 2) dirsAtRetry = dataDirNames(base)
      })
    assert(attempts == 2, s"one CAS loss, one re-base: $attempts")
    val prevPaths = TxLog.manifest(spark, base, v - 1)._1.map(_.path).toSet
    val fresh = TxLog.manifest(spark, base, v)._1.map(_.path)
      .filterNot(prevPaths)
    assert(fresh.nonEmpty && fresh.forall(p => dirsAtRetry(dirOf(p))),
      s"re-base must republish the attempt-1 tiling: $fresh")
    assert(TxLog.read(spark, base).count() == 405,
      "re-tiling is content-identical through the re-base")
  }

  test("a concurrent ADD CONSTRAINT forces recompute even with " +
    "disjoint file sets — the landed output was never checked under " +
    "the new constraint") {
    val base = "/tmp/graft_txocc/meta"
    TxLog.drop(spark, base)
    TxLog.commit(band(0, 50, "a").union(band(1000, 50, "b"))
      .repartitionByRange(2, col("k")), base, None, Some("k"))
    val ctlAcc = spark.sparkContext.longAccumulator("occ_ctl3")
    TxLog.mergeCow(spark, base,
      counted(Seq((3L, "CTL")).toDF("k", "s"), ctlAcc), Seq("k"), "k")
    val ctl = ctlAcc.value
    val acc = spark.sparkContext.longAccumulator("occ_meta")
    var altered = false
    TxLog.mergeCow(spark, base,
      counted(Seq((4L, "ok")).toDF("k", "s"), acc), Seq("k"), "k",
      onAttempt = a => if (a == 1 && !altered) {
        altered = true
        TxLog.addConstraint(spark, base, "s_nonempty",
          "length(s) > 0")
      })
    assert(acc.value > ctl,
      "metadata drift invalidates the landed output — must recompute " +
        s"(control $ctl, got ${acc.value})")
    assert(TxLog.read(spark, base).where("k = 4").count() == 1)
  }
}
