package graft

import org.apache.spark.sql.functions._
import graft.operators.TxLog

/** Scale probes for the round-13 surfaces, at 20M rows on local[32]:
  *
  *   1. `enableRowTracking` cost — one metadata commit backfilling
  *      O(files) id spans, zero data bytes moved;
  *   2. the row-id read tax — `readWithRowIds` (broadcast file-base
  *      join + coalesce) vs the plain scan;
  *   3. COW UPDATE with materialization vs the untracked baseline —
  *      the id column adds one long per row to the rewritten band
  *      only;
  *   4. clustered append overhead — the self-tiling range shuffle vs
  *      a plain append of the same batch;
  *   5. incremental OPTIMIZE on the clustered table: touched-file
  *      count after corner stragglers (must be ≪ total).
  *
  * Run: sbt "Test/runMain graft.TxRowClusterProbeMain"
  */
object TxRowClusterProbeMain {
  private def timed[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"PROBE $label%-46s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val n = 20L * 1000 * 1000

    // ---- row tracking at 20M ----------------------------------------
    val rt = "/tmp/graft_probe13/rowtrack"
    TxLog.drop(spark, rt)
    val big = spark.range(n).select(
      col("id").as("k"), (col("id") % 1000).cast("int").as("g"),
      (col("id") * 7 % 9973).cast("double").as("v"))
    timed("seed 20M (32 band files)") {
      TxLog.commit(big.repartitionByRange(32, col("k")), rt, None, Some("k"))
    }
    val mBefore = new java.io.File(
      s"$rt/_log").listFiles().map(_.length()).sum
    timed("enableRowTracking (metadata backfill)") {
      TxLog.enableRowTracking(spark, rt)
    }
    val mAfter = new java.io.File(
      s"$rt/_log").listFiles().map(_.length()).sum
    println(s"PROBE backfill manifest bytes: ${mAfter - mBefore}")
    timed("plain scan (warm)") {
      TxLog.read(spark, rt).agg(sum("v")).head()
    }
    timed("plain scan (warm, 2nd)") {
      TxLog.read(spark, rt).agg(sum("v")).head()
    }
    val distinctIds = timed("readWithRowIds full scan + distinct") {
      TxLog.readWithRowIds(spark, rt)
        .agg(countDistinct("_row_id"), count(lit(1))).head()
    }
    println(s"PROBE ids distinct/total: ${distinctIds.getLong(0)}/" +
      s"${distinctIds.getLong(1)}")
    // COW update of one band, tracked (materializes ids)
    timed("COW update 1/32 band, TRACKED") {
      TxLog.updateRange(spark, rt, "k", 1000000L, 1600000L,
        Map("v" -> (col("v") + lit(1.0))))
    }
    // untracked baseline
    val ut = "/tmp/graft_probe13/untracked"
    TxLog.drop(spark, ut)
    TxLog.commit(big.repartitionByRange(32, col("k")), ut, None, Some("k"))
    timed("COW update 1/32 band, untracked") {
      TxLog.updateRange(spark, ut, "k", 1000000L, 1600000L,
        Map("v" -> (col("v") + lit(1.0))))
    }
    // ids preserved through the rewrite
    val survived = TxLog.readWithRowIds(spark, rt)
      .agg(countDistinct("_row_id"), count(lit(1))).head()
    println(s"PROBE post-update ids distinct/total: " +
      s"${survived.getLong(0)}/${survived.getLong(1)}")

    // ---- CLUSTER BY at 20M -------------------------------------------
    val cl = "/tmp/graft_probe13/clustered"
    val pl = "/tmp/graft_probe13/plainapp"
    TxLog.drop(spark, cl); TxLog.drop(spark, pl)
    import org.apache.spark.sql.types._
    TxLog.createTable(spark, cl, StructType(Seq(
      StructField("x", LongType), StructField("y", LongType),
      StructField("v", DoubleType))), clusterBy = Seq("x", "y"))
    val batch = spark.range(n).select(
      (col("id") * 7 % 100000).as("x"), (col("id") * 13 % 100000).as("y"),
      (col("id") % 9973).cast("double").as("v")).repartition(32)
    timed("clustered append 20M (self-tiling)") {
      TxLog.append(batch, cl)
    }
    timed("plain append 20M (baseline)") {
      TxLog.commit(batch, pl, None)
    }
    // box skip sharpness with zero maintenance
    val (kept, all) = TxLog.pruneRanges(spark, cl,
      Seq(("x", 0L, 9999L), ("y", 0L, 9999L)))
    println(s"PROBE clustered box prune: kept ${kept.size}/${all.size}")
    // corner stragglers, then incremental OPTIMIZE
    (1 to 4).foreach(i => TxLog.append(spark.range(1000).select(
      (col("id") % 100).as("x"), (col("id") % 100).as("y"),
      lit(1.0).as("v")).coalesce(1), cl))
    val preFiles = TxLog.manifest(spark, cl,
      TxLog.latestVersion(spark, cl).get)._1.map(_.path).toSet
    val vOpt = timed("incremental OPTIMIZE (stragglers only)") {
      TxLog.compact(spark, cl, 100000L, 1000000L)
    }
    val postFiles = TxLog.manifest(spark, cl, vOpt)._1.map(_.path).toSet
    println(s"PROBE OPTIMIZE carried ${preFiles.intersect(postFiles).size}" +
      s"/${preFiles.size} files by reference")
  }
}
