package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TxLog

/** Measures column-mapping RENAME COLUMN at 20M rows / 32 files
  * against the only alternative a mapping-less table format has — a
  * full physical rewrite under the new name:
  *   (a) TxLog.renameColumn — one metadata commit, zero data bytes;
  *   (b) read → alias → overwrite-commit (what every consumer without
  *       name indirection must do, and what it costs again at 100×).
  * Also times the post-rename snapshot read vs the pre-rename one:
  * the logical projection must not tax the scan.
  * Run: sbt -batch "Test/runMain graft.TxColMapProbeMain"
  * Numbers go to BENCH_NOTES.md. */
object TxColMapProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nRows = if (args.nonEmpty) args(0).toLong else 20_000_000L
    def table = spark.range(0, nRows)
      .select(col("id").as("k"),
        (col("id") % 97).cast("double").as("v"),
        md5(col("id").cast("string")).as("payload"))
      .repartitionByRange(32, col("k"))

    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label%-46s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def dirBytes(base: String): Long = {
      val p = new org.apache.hadoop.fs.Path(base)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true)
      var total = 0L
      while (it.hasNext) total += it.next().getLen
      total
    }

    // ---- (a) metadata-only rename on the mapped log -----------------
    val mapped = "/tmp/graft_cmprobe/mapped"
    TxLog.drop(spark, mapped)
    timed("seed 20M-row table (32 files)") {
      TxLog.commit(table, mapped, None, Some("k"))
    }
    val bytesBefore = dirBytes(mapped)
    val readBefore = timed("snapshot read+agg BEFORE rename") {
      TxLog.read(spark, mapped).agg(sum("v")).head.getDouble(0)
    }
    timed("(a) RENAME COLUMN v -> amount (mapping)") {
      TxLog.renameColumn(spark, mapped, "v", "amount")
    }
    val renameBytes = dirBytes(mapped) - bytesBefore
    println(f"    bytes written by (a): $renameBytes%,d " +
      "(one manifest; independent of table size)")
    val readAfter = timed("snapshot read+agg AFTER rename (logical)") {
      TxLog.read(spark, mapped).agg(sum("amount")).head.getDouble(0)
    }
    require(readBefore == readAfter, "rename must not change data")

    // ---- (b) the rewrite a mapping-less format needs ----------------
    val rewrite = "/tmp/graft_cmprobe/rewrite"
    TxLog.drop(spark, rewrite)
    TxLog.commit(table, rewrite, None, Some("k"))
    val preBytes = dirBytes(rewrite)
    timed("(b) physical rewrite under the new name") {
      TxLog.read(spark, rewrite)
        .withColumnRenamed("v", "amount")
        .repartitionByRange(32, col("k"))
        .write.format("graft.sources.TxLogSource")
        .mode("overwrite").option("statsColumns", "k")
        .save(rewrite)
    }
    val rewriteBytes = dirBytes(rewrite) - preBytes
    println(f"    bytes written by (b): $rewriteBytes%,d")
    println(f"    write-volume ratio (b)/(a): " +
      f"${rewriteBytes.toDouble / math.max(1L, renameBytes)}%.0f x")

    // ---- (c) tier-2 NESTED rename + nested-leaf stats at 20M --------
    val nested = "/tmp/graft_cmprobe/nested"
    TxLog.drop(spark, nested)
    def nestedTable = spark.range(0, nRows)
      .select(col("id").as("k"),
        struct((col("id") % 97).cast("double").as("v"),
          md5(col("id").cast("string")).as("payload")).as("s"))
      .repartitionByRange(32, col("k"))
    timed("seed 20M-row STRUCT table, stats on s.v + k") {
      TxLog.commitMulti(nestedTable, nested, None, Seq("k", "s.v"))
    }
    val nBytesBefore = dirBytes(nested)
    timed("(c) RENAME COLUMN s.v -> amount (nested mapping)") {
      TxLog.renameColumn(spark, nested, "s.v", "amount")
    }
    println(f"    bytes written by (c): ${dirBytes(nested) - nBytesBefore}%,d " +
      "(one manifest; zero struct bytes rewritten)")
    val nRead = timed("snapshot read+agg via s.amount (logical struct)") {
      TxLog.read(spark, nested).agg(sum("s.amount")).head.getDouble(0)
    }
    require(nRead == readBefore, "nested rename must not change data")
    // nested-leaf pruning by the NEW logical path hits the frozen
    // physical stats — k and s.v were both banded at write
    val (kept, all) = timed("pruneRanges on the renamed nested leaf") {
      TxLog.pruneRanges(spark, nested, Seq(("k", 0L, nRows / 32 / 2)))
    }
    println(s"    kept ${kept.size} of ${all.size} files on a half-file band")
    require(kept.size < all.size)

    spark.stop()
  }
}
