package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout maintenance verbs: multi-dimensional (Z-order)
  * clustering and partition-pruned targeted deletes — the Delta
  * `OPTIMIZE ZORDER BY` / GDPR-delete analogs a lakehouse needs once
  * tables live for years (the reference's Delta storage advertises
  * both; its pipeline never rewrites layout, so these are the
  * maintenance half of SURVEY §2.11 re-expressed on plain parquet).
  *
  * Scale shape: both verbs are bounded rewrites. Z-ordering is one
  * range shuffle + local sort (exactly what any sorted write costs);
  * the targeted delete never touches a partition that holds no
  * matching key — at 100 TB with thousands of partitions a delete of
  * a handful of users rewrites only the few partitions they hash to.
  */
object Layout {

  /** Bit-interleaved Z-value of two keys, each min-max normalized to
    * 16 bits. Pure built-in expressions (shift/and/or folds), so the
    * whole computation stays inside whole-stage codegen — no UDF.
    * Normalization bounds are passed in (computed once from stats);
    * a degenerate dimension (lo == hi) maps to 0 rather than dividing
    * by zero. */
  def zvalue(a: Column, aLo: Long, aHi: Long,
             b: Column, bLo: Long, bHi: Long): Column =
    zvalueK(Seq((a, aLo, aHi), (b, bLo, bHi)))

  /** k-dimensional bit-interleaved Z-value (Delta `ZORDER BY` takes k
    * columns; so does this). Resolution divides the 62 usable mantissa
    * bits of a positive long evenly: 16 bits/dim at k=2..3, 15 at k=4,
    * 12 at k=5, … — coarser per-dimension buckets are the intrinsic
    * trade of interleaving more keys, exactly as in Delta's
    * byte-interleave. Same codegen-friendly shift/and/or fold as the
    * 2-D form; degenerate dimensions (lo == hi) map to 0. */
  def zvalueK(dims: Seq[(Column, Long, Long)]): Column = {
    val k = dims.size
    require(k >= 2, s"a Z-value interleaves at least two keys (got $k)")
    val bits = math.min(16, 62 / k)
    val maxV = (1L << bits) - 1
    def norm(c: Column, lo: Long, hi: Long): Column =
      if (hi == lo) lit(0L)
      else ((c - lit(lo)).cast("double") * (maxV.toDouble / (hi - lo).toDouble))
        .cast("long")
    val ns = dims.map { case (c, lo, hi) => norm(c, lo, hi) }
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      ns.zipWithIndex.foldLeft(acc) { case (a, (n, d)) =>
        a.bitwiseOR(
          shiftleft(shiftright(n, i).bitwiseAND(lit(1L)), k * i + d))
      }
    }
  }

  /** Rewrite `df` into `nFiles` parquet files clustered by the
    * Z-value of (`aCol`, `bCol`): range-partition on the Z-value
    * (balanced files), sort within each partition, drop the helper
    * column. After the rewrite every file covers a small square-ish
    * tile of the (a, b) key plane, so a predicate box on EITHER or
    * BOTH dimensions skips most files via parquet min-max stats —
    * single-column sorting can only serve one of the two.
    *
    * The two stat scalars are a driver round-trip by design (they are
    * table-level min/max — one row); at 100 TB the same two numbers
    * come from table metadata. */
  def zorderWrite(df: DataFrame, aCol: String, bCol: String,
                  outDir: String, nFiles: Int): Unit =
    zorderCluster(df, aCol, bCol, nFiles)
      .write.mode("overwrite").parquet(outDir)

  /** The clustering half of [[zorderWrite]] without the sink: the
    * returned DataFrame is range-partitioned and locally sorted on
    * the Z-value (one tile of the key plane per partition), so ANY
    * writer — plain parquet, or a TxLog commit with per-file stats on
    * both keys ([[TxLog.commitMulti]]) — lands tile-per-file. */
  def zorderCluster(df: DataFrame, aCol: String, bCol: String,
                    nFiles: Int): DataFrame =
    zorderClusterK(df, Seq(aCol, bCol), nFiles)

  /** k-column [[zorderCluster]]: one agg for all 2k bound scalars
    * (single driver round-trip), one range shuffle on the interleaved
    * Z-value, local sort — identical cost shape to the 2-D form at
    * any k. */
  def zorderClusterK(df: DataFrame, cols: Seq[String],
                     nFiles: Int,
                     exprOf: String => Option[Column] = _ => None)
      : DataFrame = {
    require(cols.size >= 2,
      s"zorderCluster needs at least two columns (got ${cols.size})")
    // the normalize step's `c - lit(lo: Long)` only resolves on
    // NUMERIC keys under ANSI — a timestamp key must go through the
    // same long (epoch-second) representation its min/max bounds use,
    // or Subtract(timestamp, bigint) fails analysis mid-rewrite.
    // `exprOf` lets the caller supply a computed key (a variant
    // extraction path — TxLog's CLUSTER BY on `v$.price`); computed
    // keys arrive numeric by their declaration, so no re-typing here
    def keyCol(c: String): Column = exprOf(c).getOrElse {
      // resolve through a projection so NESTED leaves ("s.ts") get
      // the same timestamp treatment as flat keys
      scala.util.Try(df.select(col(c)).schema.head.dataType).toOption match {
        case Some(org.apache.spark.sql.types.TimestampType) =>
          col(c).cast("long")
        case _ => col(c)
      }
    }
    val aggs = cols.flatMap(c =>
      Seq(min(keyCol(c)).cast("long"), max(keyCol(c)).cast("long")))
    val s = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.foreach { case (c, i) =>
      require(!s.isNullAt(2 * i),
        s"zorderCluster: no non-null (${cols.mkString(", ")}) rows to " +
          s"cluster ('$c' is all NULL)")
    }
    val z = zvalueK(cols.zipWithIndex.map { case (c, i) =>
      (keyCol(c), s.getLong(2 * i), s.getLong(2 * i + 1)) })
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Copy-on-write targeted delete on a hash-partitioned parquet
    * table: remove every row whose `keyCol` appears in `keys`,
    * rewriting ONLY the partitions those keys hash to.
    *
    * Steps: (1) affected partition values are derived from the key
    * list itself — no table scan; (2) the affected partitions are
    * read (partition-pruned scan), survivors selected by broadcast
    * anti-join against the key frame (a driver `isin` list would cap
    * the key count; the join path scales to millions of deletion
    * keys); (3) survivors stage to a scratch dir (a parquet path
    * cannot be its own overwrite source), then land via DYNAMIC
    * partition overwrite so untouched partitions' files are never
    * rewritten; (4) a partition whose every row was deleted gets NO
    * file from the dynamic overwrite — its stale directory is removed
    * explicitly, or the deleted rows would resurface.
    *
    * NOT crash-atomic: plain parquet has no commit log, so true
    * atomicity requires a table format with a transaction log; this
    * operator documents the trade rather than hiding it. The crash
    * windows, precisely:
    *  - between the completed overwrite and the emptied-partition
    *    cleanup: a fully-deleted partition's old files linger; rerun
    *    the delete to converge (idempotent in THIS window only);
    *  - DURING the dynamic overwrite: a partition dir may have been
    *    cleared before its survivor files landed. The survivors'
    *    only copy is the run's staging dir — which is why each run
    *    stages under a fresh `run_<nanos>` subdir (a rerun can never
    *    clobber the copy a recovery needs), and why staging is
    *    deleted only AFTER the rewritten table validates against the
    *    staged row count. Recovery: re-land the retained staging dir
    *    (plain dynamic-overwrite write), then rerun the delete.
    */
  def targetedDelete(spark: SparkSession, tableDir: String,
                     partCol: String, keyCol: String, keys: DataFrame,
                     nBuckets: Int, stagingDir: String): Unit = {
    val affected = keys
      .select(pmod(col(keyCol), lit(nBuckets)).cast("int").as(partCol))
      .distinct().collect().map(_.getInt(0))
    // Fresh staging subdir per run: a rerun after a mid-overwrite
    // crash must never overwrite the previous run's staged survivors
    // (potentially their only remaining copy).
    val runStaging = s"$stagingDir/run_${System.nanoTime()}"
    spark.read.parquet(tableDir)
      .where(col(partCol).isin(affected.toIndexedSeq: _*))
      .join(broadcast(keys), Seq(keyCol), "left_anti")
      .write.mode("overwrite").parquet(runStaging)
    val staged = spark.read.parquet(runStaging)
    val stagedCount = staged.count()
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try
      staged.write.mode("overwrite").partitionBy(partCol).parquet(tableDir)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    // dynamic overwrite only rewrites partitions present in `staged`;
    // an affected partition with zero survivors keeps its old files —
    // delete those directories (bounded by |affected|, tiny)
    val survivors = staged.select(col(partCol).cast("int")).distinct()
      .collect().map(_.getInt(0)).toSet
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (affected.toSet -- survivors).foreach { b =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$tableDir/$partCol=$b"), true)
    }
    // Validate the landed table before dropping the staged copy: the
    // affected partitions must now hold exactly the staged survivors.
    // Zero survivors = nothing was overwritten and the cleanup above
    // removed every affected dir (possibly leaving the table with no
    // files at all, where a parquet read would fail on schema
    // inference) — validate by the dirs' absence instead.
    val landed =
      if (stagedCount == 0) {
        val lingering = affected.filter(b =>
          fs.exists(new org.apache.hadoop.fs.Path(s"$tableDir/$partCol=$b")))
        require(lingering.isEmpty,
          s"targetedDelete validation failed: zero survivors staged but " +
            s"partition dirs ${lingering.mkString(",")} still exist; " +
            s"staging retained at $runStaging for recovery")
        0L
      } else spark.read.parquet(tableDir)
        .where(col(partCol).isin(affected.toIndexedSeq: _*)).count()
    require(landed == stagedCount,
      s"targetedDelete validation failed: staged $stagedCount survivor rows " +
        s"but affected partitions hold $landed after overwrite; staging " +
        s"retained at $runStaging for recovery")
    fs.delete(new org.apache.hadoop.fs.Path(runStaging), true)
  }
}
