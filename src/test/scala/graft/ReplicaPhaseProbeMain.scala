package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Phase-level wall decomposition of the stream_txlog_replica path:
  * `sbt "Test/runMain graft.ReplicaPhaseProbeMain"`. Mirrors
  * StreamingOps.cdcReplicaPipeline with timers around each phase so
  * the micro-batch machinery, the fixture commits, and the witness
  * assertions can be attacked separately. Diagnostic only — never on
  * the bench path. */
object ReplicaPhaseProbeMain {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    SparkEntry.prepare(spark, dir)

    import graft.operators.TxLog
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  [phase] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    (1 to 2).foreach { rep =>
      println(s"==== replica phase probe, pass $rep ====")
      val ev = graft.sources.Tables.load(spark, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      val fixtures = graft.sources.Ingest.fixtureDir(dir)
      val src = fixtures + "/cdc_src"
      val rep2 = fixtures + "/cdc_replica"
      timed("drop")(TxLog.drop(spark, src))
      TxLog.drop(spark, rep2)
      val ckpt = "/tmp/graft_stream_ckpt/cdc_" + java.util.UUID.randomUUID()
      timed("fixture: seed commit")(TxLog.commit(
        ev.where(col("event_id") >= 200).repartitionByRange(4, col("event_id")),
        src, None, Some("event_id")))
      timed("fixture: mor delete 1")(TxLog.deleteRangeMor(spark, src,
        "event_id", 200L, 449L, residual = col("event_type") === "click"))
      def run(label: String): Unit = timed(label) {
        val q = spark.readStream.format("graft.sources.TxLogSource")
          .option("changeFeedTypes", "true")
          .option("maxVersionsPerTrigger", "1")
          .load(src)
          .writeStream
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (batch: DataFrame, bid: Long) =>
            val t0 = System.nanoTime()
            val b = batch.persist()
            try {
              TxLog.applyChanges(spark, rep2,
                deleteKeys = b.where(col("_change_type")
                  .isin("delete", "update_preimage")).select("event_id"),
                inserts = b.where(col("_change_type")
                  .isin("insert", "update_postimage"))
                  .drop("_commit_version", "_change_type"),
                keys = Seq("event_id"), statsCol = "event_id",
                appId = "cdc-replica", batchId = bid)
            } finally b.unpersist(false)
            println(f"    [batch] $bid ${(System.nanoTime() - t0) / 1e9}%6.3f s")
            ()
          }
          .start()
        q.awaitTermination()
      }
      run("stream run 1 (v1+v2)")
      timed("fixture: mor delete 2")(TxLog.deleteRangeMor(spark, src,
        "event_id", 300L, 600L, residual = col("event_type") === "view"))
      timed("fixture: append")(TxLog.append(
        ev.where(col("event_id") < 100), src, Some("event_id")))
      timed("fixture: mor update")(TxLog.updateRangeMor(spark, src,
        "event_id", 650L, 800L, Map("value" -> (col("value") * 2)),
        residual = col("event_type") === "purchase"))
      timed("witness: v5 types")(require(
        TxLog.changesWithDeletes(spark, src, 4L, 5L)
          .select("_change_type").distinct().collect()
          .map(_.getString(0)).toSet ==
          Set("update_preimage", "update_postimage"), "v5 types"))
      run("stream run 2 (v3-v5)")
      timed("witness: multiset equal")(
        graft.operators.Checks.requireMultisetEqual(
          TxLog.read(spark, src), TxLog.read(spark, rep2), "replica"))
      timed("witness: versions+hw")(require(
        TxLog.latestVersion(spark, rep2).contains(5L) &&
          TxLog.manifest(spark, rep2, 5L)._2 == Map("cdc-replica" -> 4L),
        "hw"))
      timed("final agg -> noop")(
        TxLog.read(spark, rep2)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,6)")).cast("double")
              .as("sum_value"))
          .orderBy("event_type")
          .write.format("noop").mode("overwrite").save())
      graft.streaming.StreamTune.dropScratch(ckpt)
    }
    spark.stop()
  }
}
