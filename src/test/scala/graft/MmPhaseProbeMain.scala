package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Phase timers for multimodal_binary_ingest (diagnostic only). */
object MmPhaseProbeMain {
  def main(a: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false") // match Bench's session
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def timed[T](l: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  [mm] $l%-18s ${(System.nanoTime()-t0)/1e9}%7.3f s"); r }
    (1 to 2).foreach { p =>
      println(s"== pass $p ==")
      val base = graft.sources.Ingest.fixtureDir(dir) + "/bmp_files"
      val basePath = new org.apache.hadoop.fs.Path(base)
      val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      timed("delete")(fs.delete(basePath, true))
      timed("write blobs")(
        graft.operators.Multimodal.bmpCorpus(
            graft.sources.Tables.load(spark, dir, "customer"), "c_custkey")
          .foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
            val d = java.nio.file.Paths.get(base)
            java.nio.file.Files.createDirectories(d)
            it.foreach { r =>
              java.nio.file.Files.write(d.resolve(s"media-${r.getLong(0)}.bmp"),
                r.getAs[Array[Byte]](1)) } })
      val media = timed("plan read")(spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bmp").load(base)
        .select(regexp_extract(col("path"), "media-(\\d+)\\.bmp$", 1)
          .cast("long").as("media_id"),
          col("length").as("n_bytes"), col("content").as("media")))
      timed("decode+noop")(
        graft.operators.Multimodal.decodeBmpStatsWithLength(media)
          .select("media_id", "n_bytes", "width", "height",
            "sum_r", "sum_g", "sum_b", "topright_r")
          .orderBy("media_id")
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
