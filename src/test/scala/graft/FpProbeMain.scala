package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical semantics probe for TextFns.rollingFingerprint edge
  * inputs (diagnostic only): prints the HOF chain's value plus the
  * intermediate split/ascii shapes for ASCII, accents, surrogates,
  * empties — the ground truth a faster expression must reproduce. */
object FpProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val rows = Seq(
      "abc", "", " ", "a", "héllo", "€5", "x😀y", // euro, emoji
      "😀", "tab\tnl\n", "ωmega").toDF("t")
    val out = rows.select(col("t"),
      graft.functions.TextFns.rollingFingerprint(col("t")).as("fp"),
      size(split(col("t"), "")).as("n_pieces"),
      transform(split(col("t"), ""), ch => ascii(ch).cast("long")).as("codes"))
    out.collect().foreach { r =>
      println(s"t=${r.getString(0).codePoints().toArray.mkString("[", ",", "]")} " +
        s"fp=${r.getLong(1)} n=${r.getInt(2)} codes=${r.getSeq[Long](3)}")
    }
    // also: does the docs corpus carry any non-ASCII at each SF?
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      val n = d.where(col("text").rlike("[^\\x00-\\x7F]")).count()
      val empty = d.where(length(col("text")) === 0 || col("text").isNull).count()
      println(s"$sf nonascii_docs=$n empty_or_null=$empty")
    }
    spark.stop()
  }
}
