package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.VectorFns

class VectorFnsSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  test("codegen dot product equals the higher-order-function fold") {
    val df = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
      (Seq(0.1f, -0.2f), Seq(0.3f, 0.4f)),
      (Seq.empty[Float], Seq.empty[Float])
    ).toDF("a", "b")
    def d(x: org.apache.spark.sql.Column) = transform(x, v => v.cast("double"))
    val hof = aggregate(zip_with(d(col("a")), d(col("b")), (u, v) => u * v),
      lit(0.0), (acc, v) => acc + v)
    val rows = df.select(VectorFns.dot(col("a"), col("b")).as("cg"), hof.as("hof"))
      .as[(Double, Double)].collect()
    rows.foreach { case (cg, h) => assert(cg == h) }
    assert(rows.head._1 == 32.0)
  }

  test("length-mismatched arrays yield NULL (zip_with twin semantics)") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f))).toDF("a", "b")
    assert(df.select(VectorFns.dot(col("a"), col("b"))).head.isNullAt(0))
  }

  test("zero-norm vectors give NULL cosine, never NaN") {
    val df = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    assert(df.select(VectorFns.cosine(col("a"), col("b"))).head.isNullAt(0))
  }

  test("dot product is null-safe") {
    val df = Seq(
      (Some(Seq(1.0f)), None: Option[Seq[Float]])
    ).toDF("a", "b")
    val out = df.select(VectorFns.dot(col("a"), col("b")).as("d")).collect()
    assert(out.head.isNullAt(0))
  }

  test("interpreted path (codegen off) matches codegen path") {
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val v = Seq((Seq(1.5f, 2.5f), Seq(2.0f, 4.0f))).toDF("a", "b")
        .select(VectorFns.dot(col("a"), col("b"))).as[Double].head()
      assert(v == 13.0)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
