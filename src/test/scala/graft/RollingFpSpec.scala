package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins bit-equality between the codegen'd RollingFp expression and
  * the original higher-order-function spelling it replaced (r16
  * optimization: llm_fingerprints' per-char lambda chain → one
  * primitive loop). Any drift here is a silent corpus-fingerprint
  * corruption, so the matrix covers the fold's edges: empty, single
  * char, whitespace, accents (2-byte UTF-8), BMP non-Latin, and
  * supplementary-plane code points (surrogate pairs, which split("")
  * keeps whole), plus a real corpus slice. */
class RollingFpSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  test("RollingFp equals the HOF chain on the edge-input matrix") {
    val rows = Seq(
      "abc", "", " ", "a", "héllo", "€5", "x😀y", "😀",
      "tab\tnl\n", "ωmega", "a" * 5000, "0" * 3,
      "mixed ascii with € and 😀 inside a longer sentence.",
      null.asInstanceOf[String]).toDF("t")
    val both = rows.select(
      graft.functions.TextFns.rollingFingerprint(col("t")).as("fast"),
      graft.functions.TextFns.rollingFingerprintHof(col("t")).as("ref"))
      .collect()
    both.zipWithIndex.foreach { case (r, i) =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null drift at row $i")
      if (!r.isNullAt(0))
        assert(r.getLong(0) == r.getLong(1), s"fp drift at row $i")
    }
  }

  test("RollingFp equals the HOF chain over the sf0.001 corpus") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val drift = d.select(
        graft.functions.TextFns.rollingFingerprint(col("text")).as("fast"),
        graft.functions.TextFns.rollingFingerprintHof(col("text")).as("ref"))
      .where(not(col("fast") <=> col("ref")))
      .count()
    assert(drift == 0L)
  }
}
