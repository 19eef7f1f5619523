package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the Spark-4 SQL surface added in round 9's continuation:
  * VARIANT path extraction, collated strings, pipe-syntax queries,
  * and the exact-sum regression family.
  *
  * These pin SEMANTICS the registry hash cannot see in isolation:
  * missing-path vs JSON-null for variant, case-folding equality under
  * UTF8_LCASE (incl. Vietnamese diacritics), pipe/classic plan
  * equivalence, and closed-form regression on a planted exact line.
  */
class ModernSqlSpec extends AnyFunSuite {
  import SparkTestBase._

  test("variant: missing path is SQL NULL, JSON null is variant null") {
    val r = spark.sql(
      """SELECT variant_get(v, '$.missing', 'long') AS m,
                variant_get(v, '$.b', 'long')       AS jn,
                is_variant_null(variant_get(v, '$.b'))       AS jn_is_vnull,
                is_variant_null(variant_get(v, '$.missing')) AS m_is_vnull,
                try_variant_get(v, '$.s', 'long')   AS wrong_type
         FROM (SELECT parse_json('{"a": 1, "b": null, "s": "xx"}') AS v)""")
      .head()
    assert(r.isNullAt(0), "missing path must extract to SQL NULL")
    assert(r.isNullAt(1), "JSON null must extract to SQL NULL")
    assert(r.getBoolean(2), "JSON null must be variant-null")
    assert(!r.getBoolean(3), "missing path must NOT be variant-null")
    assert(r.isNullAt(4), "try_variant_get on a type mismatch must be NULL")
  }

  test("variant: JSON numbers round-trip as exact decimals") {
    val r = spark.sql(
      """SELECT variant_get(parse_json('{"p": 6.55}'), '$.p', 'decimal(12,2)')
           AS p""").head()
    assert(r.getDecimal(0) == new java.math.BigDecimal("6.55"))
  }

  test("UTF8_LCASE equality and grouping fold Vietnamese case variants") {
    val eq = spark.sql(
      "SELECT collate('ĐÀ NẴNG', 'UTF8_LCASE') = collate('Đà Nẵng', 'UTF8_LCASE') AS ci, " +
        "'ĐÀ NẴNG' = 'Đà Nẵng' AS bin").head()
    assert(eq.getBoolean(0), "UTF8_LCASE must equate case variants")
    assert(!eq.getBoolean(1), "UTF8_BINARY must distinguish them")

    // grouping under the collation == grouping by lower(): same
    // group count, same sizes
    val d = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(when(col("doc_id") % 2 === 0, upper(col("source")))
        .otherwise(col("source")).as("k"))
    val collated = d.groupBy(expr("collate(k, 'UTF8_LCASE')")).count()
      .select(count(lit(1)), sum("count")).head()
    val lowered = d.groupBy(lower(col("k"))).count()
      .select(count(lit(1)), sum("count")).head()
    assert(collated == lowered)
  }

  test("pipe-syntax query equals the classic formulation exactly") {
    graft.sources.Tables.registerViews(spark, sfDir)
    val pipe = spark.sql(
      """FROM lineitem
         |> WHERE l_quantity >= 25.0
         |> AGGREGATE count(*) AS n GROUP BY l_returnflag
         |> ORDER BY l_returnflag""")
    val classic = graft.sources.Tables.load(spark, sfDir, "lineitem")
      .where(col("l_quantity") >= 25.0)
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .orderBy("l_returnflag")
    assert(pipe.collect().toSeq == classic.collect().toSeq)
  }

  test("regr family recovers a planted exact line with r2 = 1") {
    import spark.implicits._
    // y = 3x + 10 on small integers: every moment is integer-exact in
    // double, so the closed forms must come out EXACTLY 3, 10, 1.
    val xs = (1 to 200).map(x => (x.toDouble, 3.0 * x + 10.0))
    val df = xs.toDF("x", "y")
    val n = col("n"); val sx = col("sx"); val sy = col("sy")
    val sxx = col("sxx"); val sxy = col("sxy"); val syy = col("syy")
    val covn = n * sxy - sx * sy
    val varx = n * sxx - sx * sx
    val vary = n * syy - sy * sy
    val slope = covn / varx
    val r = df.agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
      .select(slope.as("slope"), ((sy - slope * sx) / n).as("intercept"),
        (covn * covn / (varx * vary)).as("r2"))
      .head()
    assert(r.getDouble(0) == 3.0 && r.getDouble(1) == 10.0 &&
      r.getDouble(2) == 1.0, s"got $r")
  }
}
