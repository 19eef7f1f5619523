package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** `df.observe` — data-quality metrics collected DURING the one pass
  * that computes the result, instead of a second scan (the dbt-test
  * pattern at zero extra IO: at 100 TB a separate validation query
  * doubles the read). Metrics must equal what a dedicated aggregation
  * pass computes. */
class ObservationSpec extends AnyFunSuite {
  import SparkTestBase._

  test("observed metrics equal a dedicated aggregation pass, same scan") {
    val ev = graft.sources.Tables.load(spark, sfDir, "events")
    val obs = Observation("dq")
    // the production write path: result materializes, metrics ride along
    val result = ev.observe(obs,
        count(lit(1)).as("n_rows"),
        count(col("value")).as("n_value_set"),
        sum(col("value").cast("decimal(18,6)")).as("sum_value"))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect()
    assert(result.nonEmpty)

    val direct = ev.agg(
      count(lit(1)), count(col("value")),
      sum(col("value").cast("decimal(18,6)"))).collect()(0)
    assert(obs.get("n_rows") == direct.getLong(0))
    assert(obs.get("n_value_set") == direct.getLong(1))
    assert(obs.get("sum_value") == direct.getDecimal(2))
  }
}
