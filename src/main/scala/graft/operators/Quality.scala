package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** dbt-schema-test equivalents (SURVEY §5): each check compiles to a
  * query that must return zero rows, exactly like dbt's generated SQL
  * (`SELECT key FROM t GROUP BY key HAVING count(*) > 1`, etc. —
  * dbt/models/staging/schema.yml:8-51, dbt/models/marts/schema.yml).
  */
object Quality {

  /** Offending keys for a `unique` test — empty result = pass. */
  def uniqueViolations(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n_rows"))
      .where(col("n_rows") > 1)

  /** Offending rows for a `not_null` test — empty result = pass. */
  def notNullViolations(df: DataFrame, column: String): DataFrame =
    df.where(col(column).isNull)

  /** Offending rows for an `accepted_values` test. */
  def acceptedValuesViolations(df: DataFrame, column: String, accepted: Seq[String]): DataFrame =
    df.where(!col(column).isin(accepted: _*) || col(column).isNull)

  /** Run all three families and return a single summary frame
    * (check_name, n_violations) — the shape of the reference's
    * `dbt_test` stage output.
    */
  def report(df: DataFrame, uniqueKeys: Seq[String], notNullCols: Seq[String],
             accepted: Map[String, Seq[String]]): DataFrame = {
    val checks: Seq[(String, DataFrame)] =
      uniqueKeys.map(k => s"unique_$k" -> uniqueViolations(df, k)) ++
      notNullCols.map(c => s"not_null_$c" -> notNullViolations(df, c)) ++
      accepted.toSeq.map { case (c, vs) => s"accepted_values_$c" -> acceptedValuesViolations(df, c, vs) }
    checks.map { case (name, d) =>
      d.agg(count(lit(1)).as("n_violations")).select(lit(name).as("check_name"), col("n_violations"))
    }.reduce(_.unionByName(_))
  }
}
