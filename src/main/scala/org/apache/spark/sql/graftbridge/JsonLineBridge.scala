package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JSONOptionsInRead, JacksonParser}
import org.apache.spark.sql.catalyst.util.{FailureSafeParser, PermissiveMode}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** Bridge into Spark's `private[sql]` Jackson JSON-line machinery —
  * the same parser the builtin JSON file source runs per line, here
  * reused by the custom paged-JSON DataSource V2
  * (`graft.sources.PagedJsonSource`) so the custom source gets
  * identical type coercion, null handling, and number parsing to
  * `spark.read.json` without re-implementing a JSON reader.
  */
object JsonLineBridge {

  /** The session timezone to capture DRIVER-side and hand to
    * [[lineParser]], so executor-side parsing of zone-less timestamps
    * matches the builtin source under any session timezone. */
  def sessionTimeZone: String =
    org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone

  /** The builtin JSON source's pushdown gate
    * (spark.sql.json.filterPushdown) — honored here too, so the
    * escape hatch users reach for on a JsonFilters mis-skip applies
    * to the custom source exactly as to `spark.read.json`. */
  def jsonFilterPushdownEnabled: Boolean =
    org.apache.spark.sql.internal.SQLConf.get.jsonFilterPushDown

  /** The subset of `filters` the parser can actually evaluate against
    * `schema` (top-level, convertible references) — what the builtin
    * source REPORTS as pushed; everything else is silently dropped by
    * StructFilters at parse time and must not be advertised. */
  def convertibleFilters(
      filters: Array[org.apache.spark.sql.sources.Filter],
      schema: StructType): Array[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.catalyst.StructFilters.pushedFilters(filters, schema)

  /** A per-task line parser for `schema` (executor-side construction:
    * JacksonParser is not serializable — call this inside the
    * partition reader, not on the driver). Rows are copied out of the
    * parser's reused buffer. Parsing only the pruned `schema` is what
    * makes DSv2 column pruning real work-skipping here: Jackson
    * skips the untouched fields token-by-token; `filters` (which the
    * scan keeps RESIDUAL — Spark re-applies them above, so they are
    * a skip optimization, never a correctness dependency) let the
    * parser drop failing rows mid-parse, the builtin JSON source's
    * own pushdown mechanism. Malformed lines go through the same
    * [[FailureSafeParser]] as the builtin source in PERMISSIVE
    * mode — a garbage line yields an all-null row instead of killing
    * the task with an internal BadRecordException. */
  def lineParser(schema: StructType, timeZoneId: String,
                 filters: Seq[org.apache.spark.sql.sources.Filter] = Seq.empty)
      : String => Iterator[InternalRow] = {
    val opts = new JSONOptionsInRead(
      Map.empty[String, String], timeZoneId, "_corrupt_record")
    val raw = new JacksonParser(schema, opts,
      allowArrayAsStructs = false, filters)
    val safe = new FailureSafeParser[String](
      line => raw.parse[String](line, CreateJacksonParser.string,
        UTF8String.fromString),
      PermissiveMode, schema, "_corrupt_record")
    line => safe.parse(line).map(_.copy())
  }
}
