package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JSONOptionsInRead, JacksonParser}
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

  /** A per-task line parser for `schema` (executor-side construction:
    * JacksonParser is not serializable — call this inside the
    * partition reader, not on the driver). Rows are copied out of the
    * parser's reused buffer. Parsing only the pruned `schema` is what
    * makes DSv2 column pruning real work-skipping here: Jackson
    * skips the untouched fields token-by-token. */
  def lineParser(schema: StructType): String => Iterator[InternalRow] = {
    val opts = new JSONOptionsInRead(
      Map.empty[String, String], "UTC", "_corrupt_record")
    val parser = new JacksonParser(schema, opts,
      allowArrayAsStructs = false, Seq.empty)
    line =>
      parser.parse[String](line, CreateJacksonParser.string,
        UTF8String.fromString).iterator.map(_.copy())
  }
}
