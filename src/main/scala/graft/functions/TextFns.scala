package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-normalization and tokenization building blocks (reference
  * scalar-function families F1–F3 — dbt/models/staging/
  * stg_properties.sql:88-95, scripts/normalize_csv.py:81-83 — plus the
  * builder-prompt text-analysis extensions).
  *
  * All expressions here are Spark built-ins (codegen'd, no UDFs) and
  * deliberately restricted to constructs with exact ANSI-SQL / DuckDB
  * equivalents, so every derived query can be oracle-checked.
  */
object TextFns {

  /** Collapse runs of whitespace and trim — the reference's
    * `regexp_replace(s,'\\s+',' ')` + `trim` normalization
    * (stg_properties.sql:88-91). */
  def normWs(c: Column): Column = trim(regexp_replace(c, "\\s+", " "))

  /** Whitespace tokens of a normalized string. */
  def tokens(c: Column): Column = split(normWs(c), " ")

  /** ALL word n-gram occurrences in order ("a b a b", n=2 ->
    * ["a b","b a","a b"]). Empty array when the document has fewer
    * than n tokens (guarded — Spark's `sequence` would otherwise
    * descend). */
  def ngrams(c: Column, n: Int): Column = {
    val ts = tokens(c)
    val count = size(ts) - (n - 1)
    when(count <= 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), greatest(count, lit(1))),
        i => concat_ws(" ", slice(ts, i, lit(n)))))
  }

  /** Distinct word n-gram shingles — the set view of [[ngrams]] (the
    * Jaccard/MinHash currency). */
  def shingles(c: Column, n: Int): Column = array_distinct(ngrams(c, n))

  /** BPE-ish pre-tokenizer segmentation: runs of letters, runs of
    * digits, or single punctuation — the classic pre-tokenizer regex,
    * as the piece array. */
  def bpeishPieces(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  /** Count view of [[bpeishPieces]]. */
  def bpeishTokenCount(c: Column): Column = size(bpeishPieces(c))

  /** Punctuation+digit character count (anything outside [a-z ] after
    * lowercasing) — building block for quality scoring. */
  def nonAlphaCount(c: Column): Column =
    length(lower(c)) - length(regexp_replace(lower(c), "[^a-z ]", ""))

  /** Polynomial rolling-hash fingerprint of the character stream:
    * fold(a[0], (acc, ch) => (acc*131 + ascii(ch)) mod 1e9+7).
    * Deterministic, order-sensitive (unlike a token-set hash), and
    * portable (DuckDB: list_reduce over ascii codes). Served by the
    * codegen'd [[RollingFp]] expression — one primitive loop per row
    * instead of the split/transform/aggregate HOF chain (a one-char
    * UTF8String allocation per character plus three interpreted
    * lambdas per element); RollingFpSpec pins bit-equality of the two
    * spellings, [[rollingFingerprintHof]] keeps the reference. */
  def rollingFingerprint(c: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      RollingFp(org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)))

  /** The original higher-order-function spelling — the semantics
    * reference [[RollingFp]] must match bit-for-bit (spec-pinned). */
  private[graft] def rollingFingerprintHof(c: Column): Column = {
    val codes = transform(split(c, ""), ch => ascii(ch).cast("long"))
    when(size(codes) === 0, lit(0L)).otherwise(
      aggregate(slice(codes, lit(2), greatest(size(codes) - 1, lit(0))),
        element_at(codes, 1),
        (acc, x) => pmod(acc * 131L + x, lit(1000000007L))))
  }
}
