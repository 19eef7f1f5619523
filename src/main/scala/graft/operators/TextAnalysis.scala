package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Text-analysis operators for a training-data pipeline
  * (builder-prompt family): language ID, quality scoring, token
  * counting, document fingerprinting. All pure built-in expressions —
  * codegen-friendly, no UDFs — and all portable to an ANSI/DuckDB
  * oracle.
  */
object TextAnalysis {

  /** Tiny per-language stopword profiles for the n-gram/stopword
    * language-ID heuristic. (Real pipelines use character-n-gram
    * models; the mechanism — profile intersection scoring — is the
    * same and the operator shape identical.) */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "en", "es", "un"),
    "fr" -> Seq("le", "la", "de", "et", "en", "est", "un"),
    "de" -> Seq("der", "die", "das", "und", "in", "ist", "ein"))

  /** Predicted language: the profile with the largest distinct-token
    * intersection; ties and zero-score docs fall back to "und"
    * (undetermined), then first-profile order. */
  def langId(text: Column): Column = {
    val toks = array_distinct(TextFns.tokens(lower(text)))
    val scores = langProfiles.map { case (lang, words) =>
      lang -> size(array_intersect(toks, array(words.map(lit): _*)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Heuristic quality score in [0,1]: rewards moderate length,
    * penalizes non-alphabetic density, rewards stopword presence —
    * the standard cheap quality gate shape (length/punct/stopword
    * ratios). */
  def qualityScore(text: Column): Column = {
    val n = length(text).cast("double")
    val lenScore = least(n / 500.0, lit(1.0))
    val punctRatio = TextFns.nonAlphaCount(text).cast("double") / greatest(n, lit(1.0))
    val stops = array(Seq("the", "a", "of", "and", "to", "in", "is").map(lit): _*)
    val stopRatio =
      size(array_intersect(array_distinct(TextFns.tokens(lower(text))), stops))
        .cast("double") / 7.0
    round(greatest(least(
      lenScore * 0.4 + (lit(1.0) - least(punctRatio * 4.0, lit(1.0))) * 0.3 +
        stopRatio * 0.3, lit(1.0)), lit(0.0)), 6)
  }

  /** Per-document token statistics: whitespace tokens, distinct
    * tokens, BPE-ish subword count, character count, mean token
    * length. */
  def tokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = TextFns.tokens(t)
    df.select(
        col(idCol),
        size(toks).as("n_tokens"),
        size(array_distinct(toks)).as("n_distinct_tokens"),
        TextFns.bpeishTokenCount(t).as("n_subwords"),
        length(t).as("n_chars"),
        length(TextFns.normWs(t)).cast("long").as("__norm_len"))
      // exact integer half-up mean at 6 decimals (engine-portable)
      .withColumn("mean_token_len",
        expr("""cast((2 * 1000000 * __norm_len + greatest(n_tokens, 1))
                     div (2 * greatest(n_tokens, 1)) as double) / 1000000.0"""))
      .drop("__norm_len")
  }

  /** Duplicated-span coverage (the exact-substring dedup signal of
    * Lee et al., "Deduplicating Training Data Makes Language Models
    * Better"): per document, the count and ppm fraction of k-token
    * span POSITIONS whose exact span occurs in at least one OTHER
    * document — the removal criterion of suffix-array dedup,
    * re-expressed relationally. Cross-doc presence is min != max of
    * the id over a span-key window: ONE shuffle on the span key plus
    * one per-doc regroup, never a self-join and no distinct-count
    * state. At corpus scale the span key would be xxhash64(span) to
    * shrink shuffle width; kept as the raw string so an external
    * engine recomputes it. Documents shorter than k tokens have no
    * spans and are excluded. */
  def dupSpanStats(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val spans = df.select(col(idCol), TextFns.tokens(col(textCol)).as("__toks"))
      .where(size(col("__toks")) >= k)
      .select(col(idCol),
        explode(transform(sequence(lit(1), size(col("__toks")) - (k - 1)),
          i => array_join(slice(col("__toks"), i, lit(k)), " "))).as("__span"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("__span")
    spans
      .withColumn("__dup", min(col(idCol)).over(w) =!= max(col(idCol)).over(w))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_spans"),
        count(when(col("__dup"), 1)).as("n_dup_spans"))
      .withColumn("dup_ppm",
        expr("(2 * 1000000 * n_dup_spans + n_spans) div (2 * n_spans)"))
  }

  /** Document fingerprints: rolling content hash (order-sensitive) +
    * md5 of the normalized text (exact-dup key). */
  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      TextFns.rollingFingerprint(col(textCol)).as("rolling_fp"),
      md5(TextFns.normWs(col(textCol))).as("md5_fp"))

  /** PII redaction patterns, restricted to the syntax subset Java
    * regex and RE2 agree on (no lookaround, literal '-' last in
    * classes) so the oracle replays them verbatim. Application order
    * matters and is encoded in [[redactPii]]: URL before EMAIL
    * (URLs may embed '@'), IPV4 before PHONE (an IP is digits and
    * dots, which the phone pattern would otherwise swallow). */
  val urlRe = "https?://[^ ]+"
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val phoneRe = "\\+?[0-9][0-9().-]{5,}[0-9]"

  /** The shared md5 bucket in [0, 1000): the single expression
    * [[stableSplit]], [[mixtureSample]], and the stratified sampler
    * all derive from, so they can never drift from each other or
    * their oracle twins. */
  def stableBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % 1000

  /** Deterministic, growth-stable train/val/test assignment: the id
    * hashes (md5, engine-recomputable) into one of 1000 buckets and
    * cumulative percentage ranges pick the split. Properties that
    * matter at pipeline scale: adding documents NEVER reassigns
    * existing ones (row_number or sample() would), reruns are
    * bit-identical with no seed plumbing, and any engine arrives at
    * the same assignment for audit. */
  def stableSplit(id: Column, trainPct: Int = 90, valPct: Int = 5): Column = {
    val bucket = stableBucket(id)
    when(bucket < trainPct * 10, "train")
      .when(bucket < (trainPct + valPct) * 10, "val")
      .otherwise("test")
  }

  /** Within-document repetition signals (the Gopher/C4 crawl-quality
    * rules): fraction of duplicate trigrams and the most-frequent
    * token's share of the document. Trigram stats are expression-only
    * (distinct-shingle array vs. multiset count); the token share
    * needs one key shuffle (per-doc token counts). Ratios use the
    * exact integer half-up division so both engines agree to the
    * bit. */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // ONE widened scan feeds both branches. The trigram branch is
    // expression-dense (full trigram array + array_distinct per row);
    // on a single-row-group input it would otherwise evaluate on ONE
    // core (observed 3.6s vs 0.2s at sf0.1).
    val sdf = graft.sources.Tables.scaled(df)
    val toks = sdf
      .select(col(idCol), explode(TextFns.tokens(col(textCol))).as("__t"))
    val tokAgg = toks.groupBy(idCol, "__t").agg(count(lit(1)).as("__c"))
      .groupBy(idCol).agg(max("__c").as("__maxc"), sum("__c").as("__n"))
    val tri = sdf.select(col(idCol),
      size(TextFns.shingles(col(textCol), 3)).cast("long").as("__td"),
      greatest(size(TextFns.tokens(col(textCol))) - 2, lit(0)).cast("long").as("__tt"))
    tri.join(tokAgg, Seq(idCol))
      .select(col(idCol),
        when(col("__tt") === 0, lit(0.0)).otherwise(
          expr("cast((2 * 1000000 * (__tt - __td) + __tt) div (2 * __tt) as double) / 1000000.0"))
          .as("dup_trigram_ratio"),
        expr("cast((2 * 1000000 * __maxc + __n) div (2 * __n) as double) / 1000000.0")
          .as("top_token_ratio"))
  }

  /** GPT-style sequence packing: concatenate documents in a
    * deterministic order and assign each to the `budget`-token pack
    * where its first token falls (pack_id = start_offset div budget).
    * Whole documents are assigned, not split — the streaming-pack
    * variant every data loader implements.
    *
    * Scale shape: packing is per SHARD (contiguous id ranges), so the
    * running-sum window partitions by shard — no global sort, shards
    * pack in parallel, and shard boundaries are stable under corpus
    * growth within earlier shards. */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    budget: Int, shardSize: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NULL text must stay NULL (not size()'s non-ANSI -1 sentinel):
    // SQL running sums skip NULL in both engines, so a null doc gets
    // null pack columns without corrupting later docs' offsets.
    val base = graft.sources.Tables.scaled(df).select(col(idCol),
      expr(s"cast($idCol as bigint) div $shardSize").as("shard"),
      when(col(textCol).isNull, lit(null).cast("long"))
        .otherwise(size(TextFns.tokens(col(textCol))).cast("long")).as("n_tokens"))
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("__start", sum("n_tokens").over(w) - col("n_tokens"))
      .select(col(idCol), col("shard"),
        expr(s"__start div $budget").as("pack_id"),
        (col("__start") % budget).as("pack_offset"),
        col("n_tokens"))
  }

  /** Fixed-size document chunking: split each document into
    * consecutive `chunkSize`-token windows (the context-window
    * preparation step before packing/tokenization). All array work
    * happens inside ONE projection (sequence → transform → explode) —
    * no shuffle, chunk count per row is ⌈n/chunkSize⌉, and order
    * within a doc is carried by an explicit chunk_idx rather than
    * implicit row order (which a shuffle would destroy). */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     chunkSize: Int): DataFrame = {
    val c = chunkSize
    // NULL text drops the row (explode of an empty array), matching
    // the oracle's unnest-over-NULL-range. Without the guard, size()
    // returns the non-ANSI -1 sentinel and sequence(0, -1) would
    // DESCEND, emitting garbage chunk_idx -1 rows.
    graft.sources.Tables.scaled(df)
      .select(col(idCol), TextFns.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .select(col(idCol), col("__n"),
        explode(expr(
          s"""CASE WHEN __toks IS NULL
               THEN array()
               ELSE transform(sequence(0, cast((__n + ${c - 1}) div $c as int) - 1),
                 i -> struct(cast(i as bigint) as chunk_idx,
                             concat_ws(' ', slice(__toks, i * $c + 1, $c)) as chunk_text))
               END"""))
          .as("__c"))
      .select(col(idCol),
        col("__c.chunk_idx"),
        col("__c.chunk_text"),
        least(lit(c.toLong), col("__n") - col("__c.chunk_idx") * c)
          .cast("long").as("n_chunk_tokens"))
  }

  /** C4-style PARAGRAPH-level exact dedup with document
    * reconstruction (Raffel et al. 2020 §2.2 dedups three-sentence
    * spans corpus-wide; the reference repo dedups whole listings
    * only — this is the sub-document granularity a training-data
    * pipeline needs). Every document is split into consecutive
    * `chunkSize`-token paragraphs via [[chunkDocuments]]; for each
    * DISTINCT paragraph text exactly one occurrence survives
    * corpus-wide — the lexicographically smallest (document,
    * position); documents are then reassembled from their surviving
    * paragraphs in original order.
    *
    * Output per input document: `n_paragraphs`, `n_kept`,
    * `kept_tokens`, and `text_md5` of the reassembled text (md5 so a
    * DuckDB oracle verifies the reconstruction byte-for-byte without
    * hauling the full text through the comparator).
    *
    * Scale shape: winner election is ONE hash shuffle keyed on the
    * md5 paragraph fingerprint; the winner set (one row per distinct
    * paragraph) joins back on the same key — its aggregate output is
    * already hash-partitioned on the fingerprint, so only the chunk
    * side shuffles; reassembly shuffles (id, idx, text) triples once
    * on the document key. The corpus is never self-joined, nothing
    * is collected. The winner aggregate buffers a 2-field struct,
    * which deliberately plans as a partial+final SortAggregate
    * (struct buffers aren't hash-mutable) — the classic
    * sort-by-fingerprint dedup; the per-doc reassembly plans as an
    * ObjectHashAggregate (collect_list buffer), plan-pinned in
    * PlanShapeSpec. */
  def paragraphDedup(df: DataFrame, idCol: String, textCol: String,
                     chunkSize: Int): DataFrame = {
    val chunks = chunkDocuments(df, idCol, textCol, chunkSize)
      .withColumn("__fp", md5(col("chunk_text")))
    val winners = chunks
      .groupBy("__fp")
      .agg(min(struct(col(idCol), col("chunk_idx"))).as("__w"))
    chunks.join(winners, "__fp")
      .withColumn("keep",
        col(idCol) === col(s"__w.$idCol") &&
          col("chunk_idx") === col("__w.chunk_idx"))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_paragraphs"),
        count(when(col("keep"), lit(1))).as("n_kept"),
        coalesce(sum(when(col("keep"), col("n_chunk_tokens"))), lit(0L))
          .as("kept_tokens"),
        md5(concat_ws(" ",
          transform(
            array_sort(collect_list(
              when(col("keep"), struct(col("chunk_idx"), col("chunk_text"))))),
            x => x.getField("chunk_text")))).as("text_md5"))
  }

  /** Deterministic mixture sampling: down-sample each group (e.g.
    * language or source domain) to a target rate so the kept corpus
    * matches a prescribed mixture. Keep decision = the document's
    * stable md5 bucket (see [[stableSplit]]) falling under the
    * group's rate×1000 threshold — a pure per-row projection: no
    * shuffle, no sample() nondeterminism, reproducible and
    * engine-auditable at any corpus size; unlisted groups drop. */
  def mixtureSample(df: DataFrame, idCol: String, groupCol: String,
                    rates: Map[String, Double]): DataFrame = {
    val bucket = stableBucket(col(idCol))
    // Integer thresholds: r * 1000 in doubles is off-by-one-ulp for
    // rates like 0.115 (114.99999...), silently shifting the cutoff
    // bucket; rounding to an integer keeps the documented
    // "rate x 1000 buckets" semantics exact for every rate.
    val threshold = rates.foldLeft(lit(0L)) { case (acc, (g, r)) =>
      when(col(groupCol) === g, lit(math.round(r * 1000))).otherwise(acc)
    }
    df.where(bucket < threshold)
  }

  /** Benchmark decontamination: flag corpus documents sharing at
    * least `minOverlap` distinct word n-grams with an eval-set n-gram
    * frame (column `s`) — the GPT-3/Pile recipe (one global eval
    * n-gram set, n-gram-overlap threshold per training doc).
    *
    * Scale shape: benchmark suites are MBs while the corpus is TBs,
    * so the eval n-gram set is BROADCAST — the corpus-side postings
    * never shuffle; the only wide op is the per-doc overlap count,
    * whose input is already filtered to matching postings (a tiny
    * fraction of the corpus). */
  def contaminationFlags(df: DataFrame, idCol: String, textCol: String,
                         evalNgrams: DataFrame, n: Int,
                         minOverlap: Int): DataFrame = {
    val post = graft.sources.Tables.scaled(df)
      .select(col(idCol), explode(TextFns.shingles(col(textCol), n)).as("s"))
    val overlap = post
      .join(broadcast(evalNgrams.select(col("s")).distinct()), "s")
      .groupBy(idCol).agg(count(lit(1)).as("n_overlap"))
    df.select(col(idCol))
      .join(overlap, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("contaminated", col("n_overlap") >= minOverlap)
  }

  /** Okapi BM25 (Lucene idf variant) document scores for a FIXED
    * query-term set, over a pre-tokenized (doc_id, term) relation.
    * Scale shape: the query-term filter collapses the fact side to
    * ~|Q| rows per doc before any aggregate, df and avgdl are driver
    * scalars, and each document's score sums its per-term
    * contributions in FIXED written order (conditional aggregates,
    * never sum-over-rows of doubles) so the result is
    * bit-reproducible across engines and partitionings. Only
    * documents holding ≥1 query term are scored. Returns
    * (doc_id, score), score rounded to 6. */
  def bm25Scores(toks: org.apache.spark.sql.DataFrame, nDocs: Long,
                 terms: Seq[String], k1: Double = 1.2,
                 b: Double = 0.75): org.apache.spark.sql.DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    require(terms.distinct.size == terms.size,
      s"duplicate query terms: $terms")
    val len = toks.groupBy("doc_id").agg(count(lit(1)).as("__len"))
    val avgdl = len.agg(avg(col("__len"))).head().getDouble(0)
    val tf = toks.where(col("term").isin(terms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("__tf"))
    val dfMap = tf.groupBy("term").agg(count(lit(1)).as("__df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap // |Q| rows
    bm25ScoresFromTf(tf, len, nDocs, avgdl, dfMap, terms, k1, b)
  }

  /** BM25 from PRE-AGGREGATED relations — the persisted-index serving
    * path ([[bm25Scores]] delegates here, so recompute and index
    * produce bit-identical doubles): `tf` is (doc_id, term, __tf)
    * already restricted to the query terms, `len` is (doc_id, __len),
    * and nDocs/avgdl/df come from the index's stats, not a corpus
    * pass. */
  def bm25ScoresFromTf(tf: org.apache.spark.sql.DataFrame,
                       len: org.apache.spark.sql.DataFrame,
                       nDocs: Long, avgdl: Double,
                       dfMap: Map[String, Long], terms: Seq[String],
                       k1: Double = 1.2, b: Double = 0.75)
      : org.apache.spark.sql.DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    // internal columns are INDEX-named: a term is arbitrary user text
    // ("a.b", backticks) that must never reach a column reference
    val wide = tf.groupBy("doc_id").agg(
      sum(when(col("term") === terms.head, col("__tf"))).as("__tf_0"),
      terms.tail.zipWithIndex.map { case (t, i) =>
        sum(when(col("term") === t, col("__tf"))).as(s"__tf_${i + 1}")
      }: _*)
    val contrib = terms.zipWithIndex.map { case (t, i) =>
      val dfv = dfMap.getOrElse(t, 0L).toDouble
      val tfc = col(s"__tf_$i")
      // mirror the oracle's literal text exactly: same association,
      // same constants — ln((N - df + 0.5)/(df + 0.5) + 1) Lucene idf
      when(tfc.isNotNull,
        log(lit((nDocs - dfv + 0.5) / (dfv + 0.5) + 1.0)) *
          (tfc * lit(k1 + 1)) /
          (tfc + lit(k1) * (lit(1.0) - lit(b) +
            lit(b) * col("__len") / lit(avgdl))))
        .otherwise(lit(0.0))
    }.reduce(_ + _)
    wide.join(len, "doc_id")
      .withColumn("score", round(contrib, 6))
      .select("doc_id", "score")
  }

  /** Sequential in-place masking: URL → EMAIL → IPV4 → PHONE. Pure
    * codegen'd regexp_replace chain — one projection, no UDF. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(c, urlRe, "<URL>"),
          emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")
}
