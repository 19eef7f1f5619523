package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.operators.Multimodal
import graft.sources.{Ingest, Tables}

class TextMultimodalSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  test("rolling fingerprint matches a direct Scala fold") {
    val samples = Seq("hello world", "a", "", "spark graft engine 42")
    def expected(s: String): Long =
      s.foldLeft(0L)((acc, ch) => (acc * 131 + ch.toLong) % 1000000007L)
    val df = samples.toDF("text")
      .select(TextFns.rollingFingerprint(col("text")).as("fp"))
    assert(df.as[Long].collect().toSeq == samples.map(expected))
  }

  test("shingles produce ordered distinct n-grams") {
    val out = Seq("a b c b c").toDF("t")
      .select(TextFns.shingles(col("t"), 2).as("sh"))
      .as[Seq[String]].head
    assert(out == Seq("a b", "b c", "c b")) // distinct keeps first occurrence
  }

  test("mapPartitions feature extraction == native expression twin") {
    val docs = Tables.load(spark, sfDir, "documents")
    val viaPartitions = Multimodal.extractFeatures(spark,
      Multimodal.attachMedia(docs, "doc_id", "text"))
    val viaExprs = docs.select(
      col("doc_id").cast("long").as("media_id"),
      length(col("text")).cast("long").as("n_bytes"),
      ascii(substring(col("text"), 1, 1)).as("first_byte"),
      TextFns.rollingFingerprint(col("text")).as("checksum"))
    assert(viaPartitions.exceptAll(viaExprs).isEmpty &&
      viaExprs.exceptAll(viaPartitions).isEmpty)
  }

  test("state store merges idempotently") {
    val path = java.nio.file.Files.createTempDirectory("graft_state")
      .resolve("seen.txt").toString
    Ingest.StateStore.append(path, Seq("a", "b"))
    Ingest.StateStore.append(path, Seq("b", "c"))
    assert(Ingest.StateStore.read(path) == Set("a", "b", "c"))
    Ingest.StateStore.append(path, Nil)
    assert(Ingest.StateStore.read(path) == Set("a", "b", "c"))
  }

  test("sequence packing assigns docs by start offset under concatenation") {
    import org.apache.spark.sql.functions._
    // tokens: 3, 4, 2, 5 → starts 0,3,7,9; budget 5 → packs 0,0,1,1
    val docs = Seq(
      (0L, Some("a b c")), (1L, Some("a b c d")), (2L, Some("a b")),
      (3L, Some("a b c d e")),
      (50L, None), // NULL text: null pack columns, later docs unaffected
      (100L, Some("x y z"))) // new shard restarts at offset 0
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .packSequences(docs, "doc_id", "text", budget = 5, shardSize = 100)
      .orderBy("doc_id")
      .as[(Long, Long, Option[Long], Option[Long], Option[Long])].collect().toSeq
    assert(out == Seq(
      (0L, 0L, Some(0L), Some(0L), Some(3L)), (1L, 0L, Some(0L), Some(3L), Some(4L)),
      (2L, 0L, Some(1L), Some(2L), Some(2L)), (3L, 0L, Some(1L), Some(4L), Some(5L)),
      (50L, 0L, None, None, None),
      (100L, 1L, Some(0L), Some(0L), Some(3L))))
  }

  test("chunking covers every token exactly once with explicit order") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, Some((1 to 7).map(i => s"w$i").mkString(" "))), // 7 tokens, C=3 -> 3,3,1
      (2L, Some("only two")),                              // < C -> one short chunk
      (3L, Some((1 to 6).map(i => s"x$i").mkString(" "))), // exact multiple -> 3,3
      (4L, None)                                           // NULL text -> no rows
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .chunkDocuments(docs, "doc_id", "text", chunkSize = 3)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, "w1 w2 w3", 3L), (1L, 1L, "w4 w5 w6", 3L), (1L, 2L, "w7", 1L),
      (2L, 0L, "only two", 2L),
      (3L, 0L, "x1 x2 x3", 3L), (3L, 1L, "x4 x5 x6", 3L)))
  }

  test("paragraph dedup: first (doc, position) wins, reconstruction exact") {
    import org.apache.spark.sql.functions._
    // "a b c" appears as doc 1 chunk 0, doc 2 chunk 1, and twice
    // inside doc 3 — winner election must collapse the within-doc
    // repeats too, leaving doc 1 chunk 0 as the single corpus-wide
    // survivor (so doc 3 reconstructs to the empty string).
    val docs = Seq(
      (1L, "a b c d e f"),       // chunks: "a b c", "d e f"
      (2L, "x y z a b c"),       // "x y z", "a b c"(dup -> dropped)
      (3L, "a b c a b c")        // both chunks dup -> doc empties
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .paragraphDedup(docs, "doc_id", "text", chunkSize = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    def m(s: String) = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    assert(out == Seq(
      (1L, 2L, 2L, 6L, m("a b c d e f")),
      (2L, 2L, 1L, 3L, m("x y z")),
      (3L, 2L, 0L, 0L, m(""))))

    // corpus law at sf scale: kept occurrences == distinct paragraphs
    val corpus = graft.sources.Tables.load(spark, sfDir, "documents")
    val res = graft.operators.TextAnalysis
      .paragraphDedup(corpus, "doc_id", "text", chunkSize = 3)
    val kept = res.agg(sum("n_kept")).collect()(0).getLong(0)
    val distinctParas = graft.operators.TextAnalysis
      .chunkDocuments(corpus, "doc_id", "text", chunkSize = 3)
      .select("chunk_text").distinct().count()
    assert(kept == distinctParas,
      s"each distinct paragraph must survive exactly once: $kept != $distinctParas")
  }

  test("mixture sampling: rate 1.0 keeps all, 0.0 drops all, unlisted drops") {
    import org.apache.spark.sql.functions._
    val docs = (1L to 200L).toDF("doc_id")
      .withColumn("lang", when(col("doc_id") % 2 === 0, "en").otherwise("xx"))
    val kept = graft.operators.TextAnalysis
      .mixtureSample(docs, "doc_id", "lang", Map("en" -> 1.0, "fr" -> 0.0))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(kept == Map("en" -> 100L)) // all en kept, xx (unlisted) dropped
  }

  test("stable split: ~90/5/5 distribution, unchanged by corpus growth") {
    import org.apache.spark.sql.functions._
    def assign(nDocs: Int) = spark.range(nDocs)
      .select(col("id"), graft.operators.TextAnalysis.stableSplit(col("id")).as("split"))
    val full = assign(10000).groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(math.abs(full("train") - 9000L) < 300, s"train skewed: $full")
    assert(math.abs(full("val") - 500L) < 150 && math.abs(full("test") - 500L) < 150,
      s"val/test skewed: $full")
    // Growing the corpus must not reassign earlier docs.
    val small = assign(5000).as[(Long, String)].collect().toMap
    val bigFirstHalf = assign(10000).where(col("id") < 5000)
      .as[(Long, String)].collect().toMap
    assert(small == bigFirstHalf)
  }

  test("decontamination probe joins the corpus against a BROADCAST eval n-gram set") {
    import org.apache.spark.sql.functions._
    val d = graft.sources.Tables.load(spark, sfDir, "documents")
    val ev = d.where(col("doc_id") % 83 === 7)
      .select(explode(graft.functions.TextFns.shingles(
        expr("substring(text, 21, 400)"), 5)).as("s"))
    val out = graft.operators.TextAnalysis.contaminationFlags(
      d, "doc_id", "text", ev, n = 5, minOverlap = 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"eval probe should broadcast, plan was:\n$plan")
    assert(out.where(col("contaminated")).count() > 0,
      "planted span sources must be flagged")
  }

  test("PII redaction masks in the order that protects embedded forms") {
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      // URL first: the embedded '@' and digits never reach email/phone passes.
      "see https://u:p@host.example/x?id=123 now" -> "see <URL> now",
      "mail a.b+c@sub.example.org please" -> "mail <EMAIL> please",
      // IP before phone: dotted digits are an IP, not a phone.
      "host 192.168.10.7 up" -> "host <IP> up",
      "call +1-555-0147 now" -> "call <PHONE> now",
      "plain text stays" -> "plain text stays")
    val out = cases.map(_._1).toDF("t")
      .select(graft.operators.TextAnalysis.redactPii(col("t")).as("r"))
      .as[String].collect().toSeq
    assert(out == cases.map(_._2))
  }

  test("BMP decode recovers the generative pixel stats from real containers") {
    import graft.operators.Multimodal
    // widths 2..7 cover every stride-padding case (w*3 % 4 = 2,1,0,3,2,1)
    for (id <- 1L to 24L) {
      val w = (id % 6 + 2).toInt; val h = (id % 4 + 2).toInt
      val bytes = Multimodal.encodeBmp(id, w, h)
      assert(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte)
      val (dw, dh, bpp, sr, sg, sb, tr) = Multimodal.decodeBmp(bytes)
      assert((dw, dh, bpp) == (w, h, 24))
      val px = for (y <- 0 until h; x <- 0 until w) yield (x, y)
      assert(sr == px.map { case (x, y) => Multimodal.redAt(id, x, y, w).toLong }.sum)
      assert(sg == px.map { case (x, y) => Multimodal.greenAt(id, x, y, w).toLong }.sum)
      assert(sb == px.map { case (x, y) => Multimodal.blueAt(id, x, y, w).toLong }.sum)
      // orientation witness: image-space (w-1, 0) — a decoder that
      // forgets bottom-up row order reads the wrong stored row
      assert(tr == Multimodal.redAt(id, w - 1, 0, w))
    }
  }

  test("BMP decode rejects non-BMP and truncated payloads") {
    import graft.operators.Multimodal
    intercept[IllegalArgumentException] {
      Multimodal.decodeBmp("not an image at all, just text bytes ......".getBytes)
    }
    val ok = Multimodal.encodeBmp(7L, 5, 4)
    intercept[IllegalArgumentException] {
      Multimodal.decodeBmp(ok.take(ok.length - 8)) // truncated pixel array
    }
  }

  test("frame sample decodes real strip pixels and resizes nearest-neighbor") {
    import graft.operators.Multimodal
    import org.apache.spark.sql.Row
    val ids = (1L to 24L)
    val media = Multimodal.videoCorpus(
      spark.range(1, 25).toDF("c_custkey"), "c_custkey", frameHeight = 4)
    val got = Multimodal.frameSampleBmp(media, frameHeight = 4,
        sampleEvery = 3, outW = 3, outH = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r).toMap
    // expected straight from the generative formulas: frame f, resized
    // (xo,yo) reads source (xo*w/3, f*4 + yo*4/2) in GLOBAL strip coords
    for (id <- ids) {
      val w = (id % 6 + 2).toInt
      val nf = (id % 5 + 2).toInt
      val sampled = (0 until nf).filter(_ % 3 == 0)
      for (f <- sampled) {
        val r = got((id, f))
        val px = for (yo <- 0 until 2; xo <- 0 until 3)
          yield (xo * w / 3, f * 4 + yo * 4 / 2)
        assert(r.getLong(4) == px.map { case (x, y) =>
          Multimodal.redAt(id, x, y, w).toLong }.sum, s"sum_r id=$id f=$f")
        assert(r.getLong(5) == px.map { case (x, y) =>
          Multimodal.greenAt(id, x, y, w).toLong }.sum, s"sum_g id=$id f=$f")
        assert(r.getLong(6) == px.map { case (x, y) =>
          Multimodal.blueAt(id, x, y, w).toLong }.sum, s"sum_b id=$id f=$f")
        // orientation witness: frame-local top row = strip row f*4,
        // which lives DEEP in the stored (bottom-up) pixel array
        assert(r.getInt(7) == Multimodal.redAt(id, 2 * w / 3, f * 4, w),
          s"topright id=$id f=$f")
      }
      // exactly the sampled frames, nothing more
      assert(got.keys.count(_._1 == id) == sampled.size)
    }
    // a strip whose height is not a whole number of frames must abort,
    // not silently truncate
    val twoCol = Multimodal.mediaSchema.copy(
      fields = Multimodal.mediaSchema.fields.take(2))
    val bad = spark.createDataFrame(
      java.util.Arrays.asList(Row(99L, Multimodal.encodeBmp(99L, 3, 5))),
      twoCol)
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.frameSampleBmp(bad, frameHeight = 4).collect()
    }
    assert(e.getMessage != null)
    // a NULL payload (failed fetch) yields zero frames, not a crash
    val withNull = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, Multimodal.encodeBmp(1L, 3, 8)), Row(2L, null)),
      twoCol)
    val rows = Multimodal.frameSampleBmp(withNull, frameHeight = 4).collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(0) == 1L),
      s"null media must contribute zero frames: ${rows.toSeq}")
  }

  test("dup-span coverage: exact dup = 100%, unique doc = 0, partial overlap counts aligned spans") {
    import spark.implicits._
    // doc 1 == doc 2 verbatim (16 tokens); doc 3 shares EXACTLY the
    // first 8 tokens of doc 1 then diverges; doc 4 is fully unique.
    val shared = (1 to 8).map(i => s"w$i").mkString(" ")
    val tail1 = (9 to 16).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (1L, s"$shared $tail1"),
      (2L, s"$shared $tail1"),
      (3L, s"$shared x1 x2 x3 x4 x5 x6 x7 x8"),
      (4L, (1 to 16).map(i => s"u$i").mkString(" "))
    ).toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis
      .dupSpanStats(corpus, "doc_id", "text", k = 8)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    // 16 tokens -> 9 span positions each
    assert(r(0) == (1L, 9L, 9L, 1000000L), s"exact dup must be fully covered: ${r(0)}")
    assert(r(1) == (2L, 9L, 9L, 1000000L), s"exact dup must be fully covered: ${r(1)}")
    // only position 1 of doc 3 (the aligned 8-token prefix) is shared
    assert(r(2) == (3L, 9L, 1L, 111111L), s"partial overlap must count exactly 1 span: ${r(2)}")
    assert(r(3) == (4L, 9L, 0L, 0L), s"unique doc must be 0: ${r(3)}")
  }

  test("dup-span coverage excludes sub-k documents instead of erroring") {
    import spark.implicits._
    val corpus = Seq((1L, "a b c"), (2L, (1 to 9).map(_.toString).mkString(" ")))
      .toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis
      .dupSpanStats(corpus, "doc_id", "text", k = 8).collect()
    assert(r.map(_.getLong(0)).toSet == Set(2L), s"3-token doc must drop: ${r.toSeq}")
  }
}
