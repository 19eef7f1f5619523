package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (builder-prompt family): media payloads
  * travel as opaque `binary` columns beside a typed metadata struct;
  * decode / feature-extraction runs batched per partition.
  *
  * The actual image/audio decode is STUBBED (no codec libraries in
  * this environment): [[decodeStub]] derives deterministic fake
  * features from the raw bytes. Everything around it — schema,
  * partitioning, batch iteration shape, feature output contract — is
  * the real 100 TB plumbing: `mapPartitions` over Arrow-friendly
  * batches is Scala Spark's analog of `mapInPandas`, and the decode
  * call is the single line you swap for a real codec.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("n_bytes", LongType),
      StructField("sample_rate", IntegerType))), nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType),
    StructField("first_byte", IntegerType),
    StructField("checksum", LongType)))

  /** Attach a binary payload + typed metadata to a text corpus —
    * stand-in for reading real media blobs (utf-8 bytes of the text
    * double as the payload; deterministic). */
  def attachMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("media"),
      struct(
        lit("text/plain").as("mime"),
        length(col(textCol).cast("binary")).cast("long").as("n_bytes"),
        lit(16000).as("sample_rate")).as("meta"))

  /** The stub "decode": deterministic features of the raw BYTES
    * (UTF-8). Note for oracle authors: byte semantics equal character
    * semantics only for ASCII payloads (true of the harness corpus);
    * a non-ASCII corpus needs a byte-based oracle (octet_length over
    * the encoded blob), not length()/ascii().
    * Swap this body for a real codec (image decode, resample, frame
    * sample) — the contract (bytes in, fixed-width features out) and
    * everything downstream stay unchanged. */
  def decodeStub(bytes: Array[Byte]): (Long, Int, Long) = {
    if (bytes == null || bytes.isEmpty) (0L, -1, 0L)
    else {
      var checksum = 0L
      var i = 0
      while (i < bytes.length) { // batch-local tight loop, no boxing
        checksum = (checksum * 131 + (bytes(i) & 0xff)) % 1000000007L
        i += 1
      }
      (bytes.length.toLong, bytes(0) & 0xff, checksum)
    }
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame_len", LongType, nullable = false),
    StructField("frame_md5", StringType, nullable = false),
    StructField("resized_md5", StringType, nullable = false)))

  /** Frame sampling + "resize" over the binary payload — the video/
    * audio verbs of the multimodal family with the codec stubbed: the
    * payload is sliced into fixed-width frames, every `sampleEvery`-th
    * frame kept, and each frame "resized" (padded to the fixed width
    * with 0x20 — the stand-in for a real resample/resize kernel).
    * Slicing/sampling/batching are the real executor-side plumbing;
    * only the kernel is fake. */
  def frameSample(spark: SparkSession, media: DataFrame,
                  frameBytes: Int = 64, sampleEvery: Int = 3): DataFrame = {
    require(frameBytes > 0 && sampleEvery > 0)
    val enc = org.apache.spark.sql.Encoders.row(frameSchema)
    media.select("media_id", "media").mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        (0 until (bytes.length + frameBytes - 1) / frameBytes)
          .filter(_ % sampleEvery == 0)
          .map { i =>
            val frame = bytes.slice(i * frameBytes, (i + 1) * frameBytes)
            val resized = frame.padTo(frameBytes, ' '.toByte)
            Row(id, i, frame.length.toLong,
              hex(md.digest(frame)), hex(md.digest(resized)))
          }
      }
    }(enc)
  }

  /** Batched per-partition feature extraction — the `mapInPandas`
    * analog. Executors stream partition rows through the decoder in
    * fixed-size batches (bounded memory regardless of partition
    * size); output rows carry the feature contract. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      batchSize: Int = 64): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    val out: Dataset[Row] = media.select("media_id", "media").mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val (n, first, checksum) = decodeStub(bytes)
          Row(id, n, first, checksum)
        }
      }
    }(enc)
    out
  }
}
