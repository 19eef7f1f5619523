package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (builder-prompt family): media payloads
  * travel as opaque `binary` columns beside a typed metadata struct;
  * decode / feature-extraction runs batched per partition.
  *
  * Two decode kernels ship: [[decodeBmp]] is a REAL image decoder —
  * it parses genuine 24-bit uncompressed BMP containers (magic check,
  * little-endian header walk, data-offset honor, BGR channel order,
  * bottom-up row order, 4-byte row padding) produced by
  * [[encodeBmp]]; [[decodeStub]] remains the generic stand-in for
  * codecs this container lacks (JPEG/audio/video libraries).
  * Everything around both — schema, partitioning, batch iteration
  * shape, feature output contract — is the real 100 TB plumbing:
  * `mapPartitions` over batches is Scala Spark's analog of
  * `mapInPandas`, and the decode call is the single line you swap
  * per codec.
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

  // ---- Real codec: 24-bit uncompressed BMP — the one image format
  // simple enough to en/decode correctly without a library, which
  // makes the decode kernel REAL rather than a byte-hash stand-in.

  /** Deterministic channel formulas, pure in (id, x, y): the oracle
    * recomputes the decoded statistics from these directly, so the
    * encode→decode round trip (container layout, padding, channel
    * order, row orientation) is exactly what's under test. */
  def redAt(id: Long, x: Int, y: Int, w: Int): Int =
    ((id + 3 * (y.toLong * w + x)) % 256).toInt
  def greenAt(id: Long, x: Int, y: Int, w: Int): Int =
    ((id * 5 + y + x) % 256).toInt
  def blueAt(id: Long, x: Int, y: Int, w: Int): Int =
    ((id * 11 + y.toLong * x) % 256).toInt

  /** Encode a genuine 24bpp bottom-up BMP (14-byte file header +
    * 40-byte BITMAPINFOHEADER + BGR pixel rows padded to 4 bytes)
    * whose pixels follow the [[redAt]]/[[greenAt]]/[[blueAt]]
    * formulas. */
  def encodeBmp(id: Long, w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0, "BMP dimensions must be positive")
    val rowBytes = w * 3
    val pad = (4 - rowBytes % 4) % 4
    val dataSize = (rowBytes + pad) * h
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    var y = h - 1 // bottom-up: image row h-1 is stored first
    while (y >= 0) {
      var x = 0
      while (x < w) {
        buf.put(blueAt(id, x, y, w).toByte)
        buf.put(greenAt(id, x, y, w).toByte)
        buf.put(redAt(id, x, y, w).toByte)
        x += 1
      }
      var p = 0
      while (p < pad) { buf.put(0.toByte); p += 1 }
      y -= 1
    }
    buf.array()
  }

  val bmpStatsSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("bpp", IntegerType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false),
    StructField("topright_r", IntegerType, nullable = false)))

  /** REAL decode: validate the container (magic, bpp, compression),
    * honor the header's pixel-data offset, and walk the pixel array —
    * bottom-up rows, BGR order, 4-byte row stride — into per-channel
    * sums plus an orientation witness (the IMAGE-space top-right
    * pixel's red channel, which lives in the LAST stored row; a
    * decoder that ignores bottom-up layout gets it wrong). */
  def decodeBmp(bytes: Array[Byte]): (Int, Int, Int, Long, Long, Long, Int) = {
    require(bytes != null && bytes.length >= 54 &&
      bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte, "not a BMP payload")
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val off = buf.getInt(10)
    val w = buf.getInt(18)
    val h = buf.getInt(22)
    val bpp = buf.getShort(28).toInt
    val comp = buf.getInt(30)
    require(bpp == 24 && comp == 0, s"unsupported BMP variant: bpp=$bpp compression=$comp")
    // hostile-header hardening: bound the fields BEFORE any address
    // arithmetic (a huge w*h would overflow Int and skip the length
    // check; a sub-header offset would read header bytes as pixels)
    require(w > 0 && h > 0 && w <= (1 << 20) && h <= (1 << 20),
      s"bad dimensions ${w}x$h")
    require(off >= 54 && off <= bytes.length, s"bad pixel-data offset $off")
    val stride = w * 3 + (4 - (w * 3) % 4) % 4
    require(bytes.length.toLong >= off.toLong + stride.toLong * h,
      "truncated pixel array")
    var sr = 0L; var sg = 0L; var sb = 0L
    var row = 0
    while (row < h) {
      val base = off + row * stride
      var x = 0
      while (x < w) {
        sb += bytes(base + 3 * x) & 0xff
        sg += bytes(base + 3 * x + 1) & 0xff
        sr += bytes(base + 3 * x + 2) & 0xff
        x += 1
      }
      row += 1
    }
    val topRowBase = off + (h - 1) * stride // image y=0 = last stored row
    val toprightR = bytes(topRowBase + 3 * (w - 1) + 2) & 0xff
    (w, h, bpp, sr, sg, sb, toprightR)
  }

  /** Deterministic BMP corpus: one genuine BMP blob per input key
    * (dimensions and pixels pure functions of the key). The encoder
    * runs batched per partition — the same executor-side shape a real
    * media-ingest (fetch/transcode) pipeline has. */
  def bmpCorpus(df: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("media", BinaryType, nullable = false))))
    df.select(col(idCol).cast("long").as("media_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, encodeBmp(id, (id % 6 + 2).toInt, (id % 4 + 2).toInt))
      }
    }(enc)
  }

  /** Batched per-partition BMP decode into [[bmpStatsSchema]]. */
  def decodeBmpStats(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(bmpStatsSchema)
    media.select("media_id", "media").mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val (w, h, bpp, sr, sg, sb, tr) = decodeBmp(r.getAs[Array[Byte]](1))
          Row(r.getLong(0), w, h, bpp, sr, sg, sb, tr)
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
