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

  val frameStatsSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("out_w", IntegerType, nullable = false),
    StructField("out_h", IntegerType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false),
    StructField("topright_r", IntegerType, nullable = false)))

  /** REAL frame sampling + nearest-neighbor resize: the payload is a
    * genuine multi-frame 24bpp BMP strip (frame f = image rows
    * [f*frameHeight, (f+1)*frameHeight), see [[videoCorpus]]). Every
    * `sampleEvery`-th frame is decoded through the actual container
    * (header walk, BGR, bottom-up rows, stride padding — shared with
    * [[decodeBmp]]) and resized to outW×outH by nearest-neighbor
    * source mapping (sx = x·w/outW, sy = y·frameHeight/outH, floor) —
    * a real resize kernel over real decoded pixels, finishing what
    * the BMP decode started. Emitted per sampled frame: resized
    * channel sums + the resized top-right red channel (an
    * orientation witness — a decoder that ignores bottom-up storage
    * reads the wrong strip row). */
  def frameSampleBmp(media: DataFrame, frameHeight: Int = 4,
                     sampleEvery: Int = 3, outW: Int = 3,
                     outH: Int = 2): DataFrame = {
    require(frameHeight > 0 && sampleEvery > 0 && outW > 0 && outH > 0)
    val enc = org.apache.spark.sql.Encoders.row(frameStatsSchema)
    media.select("media_id", "media").mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        // a null payload (failed fetch — mediaSchema allows it) yields
        // zero frames, it must not kill the task
        if (r.isNullAt(1)) Iterator.empty
        else {
        val bytes = r.getAs[Array[Byte]](1)
        val (off, w, h, stride) = parseBmpHeader(bytes)
        require(h % frameHeight == 0,
          s"strip height $h not a multiple of frame height $frameHeight")
        // image-space pixel read: strip row gy lives in stored row
        // h-1-gy (bottom-up container)
        def channel(gy: Int, x: Int, c: Int): Int =
          bytes(off + (h - 1 - gy) * stride + 3 * x + c) & 0xff
        (0 until h / frameHeight).filter(_ % sampleEvery == 0).map { f =>
          var sr = 0L; var sg = 0L; var sb = 0L
          var toprightR = 0
          var yo = 0
          while (yo < outH) {
            val sy = yo * frameHeight / outH
            val gy = f * frameHeight + sy
            var xo = 0
            while (xo < outW) {
              val sx = xo * w / outW
              sb += channel(gy, sx, 0)
              sg += channel(gy, sx, 1)
              sr += channel(gy, sx, 2)
              if (xo == outW - 1 && yo == 0) toprightR = channel(gy, sx, 2)
              xo += 1
            }
            yo += 1
          }
          Row(id, f, outW, outH, sr, sg, sb, toprightR)
        }
        }
      }
    }(enc)
  }

  /** Deterministic multi-frame corpus: one genuine BMP strip per key
    * — width id%6+2, id%5+2 frames of height `frameHeight` stacked
    * vertically, pixels pure in (id, x, global y) via the
    * [[redAt]]/[[greenAt]]/[[blueAt]] formulas, so the oracle
    * recomputes sampled-resized statistics with no BMP parser. */
  def videoCorpus(df: DataFrame, idCol: String,
                  frameHeight: Int = 4): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("media", BinaryType, nullable = false))))
    df.select(col(idCol).cast("long").as("media_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val nFrames = (id % 5 + 2).toInt
        Row(id, encodeBmp(id, (id % 6 + 2).toInt, nFrames * frameHeight))
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

  /** Shared container validation + header walk: returns (pixel-data
    * offset, width, height, row stride). Hostile-header hardening:
    * bound every field BEFORE any address arithmetic (a huge w*h
    * would overflow Int and skip the length check; a sub-header
    * offset would read header bytes as pixels). */
  private def parseBmpHeader(bytes: Array[Byte]): (Int, Int, Int, Int) = {
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
    require(w > 0 && h > 0 && w <= (1 << 20) && h <= (1 << 20),
      s"bad dimensions ${w}x$h")
    require(off >= 54 && off <= bytes.length, s"bad pixel-data offset $off")
    val stride = w * 3 + (4 - (w * 3) % 4) % 4
    require(bytes.length.toLong >= off.toLong + stride.toLong * h,
      "truncated pixel array")
    (off, w, h, stride)
  }

  /** REAL decode: validate the container (magic, bpp, compression),
    * honor the header's pixel-data offset, and walk the pixel array —
    * bottom-up rows, BGR order, 4-byte row stride — into per-channel
    * sums plus an orientation witness (the IMAGE-space top-right
    * pixel's red channel, which lives in the LAST stored row; a
    * decoder that ignores bottom-up layout gets it wrong). */
  def decodeBmp(bytes: Array[Byte]): (Int, Int, Int, Long, Long, Long, Int) = {
    val (off, w, h, stride) = parseBmpHeader(bytes)
    val bpp = 24
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

  /** [[decodeBmpStats]] + a pass-through source-reported byte length:
    * one scan, one decode pass — for sources (binaryFile) that report
    * blob length as FILE metadata, so the witness can pin it without
    * a second scan and a re-join. Input columns: (media_id, n_bytes,
    * media). */
  def decodeBmpStatsWithLength(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val schema = StructType(
      bmpStatsSchema.fields.patch(1,
        Seq(StructField("n_bytes", LongType, nullable = false)), 0))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    media.select("media_id", "n_bytes", "media").mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val (w, h, bpp, sr, sg, sb, tr) = decodeBmp(r.getAs[Array[Byte]](2))
          Row(r.getLong(0), r.getLong(1), w, h, bpp, sr, sg, sb, tr)
        }
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
