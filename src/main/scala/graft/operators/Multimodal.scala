package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: media payloads are
  * opaque `binary` columns travelling next to typed metadata; decode /
  * feature-extraction runs batched per partition.
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): [[FakeCodec]] is a deterministic stand-in with the same
  * shape a real decoder would have. Everything around it — schema,
  * batch iteration, partition sizing, output typing — is real Spark
  * plumbing: swap `FakeCodec.decode` for an actual JNI/FFI decoder and
  * nothing else changes.
  *
  * Scale notes: payloads stay off the shuffle path (feature extraction
  * is map-side); `repartitionForPayloads` sizes partitions by byte
  * budget, not row count, so a 100 TB corpus of skewed media sizes
  * still yields bounded-memory tasks.
  */
object Multimodal {

  /** Canonical multimodal record schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true))), nullable = true)))

  /** STUB decoder: a real build would call an image/audio codec here
    * (the `???`-equivalent is the deterministic fake below, so the
    * pipeline is testable end-to-end). */
  object FakeCodec {
    /** "Decodes" a payload into a fixed-length feature vector: byte
      * histogram moments — deterministic, shape-compatible with a real
      * embedding head. */
    def decode(payload: Array[Byte], dim: Int = 8): Array[Double] = {
      val out = new Array[Double](dim)
      var i = 0
      while (i < payload.length) {
        out(i % dim) += (payload(i) & 0xff) / 255.0
        i += 1
      }
      if (payload.length > 0) {
        var j = 0
        while (j < dim) { out(j) /= math.max(1, payload.length / dim); j += 1 }
      }
      out
    }

    /** STUB frame sampler: returns `n` evenly spaced frame offsets. */
    def sampleFrames(nFrames: Int, n: Int): Array[Int] =
      if (nFrames <= 0 || n <= 0) Array.empty
      else Array.tabulate(math.min(n, nFrames))(i => i * nFrames / math.min(n, nFrames))
  }

  /** REAL pure-JVM media header codec (no native deps): PNG and JPEG
    * are public byte formats whose dimensions/channels live in fixed
    * header structures, so "decode the metadata" needs no image
    * library — only the pixel-level work (full decode, resample)
    * stays behind [[FakeCodec]].
    *
    * Parsing contract: [[parseHeader]] returns `None` for anything it
    * cannot positively identify (truncated buffer, bad signature,
    * missing SOF) rather than guessing — a corrupt payload in a 100 TB
    * crawl should surface as an unparsed row to route to quarantine,
    * not as fabricated dimensions.
    *
    * PNG (spec: 8-byte signature, then chunks; IHDR first): width and
    * height are big-endian u32 at IHDR offsets 0/4, channels derive
    * from the color type (0 gray→1, 2 rgb→3, 3 palette→1, 4
    * gray+alpha→2, 6 rgba→4). [[pngBytes]] emits a spec-correct
    * signature + IHDR (including the CRC32 over type+data that any
    * strict reader validates).
    *
    * JPEG (JFIF/EXIF container): segments of (0xFF, marker, u16 len)
    * follow SOI; dimensions live in the first SOFn segment
    * (0xC0–0xCF minus the non-frame C4/C8/CC): precision u8, height
    * u16, width u16, component count u8 (= channels). The parser
    * skips APPn/DQT/etc by their length fields and tolerates fill
    * bytes between segments, so real camera files parse too. */
  object MediaCodec {
    final case class Header(format: String, width: Int, height: Int,
      channels: Int)

    private val pngSig =
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

    private def be32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

    private def be16(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

    /** A spec-correct PNG prefix (signature + IHDR with CRC) carrying
      * `body` as trailing bytes — a header-honest fixture payload (the
      * body is not a valid IDAT stream; header parsers never read it). */
    def pngBytes(width: Int, height: Int, colorType: Int,
        body: Array[Byte]): Array[Byte] = {
      require(width > 0 && height > 0, s"png ${width}x$height")
      require(Set(0, 2, 3, 4, 6)(colorType), s"png colorType=$colorType")
      val ihdr = new Array[Byte](13)
      def put32(a: Array[Byte], i: Int, v: Long): Unit = {
        a(i) = ((v >>> 24) & 0xff).toByte; a(i + 1) = ((v >>> 16) & 0xff).toByte
        a(i + 2) = ((v >>> 8) & 0xff).toByte; a(i + 3) = (v & 0xff).toByte
      }
      put32(ihdr, 0, width.toLong); put32(ihdr, 4, height.toLong)
      ihdr(8) = 8 // bit depth
      ihdr(9) = colorType.toByte
      // compression / filter / interlace all 0 (the only legal values)
      val typ = "IHDR".getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(typ); crc.update(ihdr)
      val out = new java.io.ByteArrayOutputStream(33 + body.length)
      out.write(pngSig)
      val len = new Array[Byte](4); put32(len, 0, 13); out.write(len)
      out.write(typ); out.write(ihdr)
      val crcB = new Array[Byte](4); put32(crcB, 0, crc.getValue); out.write(crcB)
      out.write(body)
      out.toByteArray
    }

    /** A JFIF-correct JPEG prefix (SOI + APP0 + SOF0) carrying `body`
      * as trailing bytes. Length: 30 + 3×components before the body. */
    def jpegBytes(width: Int, height: Int, nComponents: Int,
        body: Array[Byte]): Array[Byte] = {
      require(width > 0 && width <= 0xffff && height > 0 && height <= 0xffff,
        s"jpeg ${width}x$height exceeds the format's u16 dimensions")
      require(nComponents == 1 || nComponents == 3, s"jpeg n=$nComponents")
      val out = new java.io.ByteArrayOutputStream(30 + 3 * nComponents + body.length)
      def b(v: Int): Unit = out.write(v & 0xff)
      b(0xff); b(0xd8) // SOI
      // APP0 JFIF v1.1, aspect 1:1, no thumbnail (len 16)
      b(0xff); b(0xe0); b(0); b(16)
      out.write("JFIF".getBytes("US-ASCII")); b(0)
      b(1); b(1); b(0); b(0); b(1); b(0); b(1); b(0); b(0)
      // SOF0: len = 8 + 3n, precision 8, height, width, components
      b(0xff); b(0xc0); b(0); b(8 + 3 * nComponents); b(8)
      b(height >> 8); b(height); b(width >> 8); b(width); b(nComponents)
      var c = 0
      while (c < nComponents) { b(c + 1); b(0x11); b(0); c += 1 }
      out.write(body)
      out.toByteArray
    }

    def parseHeader(payload: Array[Byte]): Option[Header] = {
      if (payload == null) None
      else if (payload.length >= 33 && pngSig.indices.forall(i => payload(i) == pngSig(i)))
        parsePng(payload)
      else if (payload.length >= 4 && (payload(0) & 0xff) == 0xff &&
          (payload(1) & 0xff) == 0xd8)
        parseJpeg(payload)
      else None
    }

    private def parsePng(p: Array[Byte]): Option[Header] = {
      // first chunk must be IHDR (spec); length field must say 13
      if (be32(p, 8) != 13L || p(12) != 'I' || p(13) != 'H' ||
          p(14) != 'D' || p(15) != 'R') return None
      val w = be32(p, 16); val h = be32(p, 20)
      if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return None
      val channels = (p(25) & 0xff) match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
        case _ => return None
      }
      Some(Header("png", w.toInt, h.toInt, channels))
    }

    private def parseJpeg(p: Array[Byte]): Option[Header] = {
      var i = 2
      while (i + 3 < p.length) {
        if ((p(i) & 0xff) != 0xff) return None // lost segment sync
        var j = i
        while (j < p.length && (p(j) & 0xff) == 0xff) j += 1 // fill bytes
        if (j >= p.length) return None
        val marker = p(j) & 0xff
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          // SOFn: len(2) precision(1) height(2) width(2) ncomp(1)
          if (j + 8 >= p.length) return None
          val h = be16(p, j + 4); val w = be16(p, j + 6)
          val n = p(j + 8) & 0xff
          if (w <= 0 || h <= 0 || n == 0) return None
          return Some(Header("jpeg", w, h, n))
        } else if (marker == 0xd8) i = j + 1 // stray SOI
        else if (marker == 0xd9 || marker == 0xda) return None // EOI/SOS: no SOF seen
        else if (j + 2 >= p.length) return None
        else i = j + 1 + be16(p, j + 1) // skip segment by its length
      }
      None
    }
  }

  /** Deterministic image fixture with REAL headers: payloads are
    * spec-correct PNG (even ids) / JFIF JPEG (odd ids) prefixes whose
    * dimensions and channel counts derive from `doc_id` arithmetic,
    * with the document text as trailing bytes. Because the expected
    * header fields are pure integer functions of `doc_id`, an external
    * SQL engine can replay them — which turns the header DECODER into
    * a hash-gated operator (the d06 gate): any byte-order, offset, or
    * channel-mapping bug in [[MediaCodec.parseHeader]] diverges from
    * the oracle's arithmetic. */
  def syntheticImages(spark: SparkSession, documents: DataFrame): DataFrame = {
    val src = documents.select(col("doc_id").cast("long"),
      encode(col("text"), "UTF-8").as("body"))
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val rdd = src.rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val body = r.getAs[Array[Byte]](1)
        val w = (16 + id % 64).toInt
        val h = (16 + id % 48).toInt
        val payload =
          if (id % 2 == 0) {
            val colorType = (id % 3) match { case 0 => 0; case 1 => 2; case _ => 6 }
            MediaCodec.pngBytes(w, h, colorType, body)
          } else {
            val n = if (id % 4 == 1) 1 else 3
            MediaCodec.jpegBytes(w, h, n, body)
          }
        Row(id, payload)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Batched per-partition header decode over opaque binary payloads —
    * the real-codec counterpart of [[extractFeatures]]'s embedding
    * stub: one decoder per partition, payloads never shuffle, output
    * is the typed manifest row (format/width/height/channels/bytes).
    * Unparseable payloads yield null header fields (quarantine
    * routing), never an exception. */
  def decodeHeaders(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("payload_bytes", LongType, nullable = false)))
    val idIdx = df.schema.fieldIndex("media_id")
    val payloadIdx = df.schema.fieldIndex("payload")
    val rdd = df.rdd.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        MediaCodec.parseHeader(payload) match {
          case Some(hd) => Row(r.getLong(idIdx), hd.format, hd.width,
            hd.height, hd.channels, payload.length.toLong)
          case None => Row(r.getLong(idIdx), null, null, null, null,
            if (payload == null) 0L else payload.length.toLong)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Batched per-partition feature extraction — the mapInPandas-shaped
    * step: one decoder instance per partition (amortized init), rows
    * streamed through it. Output: (media_id, kind, features array). */
  def extractFeatures(df: DataFrame, dim: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val idIdx = df.schema.fieldIndex("media_id")
    val kindIdx = df.schema.fieldIndex("kind")
    val payloadIdx = df.schema.fieldIndex("payload")
    val rdd = df.rdd.mapPartitions { it =>
      // decoder/codec init would happen once per partition here
      it.map { r =>
        Row(r.getLong(idIdx), r.getString(kindIdx),
          FakeCodec.decode(r.getAs[Array[Byte]](payloadIdx), dim).toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Column-level frame sampling: `n` evenly spaced offsets into an
    * `nFrames`-frame payload — same integer arithmetic as
    * [[FakeCodec.sampleFrames]] but as a pure expression
    * (sequence/transform), so planning a 100 TB frame-extraction job
    * never leaves the declarative plan. Empty for nFrames <= 0. */
  def frameSampleOffsets(nFrames: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column = {
    val take = least(lit(n), nFrames)
    when(nFrames <= 0 || lit(n) <= 0, array().cast("array<int>"))
      .otherwise(transform(sequence(lit(0), take - 1),
        i => (i * nFrames.cast("long") / take.cast("long")).cast("int")))
  }

  /** STUB resize: a real build decodes, scales, and re-encodes the
    * payload; the deterministic stand-in truncates it to a
    * width×height byte budget (one byte per pixel placeholder) so the
    * plumbing — metadata rewrite, byte accounting, map-side-only
    * execution — is real and testable. Payloads already under budget
    * pass through unchanged; `meta.width/height` always update. Swap
    * the payload expression for a real codec call and nothing else
    * changes. */
  def resizeStub(df: DataFrame, width: Int, height: Int): DataFrame = {
    require(width > 0 && height > 0, s"resize to ${width}x$height")
    // Long product, capped: 65536×65536 must not overflow Int to a
    // zero budget that would silently empty every payload
    val budget = math.min(width.toLong * height.toLong, Int.MaxValue.toLong).toInt
    df.withColumn("payload", substring(col("payload"), 1, budget))
      .withColumn("meta", struct(
        lit(width).as("width"), lit(height).as("height"),
        col("meta.sample_rate").as("sample_rate"),
        col("meta.n_frames").as("n_frames")))
  }

  /** Payload-size-aware repartitioning: target ≤ `bytesPerPartition`
    * of media per task regardless of row-size skew. */
  def repartitionForPayloads(df: DataFrame, bytesPerPartition: Long): DataFrame = {
    val totalBytes = df.agg(sum(length(col("payload")))).head().getLong(0)
    val parts = math.max(1, (totalBytes / bytesPerPartition).toInt)
    df.repartition(parts)
  }

  /** Builds a deterministic multimodal frame from the documents table
    * (text bytes as stand-in payloads) — the fixture generator for
    * tests and demo queries. */
  def syntheticMedia(spark: SparkSession, documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      (when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit(64).as("width"), lit(64).as("height"),
        lit(16000).as("sample_rate"),
        (col("n_chars") % 100).cast("int").as("n_frames")).as("meta"))
}
