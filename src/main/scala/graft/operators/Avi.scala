package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL pure-JVM AVI video-container codec (no native deps, no
  * library codec): RIFF('AVI ') with an uncompressed 24-bit DIB video
  * stream — LIST(hdrl(avih, LIST(strl(strh 'vids'/'DIB ', strf
  * BITMAPINFOHEADER)))), LIST(movi('00db' raw bottom-up BGR frames)),
  * idx1. Like WAV (RIFF chunk walk) and BMP (DIB pixel array), the
  * whole format is integer plumbing — NO entropy codec anywhere — so
  * every header field, every frame byte, and the total encoded length
  * are SQL-replayable, and d43 hash-gates the full decode →
  * frame-sample → stats → re-encode → re-decode chain the way d33/
  * d38/d41 gate PNG/GIF/BMP. This puts a real multi-frame VIDEO
  * CONTAINER behind the frame-sampling pipeline op, shrinking the
  * disclosed FakeCodec boundary to entropy-coded formats only
  * (H.264-class video essence, MP3/AAC audio).
  *
  * Frame payloads are byte-identical to BMP pixel arrays (BGR,
  * bottom-up, 4-byte row stride), so AviCodecSpec cross-validates
  * each extracted frame through the INDEPENDENT d41 BMP path — which
  * is itself cross-validated against ImageIO — by prepending a
  * BITMAPFILEHEADER and comparing planes.
  *
  * Scope: single 'vids' stream, BI_RGB 24-bit, bottom-up. Anything
  * else — compressed essence, other bit depths, multiple streams,
  * top-down frames, truncated chunks, frame-count mismatches between
  * avih/strh/movi — returns None: quarantine, never a guess. */
object AviCodec {

  final case class AviVideo(width: Int, height: Int, fps: Int,
      frames: Seq[Array[Int]]) {
    require(frames.nonEmpty, "AVI needs at least one frame")
    require(frames.forall(_.length == width * height * 3),
      s"each frame must be $width*$height*3 RGB ints")
  }

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def fcc(b: Array[Byte], i: Int): String =
    new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)), "US-ASCII")

  private def stride(w: Int): Int = (w * 3 + 3) & ~3

  /** Total encoded byte length — a closed form the oracle replays:
    * 232 + nFrames · (24 + stride·height). */
  def encodedLength(width: Int, height: Int, nFrames: Int): Long =
    232L + nFrames.toLong * (24L + stride(width).toLong * height)

  /** Encode a single-stream uncompressed AVI. Deterministic: the same
    * video always produces the same bytes. */
  def encodeAvi(v: AviVideo): Array[Byte] = {
    val st = stride(v.width)
    val fb = st * v.height            // '00db' payload bytes (mult of 4)
    val nF = v.frames.length
    val out = new Array[Byte](encodedLength(v.width, v.height, nF).toInt)
    var pos = 0
    def putFcc(s: String): Unit = {
      var i = 0
      while (i < 4) { out(pos + i) = s.charAt(i).toByte; i += 1 }
      pos += 4
    }
    def put16(x: Int): Unit = {
      out(pos) = (x & 0xff).toByte; out(pos + 1) = ((x >> 8) & 0xff).toByte
      pos += 2
    }
    def put32(x: Long): Unit = {
      out(pos) = (x & 0xff).toByte
      out(pos + 1) = ((x >> 8) & 0xff).toByte
      out(pos + 2) = ((x >> 16) & 0xff).toByte
      out(pos + 3) = ((x >> 24) & 0xff).toByte
      pos += 4
    }
    putFcc("RIFF"); put32(out.length - 8L); putFcc("AVI ")
    putFcc("LIST"); put32(192L); putFcc("hdrl")
    putFcc("avih"); put32(56L)
    put32(1000000L / v.fps)           // dwMicroSecPerFrame
    put32(0L); put32(0L)              // maxBytesPerSec, padding
    put32(0x10L)                      // AVIF_HASINDEX
    put32(nF.toLong); put32(0L)       // totalFrames, initialFrames
    put32(1L)                         // dwStreams
    put32(fb + 8L)                    // suggestedBufferSize
    put32(v.width.toLong); put32(v.height.toLong)
    put32(0L); put32(0L); put32(0L); put32(0L) // reserved
    putFcc("LIST"); put32(116L); putFcc("strl")
    putFcc("strh"); put32(56L)
    putFcc("vids"); putFcc("DIB ")
    put32(0L)                         // flags
    put16(0); put16(0)                // priority, language
    put32(0L)                         // initialFrames
    put32(1L); put32(v.fps.toLong)    // scale, rate → fps
    put32(0L); put32(nF.toLong)       // start, length (frames)
    put32(fb.toLong)                  // suggestedBufferSize
    put32(0L); put32(0L)              // quality, sampleSize
    put16(0); put16(0); put16(v.width); put16(v.height) // rcFrame
    putFcc("strf"); put32(40L)
    put32(40L)                        // biSize
    put32(v.width.toLong); put32(v.height.toLong) // bottom-up (positive)
    put16(1); put16(24)               // planes, bitcount
    put32(0L)                         // BI_RGB
    put32(fb.toLong)                  // biSizeImage
    put32(0L); put32(0L); put32(0L); put32(0L) // ppm, clrUsed/Important
    putFcc("LIST"); put32(4L + nF.toLong * (8L + fb)); putFcc("movi")
    val frameOffsets = new Array[Long](nF)
    val moviFccPos = 220 // fixed layout: 12 RIFF + 200 hdrl + 8 LIST hdr
    var f = 0
    while (f < nF) {
      frameOffsets(f) = pos - moviFccPos
      putFcc("00db"); put32(fb.toLong)
      val px = v.frames(f)
      var y = 0
      while (y < v.height) {
        val srcRow = v.height - 1 - y   // bottom-up
        var x = 0
        while (x < v.width) {
          val base = (srcRow * v.width + x) * 3
          val off = pos + y * st + x * 3
          out(off) = (px(base + 2) & 0xff).toByte     // B
          out(off + 1) = (px(base + 1) & 0xff).toByte // G
          out(off + 2) = (px(base) & 0xff).toByte     // R
          x += 1
        }
        y += 1
      }
      pos += fb
      f += 1
    }
    putFcc("idx1"); put32(16L * nF)
    f = 0
    while (f < nF) {
      putFcc("00db"); put32(0x10L)      // AVIIF_KEYFRAME
      put32(frameOffsets(f)); put32(fb.toLong)
      f += 1
    }
    require(pos == out.length, s"encoder wrote $pos of ${out.length}")
    out
  }

  /** Full decode. None for: bad RIFF/AVI magic, missing/malformed
    * hdrl/avih/strl/strh/strf, more than one stream, non-'vids' or
    * compressed essence, depth != 24, negative (top-down) height,
    * truncated movi, frame-size or frame-count mismatch — quarantine,
    * never a guess. Unknown top-level chunks (JUNK etc.) are skipped;
    * a non-'00db' chunk inside movi quarantines. */
  def decodeAvi(p: Array[Byte]): Option[AviVideo] = {
    if (p.length < 24 || fcc(p, 0) != "RIFF" || fcc(p, 8) != "AVI ")
      return None
    if (le32(p, 4) != p.length - 8L) return None
    var w = -1; var h = -1; var fps = -1
    var declaredFrames = -1L; var strhFrames = -1L
    var frames: Option[Seq[Array[Int]]] = None
    var pos = 12
    while (pos + 8 <= p.length) {
      val ck = fcc(p, pos)
      val sz = le32(p, pos + 4)
      if (sz < 0 || pos + 8 + sz > p.length) return None
      if (ck == "LIST") {
        if (sz < 4) return None
        val listType = fcc(p, pos + 8)
        if (listType == "hdrl") {
          // avih directly inside
          var q = pos + 12
          val end = pos + 8 + sz.toInt
          while (q + 8 <= end) {
            val c2 = fcc(p, q); val s2 = le32(p, q + 4)
            if (s2 < 0 || q + 8 + s2 > end) return None
            if (c2 == "avih") {
              if (s2 != 56L) return None
              declaredFrames = le32(p, q + 8 + 16)
              if (le32(p, q + 8 + 24) != 1L) return None // streams != 1
              w = le32(p, q + 8 + 32).toInt
              h = le32(p, q + 8 + 36).toInt
            } else if (c2 == "LIST" && s2 >= 4 && fcc(p, q + 8) == "strl") {
              var r = q + 12
              val e2 = q + 8 + s2.toInt
              while (r + 8 <= e2) {
                val c3 = fcc(p, r); val s3 = le32(p, r + 4)
                if (s3 < 0 || r + 8 + s3 > e2) return None
                if (c3 == "strh") {
                  if (s3 != 56L) return None
                  if (fcc(p, r + 8) != "vids") return None
                  val scale = le32(p, r + 8 + 20)
                  val rate = le32(p, r + 8 + 24)
                  if (scale != 1L || rate <= 0L || rate > Int.MaxValue)
                    return None
                  fps = rate.toInt
                  strhFrames = le32(p, r + 8 + 32)
                } else if (c3 == "strf") {
                  if (s3 != 40L || le32(p, r + 8) != 40L) return None
                  val bw = le32(p, r + 8 + 4).toInt
                  val bh = le32(p, r + 8 + 8).toInt
                  if (bh < 0) return None // top-down: quarantine
                  if (le16(p, r + 8 + 12) != 1 || le16(p, r + 8 + 14) != 24)
                    return None
                  if (le32(p, r + 8 + 16) != 0L) return None // compressed
                  if (bw != w || bh != h) return None
                }
                r += 8 + s3.toInt + (s3.toInt & 1)
              }
            }
            q += 8 + s2.toInt + (s2.toInt & 1)
          }
        } else if (listType == "movi") {
          if (w <= 0 || h <= 0 ||
            w.toLong * h > Int.MaxValue / 8) return None
          val st = stride(w)
          val fb = st * h
          val buf = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
          var q = pos + 12
          val end = pos + 8 + sz.toInt
          while (q + 8 <= end) {
            val c2 = fcc(p, q); val s2 = le32(p, q + 4)
            if (c2 != "00db" || s2 != fb.toLong) return None
            if (q + 8 + fb > end) return None
            val px = new Array[Int](w * h * 3)
            var y = 0
            while (y < h) {
              val dstRow = h - 1 - y
              var x = 0
              while (x < w) {
                val off = q + 8 + y * st + x * 3
                val base = (dstRow * w + x) * 3
                px(base) = p(off + 2) & 0xff
                px(base + 1) = p(off + 1) & 0xff
                px(base + 2) = p(off) & 0xff
                x += 1
              }
              y += 1
            }
            buf += px
            q += 8 + fb
          }
          if (q != end) return None
          frames = Some(buf.toSeq)
        }
        // other LISTs skipped
      }
      // non-LIST top-level chunks (idx1, JUNK) skipped
      pos += 8 + sz.toInt + (sz.toInt & 1)
    }
    frames match {
      case Some(fs)
        if fs.nonEmpty && w > 0 && h > 0 && fps > 0 &&
          declaredFrames == fs.length.toLong &&
          strhFrames == fs.length.toLong =>
        Some(AviVideo(w, h, fps, fs))
      case _ => None
    }
  }

  /** Deterministic AVI fixture: complete valid single-stream clips
    * whose frame pixels are pure integer functions of `doc_id` —
    * p(f,x,y,c) = (doc_id + 11f + 7c + 3x + 5y) mod 249 (mod 249 so no
    * engine confuses it with the PNG/BMP/GIF fixtures' 251/253/256).
    * Widths 4..9 cover every 4-byte stride remainder; frame counts
    * 2..5 cross the 4-frame sampling budget both ways. */
  def syntheticAvis(spark: SparkSession, documents: DataFrame): DataFrame = {
    val src = documents.select(col("doc_id").cast("long"))
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val rdd = src.rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val w = (4 + id % 6).toInt
        val h = (3 + id % 4).toInt
        val nF = (2 + id % 4).toInt
        val fps = (10 + id % 5).toInt
        val frames = (0 until nF).map { f =>
          val px = new Array[Int](w * h * 3)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              var c = 0
              while (c < 3) {
                px((y * w + x) * 3 + c) =
                  ((id + 11 * f + 7 * c + 3 * x + 5 * y) % 249).toInt
                c += 1
              }
              x += 1
            }
            y += 1
          }
          px
        }
        Row(id, encodeAvi(AviVideo(w, h, fps, frames)))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** The d43 gate kernel: decode each clip, sample frames at the d10
    * offsets (i·nF / min(budget, nF)), compute per-sampled-frame pixel
    * statistics from the RE-DECODED planes of a re-encoded copy (so
    * the full decode → re-encode → re-decode chain is exercised), and
    * carry the bit-exact round-trip flag plus the closed-form encoded
    * length. Payloads never shuffle; undecodable clips yield null
    * stats (quarantine). One row per (clip, sampled frame). */
  def sampleAviFrameStats(df: DataFrame, budget: Int): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("fps", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true),
      StructField("enc_len", LongType, nullable = true),
      StructField("bytes_eq", IntegerType, nullable = true),
      StructField("frame_idx", IntegerType, nullable = true),
      StructField("sum_val", LongType, nullable = true),
      StructField("wsum", LongType, nullable = true)))
    val idIdx = df.schema.fieldIndex("media_id")
    val payloadIdx = df.schema.fieldIndex("payload")
    val rdd = df.rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        decodeAvi(bytes) match {
          case Some(v) =>
            val re = encodeAvi(v)
            val eq = if (java.util.Arrays.equals(re, bytes)) 1 else 0
            decodeAvi(re) match {
              case Some(v2) =>
                val nF = v2.frames.length
                val k = math.min(budget, nF)
                (0 until k).map { i =>
                  val fi = i * nF / k
                  val px = v2.frames(fi)
                  var sum = 0L; var wsum = 0L
                  var y = 0
                  while (y < v2.height) {
                    var x = 0
                    while (x < v2.width) {
                      var c = 0
                      while (c < 3) {
                        val pv = px((y * v2.width + x) * 3 + c)
                        sum += pv
                        wsum += pv.toLong * (1 + (x + 3 * y + 11 * c) % 7)
                        c += 1
                      }
                      x += 1
                    }
                    y += 1
                  }
                  Row(id, v2.width, v2.height, v2.fps, nF,
                    re.length.toLong, eq, fi, sum, wsum)
                }
              case None =>
                Seq(Row(id, null, null, null, null, null, 0, null, null, null))
            }
          case None =>
            Seq(Row(id, null, null, null, null, null, null, null, null, null))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
