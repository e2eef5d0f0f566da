package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL pure-JVM GIF codec (no native deps, no library codec): the
  * LZW dictionary coder — GIF's actual entropy stage — is implemented
  * here from the GIF89a specification (variable-width codes 9→12 bits,
  * LSB-first bit packing, clear/EOI codes, 4096-entry table reset,
  * the deferred "KwKwK" first-entry case), together with the full
  * container walk: header, logical screen descriptor, global/local
  * color tables, extension-block skip, sub-block de-framing, trailer.
  *
  * This closes most of what remained of the disclosed FakeCodec
  * boundary for images: after PNG (zlib, d33) this is the second
  * complete compressed image format the engine decodes for real, and
  * unlike PNG's JDK `Inflater`, the compression layer itself is
  * implemented in this file — nothing between the payload bytes and
  * the gated pixel arithmetic is a stand-in. Correctness is pinned two
  * independent ways:
  *
  *   - d38 hash-gates decode → re-encode → re-decode against an
  *     external SQL replay of the closed-form pixel functions (the
  *     d33 pattern — a bug in code widths, bit order, dictionary
  *     growth or reset diverges from the oracle's arithmetic);
  *   - GifCodecSpec cross-validates against the JDK's OWN independent
  *     GIF implementation (`javax.imageio`): payloads this encoder
  *     writes must decode to identical pixels under ImageIO, and
  *     ImageIO-written GIFs must decode identically under this
  *     decoder — spec conformance proved against a second
  *     implementation, not self-agreement.
  *
  * Scope: single-frame GIFs, 2/4/8-bit color tables, sequential AND
  * 4-pass interlaced row order (ImageIO's writer interlaces by
  * default, so real-world files need it). Pixels are palette INDICES
  * (the palette rides alongside); training pipelines treat the index
  * plane + palette as the decoded image.
  */
object GifCodec {

  /** One decoded frame: index plane (row-major) + RGB palette
    * (packed 0xRRGGBB, length = 2^tableBits). */
  final case class Gif(width: Int, height: Int, palette: Array[Int],
      indices: Array[Byte]) {
    require(indices.length == width * height,
      s"index plane ${indices.length} != $width*$height")
  }

  // ---- LZW (GIF variant) --------------------------------------------

  /** GIF-LZW compress: `minCodeSize`-bit symbols (palette indices) →
    * sub-block-ready byte stream. Emits CLEAR first (per spec), grows
    * code width 9→12, emits CLEAR and resets when the table fills —
    * deterministic output for a given input. */
  def lzwEncode(indices: Array[Byte], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream(indices.length / 2 + 16)
    var bitBuf = 0L
    var bitCnt = 0
    var codeSize = minCodeSize + 1
    def put(code: Int): Unit = {
      bitBuf |= (code.toLong << bitCnt)
      bitCnt += codeSize
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xff).toInt)
        bitBuf >>>= 8
        bitCnt -= 8
      }
    }
    // dictionary: string → code, strings built incrementally as
    // (prefixCode << 8 | nextByte) → code
    var dict = new java.util.HashMap[Integer, Integer]()
    var nextCode = eoi + 1
    put(clear)
    var prev = -1 // current prefix code (-1 = none)
    var i = 0
    while (i < indices.length) {
      val k = indices(i) & 0xff
      if (prev < 0) prev = k
      else {
        val key = Integer.valueOf((prev << 8) | k)
        val hit = dict.get(key)
        if (hit != null) prev = hit.intValue()
        else {
          put(prev)
          if (nextCode < 4096) {
            dict.put(key, Integer.valueOf(nextCode))
            // the code that was just defined is the first one encoded
            // at the WIDER width (per spec the width bump happens when
            // nextCode exceeds the current width's range)
            if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
            nextCode += 1
          } else {
            put(clear)
            dict = new java.util.HashMap[Integer, Integer]()
            nextCode = eoi + 1
            codeSize = minCodeSize + 1
          }
          prev = k
        }
      }
      i += 1
    }
    if (prev >= 0) put(prev)
    put(eoi)
    if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }

  /** GIF-LZW decompress: inverse of [[lzwEncode]], tolerant of any
    * spec-conforming encoder (early or deferred clears, full-table
    * continuation without reset). Returns None on a corrupt stream
    * (out-of-range code, missing data) — quarantine, never a guess. */
  def lzwDecode(data: Array[Byte], minCodeSize: Int,
      expected: Int): Option[Array[Byte]] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new Array[Byte](expected)
    var outN = 0
    // dictionary as (prefix code, appended byte); roots are implicit
    val prefix = new Array[Int](4096)
    val append = new Array[Byte](4096)
    var nextCode = eoi + 1
    var codeSize = minCodeSize + 1
    var bitBuf = 0L
    var bitCnt = 0
    var pos = 0
    var prev = -1
    val stack = new Array[Byte](4096)
    def emit(code: Int): Boolean = { // expand `code` into out; false = overflow
      var sp = 0
      var c = code
      while (c >= clear) { // composite codes chain through prefix[]
        if (sp >= stack.length) return false
        stack(sp) = append(c); sp += 1; c = prefix(c)
      }
      if (outN + sp + 1 > expected) return false
      out(outN) = c.toByte; outN += 1
      while (sp > 0) { sp -= 1; out(outN) = stack(sp); outN += 1 }
      true
    }
    def firstByte(code: Int): Int = {
      var c = code
      while (c >= clear) c = prefix(c)
      c
    }
    while (true) {
      while (bitCnt < codeSize) {
        if (pos >= data.length) return None // ran out before EOI
        bitBuf |= (data(pos) & 0xffL) << bitCnt
        pos += 1
        bitCnt += 8
      }
      val code = (bitBuf & ((1L << codeSize) - 1)).toInt
      bitBuf >>>= codeSize
      bitCnt -= codeSize
      if (code == clear) {
        nextCode = eoi + 1
        codeSize = minCodeSize + 1
        prev = -1
      } else if (code == eoi) {
        return if (outN == expected) Some(out) else None
      } else if (prev < 0) {
        if (code >= clear) return None // first code must be a root
        if (!emit(code)) return None
        prev = code
      } else {
        if (code > nextCode || (code == nextCode && nextCode >= 4096))
          return None
        if (code == nextCode) {
          // KwKwK: the just-about-to-be-defined entry = prev + first(prev)
          if (nextCode >= 4096) return None
          prefix(nextCode) = prev
          append(nextCode) = firstByte(prev).toByte
          if (!emit(nextCode)) return None
          nextCode += 1
          if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
          prev = code
        } else {
          if (!emit(code)) return None
          if (nextCode < 4096) {
            prefix(nextCode) = prev
            append(nextCode) = firstByte(code).toByte
            nextCode += 1
            if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
          }
          prev = code
        }
      }
    }
    None // unreachable
  }

  // ---- container ----------------------------------------------------

  /** Encode a complete single-frame GIF89a: header + LSD + global
    * color table + image descriptor + LZW data in ≤255-byte sub-blocks
    * + trailer. `palette` length must be a power of two in [2,256]. */
  def encodeGif(g: Gif): Array[Byte] = {
    val n = g.palette.length
    require(n >= 2 && n <= 256 && (n & (n - 1)) == 0,
      s"palette size $n not a power of two in [2,256]")
    val tableBits = 31 - Integer.numberOfLeadingZeros(n) // log2
    val out = new java.io.ByteArrayOutputStream(
      g.indices.length / 2 + 3 * n + 64)
    def put16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    put16(g.width); put16(g.height)
    // GCT present | color resolution 7 | GCT size
    out.write(0x80 | (7 << 4) | (tableBits - 1))
    out.write(0) // background color index
    out.write(0) // pixel aspect ratio
    var i = 0
    while (i < n) {
      val rgb = g.palette(i)
      out.write((rgb >> 16) & 0xff); out.write((rgb >> 8) & 0xff)
      out.write(rgb & 0xff)
      i += 1
    }
    out.write(0x2c) // image descriptor
    put16(0); put16(0); put16(g.width); put16(g.height)
    out.write(0) // no local table, not interlaced
    val minCodeSize = math.max(2, tableBits) // spec floor of 2
    out.write(minCodeSize)
    val lzw = lzwEncode(g.indices, minCodeSize)
    var off = 0
    while (off < lzw.length) {
      val len = math.min(255, lzw.length - off)
      out.write(len)
      out.write(lzw, off, len)
      off += len
    }
    out.write(0) // sub-block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Decode the first frame of a GIF (the still-image view). */
  def decodeGif(p: Array[Byte]): Option[Gif] =
    decodeGifFrames(p).flatMap(_.headOption)

  /** Full decode of ALL frames of a (possibly animated) GIF. Each
    * frame is returned as its raw index plane + palette — the planes a
    * frame-sampling pipeline feeds a vision encoder (no disposal-mode
    * compositing; the fixtures and ImageIO's writer emit full frames).
    * None for: bad magic, missing color table, truncated/corrupt
    * sub-blocks or LZW stream, dimension overflow, zero frames —
    * quarantine, never a guess. Extension blocks (graphic control,
    * comment, application, netscape loop) are walked and skipped, so
    * ImageIO-authored files decode too; interlaced frames are
    * de-interlaced (the 4-pass row permutation). */
  def decodeGifFrames(p: Array[Byte]): Option[Vector[Gif]] = {
    if (p.length < 13) return None
    val magic = new String(p, 0, 6, "US-ASCII")
    if (magic != "GIF87a" && magic != "GIF89a") return None
    def u16(i: Int): Int = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    val packed = p(10) & 0xff
    var pos = 13
    var globalPal: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      if (pos + 3 * n > p.length) return None
      globalPal = readPalette(p, pos, n)
      pos += 3 * n
    }
    val frames = Vector.newBuilder[Gif]
    var nFrames = 0
    // block walk
    while (pos < p.length) {
      (p(pos) & 0xff) match {
        case 0x3b => // trailer
          return if (nFrames > 0) Some(frames.result()) else None
        case 0x21 => // extension: label + sub-blocks
          pos += 2
          while (pos < p.length && (p(pos) & 0xff) != 0)
            pos += 1 + (p(pos) & 0xff)
          if (pos >= p.length) return None
          pos += 1 // terminator
        case 0x2c =>
          if (pos + 10 > p.length) return None
          // sub-frame placement (non-zero left/top offsets) is out of
          // scope exactly like disposal compositing: decoding such a
          // frame as if it sat at the origin would silently drop
          // position information, so quarantine — never a guess. The
          // fixtures and ImageIO's writer emit full origin frames.
          if (u16(pos + 1) != 0 || u16(pos + 3) != 0) return None
          val iw = u16(pos + 5); val ih = u16(pos + 7)
          val ipacked = p(pos + 9) & 0xff
          pos += 10
          val interlaced = (ipacked & 0x40) != 0
          var pal = globalPal
          if ((ipacked & 0x80) != 0) {
            val n = 2 << (ipacked & 7)
            if (pos + 3 * n > p.length) return None
            pal = readPalette(p, pos, n)
            pos += 3 * n
          }
          if (pal == null) return None
          if (iw <= 0 || ih <= 0) return None
          val nPx = iw.toLong * ih
          if (nPx > Int.MaxValue / 4) return None // dimension guard
          if (pos >= p.length) return None
          val minCodeSize = p(pos) & 0xff
          pos += 1
          if (minCodeSize < 2 || minCodeSize > 11) return None
          // de-frame sub-blocks
          val data = new java.io.ByteArrayOutputStream(nPx.toInt / 2 + 16)
          var bl = -1
          while (pos < p.length && { bl = p(pos) & 0xff; bl != 0 }) {
            if (pos + 1 + bl > p.length) return None
            data.write(p, pos + 1, bl)
            pos += 1 + bl
          }
          if (pos >= p.length) return None // missing terminator
          pos += 1 // consume terminator
          val raw = lzwDecode(data.toByteArray, minCodeSize, nPx.toInt)
            .getOrElse(return None)
          // GIF's 4-pass interlace (rows 0,8,.. / 4,12,.. / 2,6,.. /
          // 1,3,..) is a pure row permutation of the decoded stream —
          // ImageIO's writer emits it by default, so real-world files
          // need it, not quarantine
          val idx =
            if (!interlaced) raw
            else {
              val d = new Array[Byte](raw.length)
              var src = 0
              for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
                var y = start
                while (y < ih) {
                  System.arraycopy(raw, src * iw, d, y * iw, iw)
                  src += 1
                  y += step
                }
              }
              d
            }
          // indices must address the palette
          var i = 0
          while (i < idx.length) {
            if ((idx(i) & 0xff) >= pal.length) return None
            i += 1
          }
          frames += Gif(iw, ih, pal, idx)
          nFrames += 1
        case _ => return None
      }
    }
    None // ran off the end without a trailer
  }

  /** Encode a complete ANIMATED GIF89a: one image per frame (all
    * sharing frame 0's palette as the global color table), each
    * preceded by a graphic-control extension with a 100 ms delay, plus
    * the netscape loop extension — the layout ImageIO and browsers
    * both accept. */
  def encodeAnimatedGif(frames: Seq[Gif]): Array[Byte] = {
    require(frames.nonEmpty, "no frames")
    val pal = frames.head.palette
    require(frames.forall(_.palette.sameElements(pal)),
      "animated fixture frames must share one palette")
    val n = pal.length
    require(n >= 2 && n <= 256 && (n & (n - 1)) == 0,
      s"palette size $n not a power of two in [2,256]")
    val tableBits = 31 - Integer.numberOfLeadingZeros(n)
    val out = new java.io.ByteArrayOutputStream(4096)
    def put16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    val sw = frames.map(_.width).max; val sh = frames.map(_.height).max
    put16(sw); put16(sh)
    out.write(0x80 | (7 << 4) | (tableBits - 1))
    out.write(0); out.write(0)
    var i = 0
    while (i < n) {
      val rgb = pal(i)
      out.write((rgb >> 16) & 0xff); out.write((rgb >> 8) & 0xff)
      out.write(rgb & 0xff)
      i += 1
    }
    // netscape 2.0 loop-forever application extension
    out.write(0x21); out.write(0xff); out.write(11)
    out.write("NETSCAPE2.0".getBytes("US-ASCII"))
    out.write(3); out.write(1); put16(0); out.write(0)
    frames.foreach { g =>
      out.write(0x21); out.write(0xf9); out.write(4) // graphic control
      out.write(0) // no disposal, no transparency
      put16(10) // 100 ms
      out.write(0); out.write(0)
      out.write(0x2c)
      put16(0); put16(0); put16(g.width); put16(g.height)
      out.write(0) // global table, not interlaced
      val minCodeSize = math.max(2, tableBits)
      out.write(minCodeSize)
      val lzw = lzwEncode(g.indices, minCodeSize)
      var off = 0
      while (off < lzw.length) {
        val len = math.min(255, lzw.length - off)
        out.write(len)
        out.write(lzw, off, len)
        off += len
      }
      out.write(0)
    }
    out.write(0x3b)
    out.toByteArray
  }

  private def readPalette(p: Array[Byte], off: Int, n: Int): Array[Int] = {
    val pal = new Array[Int](n)
    var i = 0
    while (i < n) {
      pal(i) = ((p(off + 3 * i) & 0xff) << 16) |
        ((p(off + 3 * i + 1) & 0xff) << 8) | (p(off + 3 * i + 2) & 0xff)
      i += 1
    }
    pal
  }

  // ---- Spark plumbing (the d33 shape: fixture → decode → stats) -----

  /** Deterministic FULL GIF fixture: complete valid GIF89a files (real
    * LZW streams) over an identity grayscale 256-palette, whose index
    * plane is a pure integer function of `doc_id` — idx(x,y) =
    * (doc_id + 3x + 5y) mod 256 — so an external SQL engine can replay
    * every pixel. Any bug in code widths, LSB bit packing, dictionary
    * growth/reset or sub-block framing diverges from the oracle. */
  def syntheticGifs(spark: SparkSession, documents: DataFrame): DataFrame = {
    val src = documents.select(col("doc_id").cast("long"))
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val grayPal = Array.tabulate(256)(i => (i << 16) | (i << 8) | i)
    val rdd = src.rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val w = (8 + id % 9).toInt
        val h = (8 + id % 7).toInt
        val idx = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            idx(y * w + x) = ((id + 3 * x + 5 * y) % 256).toByte
            x += 1
          }
          y += 1
        }
        Row(id, encodeGif(Gif(w, h, grayPal, idx)))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Batched per-partition GIF decode → per-image statistics:
    * dimensions, palette size, index sum, a position-weighted index
    * sum (weight 1 + (x+3y) mod 7 — a transposed decode cannot fake
    * it), and the palette-mapped red-channel sum (proves the color
    * table was read, not just the index plane). Payloads never
    * shuffle; undecodable rows yield null stats (quarantine). */
  def decodeGifStats(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("pal_size", IntegerType, nullable = true),
      StructField("sum_idx", LongType, nullable = true),
      StructField("wsum_idx", LongType, nullable = true),
      StructField("sum_red", LongType, nullable = true)))
    val idIdx = df.schema.fieldIndex("media_id")
    val payloadIdx = df.schema.fieldIndex("payload")
    val rdd = df.rdd.mapPartitions { it =>
      it.map { r =>
        decodeGif(r.getAs[Array[Byte]](payloadIdx)) match {
          case Some(g) =>
            var sum = 0L; var wsum = 0L; var red = 0L
            var y = 0
            while (y < g.height) {
              var x = 0
              while (x < g.width) {
                val v = g.indices(y * g.width + x) & 0xff
                sum += v
                wsum += v.toLong * (1 + (x + 3 * y) % 7)
                red += (g.palette(v) >> 16) & 0xff
                x += 1
              }
              y += 1
            }
            Row(r.getLong(idIdx), g.width, g.height, g.palette.length,
              sum, wsum, red)
          case None => Row(r.getLong(idIdx), null, null, null, null, null, null)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic ANIMATED GIF fixture: multi-frame GIF89a files
    * (graphic-control extensions, netscape loop block, shared global
    * palette) whose frame planes are pure integer functions of
    * `doc_id` — idx(f,x,y) = (doc_id + 7f + 3x + 5y) mod 256 with
    * 3 + id mod 5 frames — so an external SQL engine can replay every
    * pixel of every frame. */
  def syntheticAnimatedGifs(spark: SparkSession, documents: DataFrame): DataFrame = {
    val src = documents.select(col("doc_id").cast("long"))
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val grayPal = Array.tabulate(256)(i => (i << 16) | (i << 8) | i)
    val rdd = src.rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val w = (6 + id % 7).toInt
        val h = (6 + id % 5).toInt
        val nf = (3 + id % 5).toInt
        val frames = (0 until nf).map { f =>
          val idx = new Array[Byte](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              idx(y * w + x) = ((id + 7 * f + 3 * x + 5 * y) % 256).toByte
              x += 1
            }
            y += 1
          }
          Gif(w, h, grayPal, idx)
        }
        Row(id, encodeAnimatedGif(frames))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL frame sampling over animated GIF payloads — the operation
    * [[Multimodal.FakeCodec.sampleFrames]] stands in for on true video
    * containers, done genuinely here: decode ALL frames, take the
    * d10 offsets (i·nF / min(n, nF) for i < min(n, nF) — evenly
    * spaced, first frame included), and emit per-sampled-frame pixel
    * statistics. One output row per (clip, sampled frame); payloads
    * never shuffle; undecodable clips emit a single null-stats row
    * (quarantine routing). */
  def sampleGifFrameStats(df: DataFrame, n: Int): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_frames", IntegerType, nullable = true),
      StructField("frame_idx", IntegerType, nullable = true),
      StructField("sum_idx", LongType, nullable = true),
      StructField("wsum_idx", LongType, nullable = true)))
    val idIdx = df.schema.fieldIndex("media_id")
    val payloadIdx = df.schema.fieldIndex("payload")
    val rdd = df.rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        decodeGifFrames(r.getAs[Array[Byte]](payloadIdx)) match {
          case Some(frames) =>
            val nf = frames.length
            val k = math.min(n, nf)
            (0 until k).iterator.map { i =>
              val fi = i * nf / k
              val g = frames(fi)
              var sum = 0L; var wsum = 0L
              var y = 0
              while (y < g.height) {
                var x = 0
                while (x < g.width) {
                  val v = g.indices(y * g.width + x) & 0xff
                  sum += v
                  wsum += v.toLong * (1 + (x + 3 * y) % 7)
                  x += 1
                }
                y += 1
              }
              Row(id, nf, fi, sum, wsum)
            }
          case None => Iterator.single(Row(id, null, null, null, null))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL re-encode over GIF payloads: decode → encode with this
    * file's LZW — the d33 re-encode shape, so d38 can gate the full
    * decode → re-encode → re-decode round trip. Undecodable payloads
    * pass through unchanged (quarantine routing happens at decode). */
  def reencodeGif(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val idIdx = df.schema.fieldIndex("media_id")
    val payloadIdx = df.schema.fieldIndex("payload")
    val rdd = df.rdd.mapPartitions { it =>
      it.map { r =>
        val p = r.getAs[Array[Byte]](payloadIdx)
        val out = decodeGif(p).map(encodeGif).getOrElse(p)
        Row(r.getLong(idIdx), out)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
