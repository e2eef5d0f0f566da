package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.syntheticMedia(spark,
    Tables(spark, "/root/testdata/sf0.001", "documents"))

  test("synthetic media frame matches the canonical schema shape") {
    assert(media.columns.toSeq == Seq("media_id", "kind", "payload", "meta"))
    assert(media.schema("payload").dataType.typeName == "binary")
    val kinds = media.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("feature extraction is deterministic, fixed-dim, partition-batched") {
    val f1 = Multimodal.extractFeatures(media, dim = 8)
    assert(f1.schema("features").dataType.typeName == "array")
    val rows = f1.orderBy("media_id").limit(3).collect()
    assert(rows.forall(_.getSeq[Double](2).length == 8))
    val again = Multimodal.extractFeatures(media, dim = 8)
      .orderBy("media_id").limit(3).collect()
    assert(rows.map(_.getSeq[Double](2)).toSeq == again.map(_.getSeq[Double](2)).toSeq)
  }

  test("distributed feature extraction equals the local FakeCodec kernel per row") {
    // pins the d06 VALUES, not just determinism: the partition-batched
    // distributed path must reproduce FakeCodec.decode applied locally
    // to each payload's bytes — the contract that survives swapping the
    // stub for a real decoder (only the kernel changes, not the plumbing)
    val rows = media.orderBy("media_id").limit(10)
      .select("media_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1))
    val got = Multimodal.extractFeatures(media, dim = 8)
      .orderBy("media_id").limit(10).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    rows.foreach { case (id, payload) =>
      val want = Multimodal.FakeCodec.decode(payload, dim = 8).toSeq
      assert(got(id) == want, s"media $id: distributed != local kernel")
    }
  }

  test("payload-size-aware repartitioning bounds bytes per task") {
    val parts = Multimodal.repartitionForPayloads(media, bytesPerPartition = 4096)
      .rdd.getNumPartitions
    assert(parts >= 2, "50 docs x ~250B should split into multiple partitions")
  }

  test("resize stub truncates to the pixel budget, rewrites metadata, passes short payloads") {
    import org.apache.spark.sql.functions._
    val media = graft.operators.Multimodal.syntheticMedia(spark,
      Tables(spark, "/root/testdata/sf0.001", "documents"))
    val resized = graft.operators.Multimodal.resizeStub(media, 8, 8)
    val rows = resized.select(length(col("payload")), col("meta.width"),
        col("meta.height")).collect()
    assert(rows.forall(_.getInt(0) <= 64), "payloads truncated to 8*8 bytes")
    assert(rows.forall(r => r.getInt(1) == 8 && r.getInt(2) == 8))
    // short payloads pass through byte-identical
    val tiny = media.filter(length(col("payload")) <= 64)
      .select(col("media_id"), col("payload"))
    if (tiny.count() > 0) {
      val joined = tiny.join(
        graft.operators.Multimodal.resizeStub(media, 8, 8)
          .select(col("media_id"), col("payload").as("p2")), "media_id")
      assert(joined.filter(col("payload") =!= col("p2")).count() == 0)
    }
  }

  test("frame sampler stub: even spacing, bounds respected") {
    assert(Multimodal.FakeCodec.sampleFrames(100, 4).toSeq == Seq(0, 25, 50, 75))
    assert(Multimodal.FakeCodec.sampleFrames(2, 5).toSeq == Seq(0, 1))
    assert(Multimodal.FakeCodec.sampleFrames(0, 5).isEmpty)
  }

  test("frameSampleOffsets column matches FakeCodec.sampleFrames") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(0, 1, 2, 3, 4, 7, 50, 99).toDF("nf")
    val got = df.select(col("nf"),
      Multimodal.frameSampleOffsets(col("nf"), 4).as("off"))
      .as[(Int, Seq[Int])].collect().toMap
    for ((nf, off) <- got)
      assert(off == Multimodal.FakeCodec.sampleFrames(nf, 4).toSeq, s"nf=$nf")
  }

  // ---- MediaCodec: the REAL header parser ------------------------------

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  test("MediaCodec: pngBytes(1,1,rgba) reproduces the well-known 1x1 header bit-for-bit") {
    // Independent golden: signature + IHDR of the canonical 1×1 RGBA8
    // PNG, INCLUDING its published CRC (1f15c489) — validates our CRC32
    // scope (type+data) against the spec, not against our own builder.
    val golden = hex(
      "89504e470d0a1a0a 0000000d 49484452 00000001 00000001 08 06 000000 1f15c489")
    assert(Multimodal.MediaCodec.pngBytes(1, 1, 6, Array.empty).toSeq ==
      golden.toSeq)
  }

  test("MediaCodec: parses a hand-written JPEG SOF0 independent of jpegBytes") {
    // SOI + DQT-like dummy segment (skipped by length) + SOF0 720x1280,
    // 3 components — written by hand so parser and builder can't share
    // a bug.
    val bytes = hex(
      "ffd8" +                 // SOI
      "fffe 0004 dead" +       // COM segment, len 4 (payload 2 bytes)
      "ffc0 0011 08 02d0 0500 03 011100 021101 031101")
    val hd = Multimodal.MediaCodec.parseHeader(bytes)
    assert(hd.contains(Multimodal.MediaCodec.Header("jpeg", 1280, 720, 3)), hd.toString)
  }

  test("MediaCodec: build→parse round-trips dims and channels for both formats") {
    val body = "payload tail bytes".getBytes("UTF-8")
    for ((ct, ch) <- Seq(0 -> 1, 2 -> 3, 3 -> 1, 4 -> 2, 6 -> 4)) {
      val p = Multimodal.MediaCodec.pngBytes(640, 480, ct, body)
      assert(Multimodal.MediaCodec.parseHeader(p)
        .contains(Multimodal.MediaCodec.Header("png", 640, 480, ch)), s"ct=$ct")
    }
    for (n <- Seq(1, 3)) {
      val p = Multimodal.MediaCodec.jpegBytes(1920, 1080, n, body)
      assert(Multimodal.MediaCodec.parseHeader(p)
        .contains(Multimodal.MediaCodec.Header("jpeg", 1920, 1080, n)), s"n=$n")
    }
  }

  test("MediaCodec: garbage, truncation, and SOS-before-SOF all yield None, never throw") {
    val M = Multimodal.MediaCodec
    assert(M.parseHeader(null).isEmpty)
    assert(M.parseHeader(Array.empty).isEmpty)
    assert(M.parseHeader("not an image at all".getBytes).isEmpty)
    // valid PNG truncated mid-IHDR
    assert(M.parseHeader(M.pngBytes(9, 9, 2, Array.empty).take(20)).isEmpty)
    // JPEG that hits SOS with no SOF seen
    assert(M.parseHeader(hex("ffd8 ffda 0002")).isEmpty)
    // JPEG whose segment length runs past the buffer
    assert(M.parseHeader(hex("ffd8 ffe0 ffff 00")).isEmpty)
  }

  test("decodeHeaders manifest matches the fixture arithmetic (the d06 contract)") {
    import org.apache.spark.sql.functions.col
    val docs = spark.range(0, 40).toDF("doc_id")
      .withColumn("text", org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("doc body "), col("doc_id")))
    val got = Multimodal.decodeHeaders(Multimodal.syntheticImages(spark, docs))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    assert(got.size == 40 && !got.valuesIterator.exists(_._1 == null),
      "every fixture payload must parse")
    for (id <- 0L until 40L) {
      val (fmt, w, h, ch) = got(id)
      assert(fmt == (if (id % 2 == 0) "png" else "jpeg"), s"id=$id")
      assert(w == 16 + id % 64 && h == 16 + id % 48, s"id=$id dims")
      val expCh = if (id % 2 == 0) (id % 3) match { case 0 => 1; case 1 => 3; case _ => 4 }
                  else if (id % 4 == 1) 1 else 3
      assert(ch == expCh, s"id=$id channels")
    }
  }

  private def mkImage(w: Int, h: Int, ch: Int, seed: Int) = {
    val px = Array.tabulate(w * h * ch) { i =>
      // deterministic pseudo-random bytes: xorshift-ish mix of index+seed
      var v = i * 2654435761L + seed * 40503L
      v ^= v >>> 13; ((v & 0xff).toInt)
    }
    Multimodal.PixelCodec.Image(w, h, ch, px)
  }

  test("PixelCodec: encode→decode round-trips pixels exactly, all channel counts") {
    for {
      ch <- Seq(1, 2, 3, 4)
      (w, h) <- Seq((1, 1), (3, 2), (7, 11), (16, 5))
    } {
      val img = mkImage(w, h, ch, seed = ch * 100 + w)
      val back = Multimodal.PixelCodec.decodePng(
        Multimodal.PixelCodec.encodePng(img))
      assert(back.nonEmpty, s"decode failed ${w}x$h ch=$ch")
      assert(back.get.width == w && back.get.height == h &&
        back.get.channels == ch)
      assert(back.get.pixels.sameElements(img.pixels),
        s"pixel mismatch ${w}x$h ch=$ch")
    }
  }

  test("PixelCodec: a >=5-row image exercises every PNG filter type on decode") {
    // encoder rotates filter y % 5, so height 10 hits each filter twice;
    // round-trip equality therefore proves every unfilter branch
    val img = mkImage(9, 10, 3, seed = 7)
    val enc = Multimodal.PixelCodec.encodePng(img)
    // the raw (pre-zlib) stream is not visible here; assert via a
    // decoded-equality sentinel on an image whose every row differs
    assert(Multimodal.PixelCodec.decodePng(enc).get.pixels
      .sameElements(img.pixels))
  }

  test("PixelCodec: rejects palette, interlace, truncation, and corrupt zlib") {
    val P = Multimodal.PixelCodec
    val good = P.encodePng(mkImage(6, 6, 3, seed = 1))
    assert(P.decodePng(null).isEmpty)
    assert(P.decodePng(Array[Byte](1, 2, 3)).isEmpty)
    assert(P.decodePng(good.take(40)).isEmpty, "truncated chunk layout")
    // flip the IHDR color type to 3 (palette) — still CRC-unchecked by
    // our reader, so the rejection is the color-type branch itself
    val pal = good.clone(); pal(25 + 0) = 3 // offset 25 = IHDR colorType
    assert(P.decodePng(pal).isEmpty, "palette must be rejected")
    val inter = good.clone(); inter(28) = 1 // IHDR interlace byte
    assert(P.decodePng(inter).isEmpty, "Adam7 must be rejected")
    // nonzero compression METHOD / filter METHOD: the spec defines only
    // 0 for both; the IDAT of this file still inflates, so without the
    // explicit method checks decode would return garbage pixels instead
    // of honoring the "None, never a guess" quarantine contract
    val cm = good.clone(); cm(26) = 1 // IHDR compression method byte
    assert(P.decodePng(cm).isEmpty, "nonzero compression method rejected")
    val fm = good.clone(); fm(27) = 1 // IHDR filter method byte
    assert(P.decodePng(fm).isEmpty, "nonzero filter method rejected")
    // corrupt the zlib stream body (IDAT data); inflate must fail or
    // produce a short stream — either way decode yields None, no throw
    val zbad = good.clone()
    zbad(good.length - 20) = (zbad(good.length - 20) ^ 0x55).toByte
    P.decodePng(zbad) // must not throw (may legitimately still decode
    // if the flip hit zlib padding; the contract here is no-throw)
  }

  test("PixelCodec: crafted huge-dimension header quarantines as None, never throws") {
    // 65536x65536 passes the per-axis <= 2^20 guard; without the Long
    // total-size cap the Int buffer sizes wrap ((stride+1)*h -> 64KB,
    // w*h*ch -> 0) and the unfilter loop throws instead of quarantining
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Long): Array[Byte] = Array(
      ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length.toLong))
      val t = typ.getBytes("US-ASCII")
      out.write(t); out.write(data)
      val crc = new java.util.zip.CRC32
      crc.update(t); crc.update(data)
      out.write(be32(crc.getValue))
    }
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    val ihdr = new java.io.ByteArrayOutputStream()
    ihdr.write(be32(65536L)); ihdr.write(be32(65536L))
    ihdr.write(8); ihdr.write(0); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    chunk("IHDR", ihdr.toByteArray)
    val defl = new java.util.zip.Deflater()
    defl.setInput(Array.fill[Byte](1 << 16)(0)); defl.finish()
    val z = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) z.write(buf, 0, defl.deflate(buf))
    defl.end()
    chunk("IDAT", z.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    assert(Multimodal.PixelCodec.decodePng(out.toByteArray).isEmpty,
      "wrap-prone dimensions must quarantine, not decode or throw")
  }

  test("PixelCodec: nearest-neighbor resize reads floor(dst*src/dstDim) exactly") {
    val P = Multimodal.PixelCodec
    // 4x2 single-channel image with distinct values 0..7
    val img = P.Image(4, 2, 1, Array(0, 1, 2, 3, 4, 5, 6, 7))
    val up = P.resizeNearest(img, 8, 4)
    // sx = x*4/8 = x/2; sy = y*2/4 = y/2
    val want = Array(
      0, 0, 1, 1, 2, 2, 3, 3,
      0, 0, 1, 1, 2, 2, 3, 3,
      4, 4, 5, 5, 6, 6, 7, 7,
      4, 4, 5, 5, 6, 6, 7, 7)
    assert(up.pixels.sameElements(want), up.pixels.mkString(","))
    val down = P.resizeNearest(img, 2, 1)
    assert(down.pixels.sameElements(Array(0, 2)), down.pixels.mkString(","))
  }

  test("resizePng round trip: resized payloads re-decode at target dims with source pixels") {
    import spark.implicits._
    val P = Multimodal.PixelCodec
    val imgs = Seq(
      (1L, P.encodePng(mkImage(9, 7, 3, seed = 3))),
      (2L, P.encodePng(mkImage(12, 10, 1, seed = 4))),
      (3L, "not a png".getBytes("UTF-8"))) // quarantine row
      .toDF("media_id", "payload")
    val out = Multimodal.resizePng(imgs, 6, 6)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Array[Byte]](1), r.getBoolean(2)))).toMap
    assert(out(3L)._2 == false && new String(out(3L)._1, "UTF-8") == "not a png",
      "undecodable payloads pass through unchanged, flagged")
    for (id <- Seq(1L, 2L)) {
      val dec = P.decodePng(out(id)._1).get
      assert(out(id)._2 && dec.width == 6 && dec.height == 6)
    }
    // pixel-exact: resized(1) must equal resizeNearest of the source
    val src = mkImage(9, 7, 3, seed = 3)
    assert(P.decodePng(out(1L)._1).get.pixels
      .sameElements(P.resizeNearest(src, 6, 6).pixels))
  }

  private def mkWav(sr: Int, ch: Int, nf: Int, seed: Int) = {
    val samples = Array.tabulate(nf * ch) { i =>
      ((seed * 7 + i * 131) % 65536) - 32768
    }
    Multimodal.WavCodec.Wav(sr, ch, samples)
  }

  test("WavCodec: encode/decode round-trips rate, channels, and every sample") {
    val W = Multimodal.WavCodec
    for ((sr, ch, nf) <- Seq((8000, 1, 41), (16000, 2, 89), (44100, 2, 40))) {
      val w = mkWav(sr, ch, nf, seed = sr + ch)
      val back = W.decodeWav(W.encodeWav(w)).get
      assert(back.sampleRate == sr && back.channels == ch && back.nFrames == nf)
      assert(back.samples.sameElements(w.samples),
        s"sample round trip $sr/$ch/$nf")
    }
    // sign extension specifically: extremes and near-zero negatives
    val edge = W.Wav(8000, 1, Array(-32768, 32767, -1, 0, 1))
    assert(W.decodeWav(W.encodeWav(edge)).get.samples
      .sameElements(edge.samples))
  }

  test("WavCodec: malformed payloads quarantine as None, never throw") {
    val W = Multimodal.WavCodec
    val good = W.encodeWav(mkWav(16000, 2, 50, seed = 9))
    assert(W.decodeWav(null).isEmpty)
    assert(W.decodeWav("not audio at all".getBytes("UTF-8")).isEmpty)
    assert(W.decodeWav(good.take(43)).isEmpty, "below minimum size")
    assert(W.decodeWav(good.take(60)).isEmpty, "truncated data chunk")
    // non-PCM audioFormat (offset 20 = fmt data start): float (3)
    val flt = good.clone(); flt(20) = 3
    assert(W.decodeWav(flt).isEmpty, "float format must be rejected")
    // bits per sample (offset 34): 8-bit
    val b8 = good.clone(); b8(34) = 8
    assert(W.decodeWav(b8).isEmpty, "8-bit must be rejected")
    // zero channels (offset 22)
    val c0 = good.clone(); c0(22) = 0
    assert(W.decodeWav(c0).isEmpty, "0 channels must be rejected")
    // data size not a whole number of frames (offset 40 = data chunk
    // size for this fixed layout): stereo 16-bit needs multiples of 4
    val rag = good.clone(); rag(40) = (rag(40) - 2).toByte
    assert(W.decodeWav(rag).isEmpty, "ragged frame must be rejected")
  }

  test("WavCodec: resample index math is exact-integer and channel-coherent") {
    val W = Multimodal.WavCodec
    val w = mkWav(44100, 2, 89, seed = 5)
    val r = W.resample(w, 12000)
    assert(r.sampleRate == 12000 && r.channels == 2)
    assert(r.nFrames == (89L * 12000 / 44100).toInt) // floor = 24
    (0 until r.nFrames).foreach { i =>
      val src = (i.toLong * 44100 / 12000).toInt
      (0 until 2).foreach { c =>
        assert(r.samples(i * 2 + c) == w.samples(src * 2 + c),
          s"dst frame $i channel $c must read src frame $src")
      }
    }
    // upsample: more frames out than in, indexes stay in range
    val up = W.resample(w, 48000)
    assert(up.nFrames == (89L * 48000 / 44100).toInt)
    assert(up.samples.last == w.samples(
      ((up.nFrames - 1).toLong * 44100 / 48000).toInt * 2 + 1))
  }

  test("WavCodec: G.711 µ-law expansion hits the published code points") {
    val W = Multimodal.WavCodec
    // the textbook anchor values of the CCITT expansion
    assert(W.ulawToLinear(0x00) == -32124, "0x00 is the negative extreme")
    assert(W.ulawToLinear(0x80) == 32124, "0x80 is the positive extreme")
    assert(W.ulawToLinear(0xff) == 0 && W.ulawToLinear(0x7f) == 0,
      "the two mu-law zeros")
    // monotone within the negative half: increasing code = increasing value
    (0x00 until 0x7f).foreach { b =>
      assert(W.ulawToLinear(b) < W.ulawToLinear(b + 1),
        s"negative half must be strictly increasing at $b")
    }
    // symmetric halves: code b and b^0x80 differ only in sign
    (0 until 128).foreach { b =>
      assert(W.ulawToLinear(b) == -W.ulawToLinear(b | 0x80), s"symmetry at $b")
    }
  }

  test("WavCodec: G.711 A-law expansion hits the published code points") {
    val W = Multimodal.WavCodec
    assert(W.alawToLinear(0x2a) == -32256, "0x2a (u=0x7f) is the negative extreme")
    assert(W.alawToLinear(0xaa) == 32256, "0xaa (u=0xff) is the positive extreme")
    assert(W.alawToLinear(0x55) == -8 && W.alawToLinear(0xd5) == 8,
      "the two A-law near-zeros (A-law has no exact zero)")
    // symmetric halves: flipping the (post-XOR) sign bit negates
    (0 until 256).foreach { b =>
      assert(W.alawToLinear(b) == -W.alawToLinear(b ^ 0x80), s"symmetry at $b")
    }
    // every magnitude is odd×8-ish positive: no code decodes to 0
    (0 until 256).foreach(b => assert(W.alawToLinear(b) != 0, s"no zero at $b"))
    // the a-law container decodes expanded, end to end
    val bytes = Array.tabulate(64)(i => ((i * 41 + 3) % 256).toByte)
    val dec = W.decodeWav(W.encodeWavAlaw(8000, 2, bytes)).get
    assert(dec.samples.sameElements(bytes.map(b => W.alawToLinear(b & 0xff))))
  }

  test("WavCodec: mu-law container decodes expanded; transcode re-encodes as PCM16") {
    val W = Multimodal.WavCodec
    val bytes = Array.tabulate(120)(i => ((i * 37 + 5) % 256).toByte)
    val enc = W.encodeWavMulaw(8000, 2, bytes)
    val dec = W.decodeWav(enc).get
    assert(dec.sampleRate == 8000 && dec.channels == 2 && dec.nFrames == 60)
    assert(dec.samples.sameElements(bytes.map(b => W.ulawToLinear(b & 0xff))),
      "every byte expands through the CCITT formula")
    // transcode: the expanded samples re-encode losslessly as PCM16
    val pcm = W.decodeWav(W.encodeWav(dec)).get
    assert(pcm.samples.sameElements(dec.samples))
    // malformed mu-law: 16-bit bits-per-sample under format 7 quarantines
    val bad = enc.clone(); bad(34) = 16
    assert(W.decodeWav(bad).isEmpty, "format-7 with 16 bits must be rejected")
  }

  test("WAV pipeline: synthetic fixture decodes distributed, stats match local kernel") {
    val W = Multimodal.WavCodec
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") < 30)
    val wavs = Multimodal.syntheticWavs(spark, docs)
    val stats = Multimodal.decodeWavStats(wavs).orderBy("media_id").collect()
    assert(stats.length == 30 && stats.forall(!_.isNullAt(1)),
      "every fixture payload must decode")
    // replay one row locally from the closed form
    val r = stats.find(_.getLong(0) == 7L).get
    assert(r.getInt(1) == 16000 && r.getInt(2) == 2 && r.getInt(3) == 47)
    val local = (for (f <- 0 until 47; c <- 0 until 2)
      yield ((7 * 7 + f * 31 + c * 17) % 65536) - 32768)
    assert(r.getLong(5) == local.map(_.toLong).sum, "sum_val")
    assert(r.getInt(8) == local.map(math.abs).max, "peak_abs")
    // resample end-to-end: re-encoded payload re-decodes to the
    // locally-resampled frame count and samples
    val rez = Multimodal.resampleWav(wavs, 12000)
      .filter(col("media_id") === 7L).collect().head
    assert(rez.getBoolean(2))
    val back = W.decodeWav(rez.getAs[Array[Byte]](1)).get
    val want = W.resample(
      W.Wav(16000, 2, local.toArray), 12000)
    assert(back.sampleRate == 12000 && back.samples.sameElements(want.samples))
    // quarantine routing: a non-WAV payload passes through unresampled
    val junk = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(99L,
        "junk".getBytes("UTF-8"))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("payload",
          org.apache.spark.sql.types.BinaryType, nullable = false))))
    val q = Multimodal.resampleWav(junk, 12000).collect().head
    assert(!q.getBoolean(2) && q.getAs[Array[Byte]](1).sameElements(
      "junk".getBytes("UTF-8")))
    val qs = Multimodal.decodeWavStats(junk).collect().head
    assert(qs.isNullAt(1) && qs.isNullAt(11), "junk row yields null stats")
  }
}
