package graft

import graft.operators.GifCodec
import graft.operators.GifCodec.Gif

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Conformance of the hand-written GIF/LZW codec. The load-bearing
  * cases are the CROSS-IMPLEMENTATION ones: payloads this encoder
  * writes must decode to identical pixels under the JDK's own,
  * independently-written ImageIO GIF plugin, and ImageIO-authored
  * files (different sub-block sizing, extension blocks, palette
  * ordering) must decode identically under this decoder — spec
  * conformance proved against a second implementation, not
  * self-agreement. */
class GifCodecSpec extends SparkSpec {

  private val grayPal = Array.tabulate(256)(i => (i << 16) | (i << 8) | i)

  private def fixture(id: Long, w: Int, h: Int): Gif = {
    val idx = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { idx(y * w + x) = ((id + 3 * x + 5 * y) % 256).toByte; x += 1 }
      y += 1
    }
    Gif(w, h, grayPal, idx)
  }

  test("LZW round-trips exhaustively over shapes that cross every code-width bump") {
    // long inputs drive the dictionary past 512/1024/2048 entries and
    // into the 4096 reset; short ones exercise flush alignment
    val shapes = Seq(
      Array.tabulate(20000)(i => ((i * 7 + i / 3) % 256).toByte), // grows fast
      Array.tabulate(9000)(i => (i % 2).toByte), // binary, deep phrases
      Array.fill(5000)(42.toByte), // KwKwK chains
      Array.tabulate(300)(i => i.toByte),
      Array[Byte](7), Array[Byte](7, 7), Array.empty[Byte])
    for (s <- shapes) {
      val enc = GifCodec.lzwEncode(s, 8)
      val dec = GifCodec.lzwDecode(enc, 8, s.length)
      assert(dec.exists(_.sameElements(s)), s"round trip failed at n=${s.length}")
    }
  }

  test("container round-trip: encode → decode restores pixels, palette, dims") {
    for (id <- 0L until 40L) {
      val g = fixture(id, (8 + id % 9).toInt, (8 + id % 7).toInt)
      val back = GifCodec.decodeGif(GifCodec.encodeGif(g))
      assert(back.nonEmpty)
      assert(back.get.width == g.width && back.get.height == g.height)
      assert(back.get.indices.sameElements(g.indices))
      assert(back.get.palette.sameElements(g.palette))
    }
  }

  test("cross-validation: ImageIO decodes this encoder's output to identical pixels") {
    for (id <- 0L until 25L) {
      val g = fixture(id, (8 + id % 9).toInt, (8 + id % 7).toInt)
      val img = ImageIO.read(new ByteArrayInputStream(GifCodec.encodeGif(g)))
      assert(img != null, s"ImageIO rejected our GIF for id=$id")
      assert(img.getWidth == g.width && img.getHeight == g.height)
      for (y <- 0 until g.height; x <- 0 until g.width) {
        val want = g.palette(g.indices(y * g.width + x) & 0xff)
        assert((img.getRGB(x, y) & 0xffffff) == want,
          s"pixel ($x,$y) of id=$id: ImageIO ${img.getRGB(x, y) & 0xffffff} != $want")
      }
    }
  }

  test("cross-validation: this decoder reads ImageIO-authored GIFs identically") {
    // ImageIO writes GIF89a with a graphic-control extension block and
    // its own palette ordering — the decoder must walk all of it
    for (id <- 0L until 25L) {
      val w = (8 + id % 9).toInt; val h = (8 + id % 7).toInt
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, ((id + 3 * x + 5 * y) % 256).toInt)
      val out = new ByteArrayOutputStream()
      assert(ImageIO.write(img, "gif", out), "no GIF writer in this JVM")
      val got = GifCodec.decodeGif(out.toByteArray)
      assert(got.nonEmpty, s"our decoder rejected ImageIO's GIF for id=$id")
      val g = got.get
      assert(g.width == w && g.height == h)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = g.palette(g.indices(y * w + x) & 0xff)
        val gray = ((id + 3 * x + 5 * y) % 256).toInt
        val want = (gray << 16) | (gray << 8) | gray
        assert(rgb == want, s"pixel ($x,$y) of id=$id: $rgb != $want")
      }
    }
  }

  test("animated round-trip: all frames, dims, and planes restored") {
    for (id <- 0L until 20L) {
      val w = (6 + id % 7).toInt; val h = (6 + id % 5).toInt
      val nf = (3 + id % 5).toInt
      val frames = (0 until nf).map { f =>
        val idx = Array.tabulate(w * h)(i =>
          ((id + 7 * f + 3 * (i % w) + 5 * (i / w)) % 256).toByte)
        Gif(w, h, grayPal, idx)
      }
      val back = GifCodec.decodeGifFrames(GifCodec.encodeAnimatedGif(frames))
      assert(back.nonEmpty && back.get.length == nf)
      back.get.zip(frames).foreach { case (g, want) =>
        assert(g.width == w && g.height == h)
        assert(g.indices.sameElements(want.indices))
      }
    }
  }

  test("cross-validation: ImageIO sees the same frame count and planes in our animated GIFs") {
    val iis = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
    assert(iis.hasNext, "no GIF reader in this JVM")
    for (id <- 0L until 10L) {
      val w = (6 + id % 7).toInt; val h = (6 + id % 5).toInt
      val nf = (3 + id % 5).toInt
      val frames = (0 until nf).map { f =>
        val idx = Array.tabulate(w * h)(i =>
          ((id + 7 * f + 3 * (i % w) + 5 * (i / w)) % 256).toByte)
        Gif(w, h, grayPal, idx)
      }
      val payload = GifCodec.encodeAnimatedGif(frames)
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      reader.setInput(javax.imageio.ImageIO.createImageInputStream(
        new ByteArrayInputStream(payload)))
      assert(reader.getNumImages(true) == nf,
        s"ImageIO frame count for id=$id: ${reader.getNumImages(true)} != $nf")
      for (f <- 0 until nf) {
        val img = reader.read(f)
        for (y <- 0 until h; x <- 0 until w) {
          val want = grayPal(frames(f).indices(y * w + x) & 0xff)
          assert((img.getRGB(x, y) & 0xffffff) == want,
            s"frame $f pixel ($x,$y) of id=$id")
        }
      }
      reader.dispose()
    }
  }

  test("frame sampling emits the d10 offsets over real decoded frames") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") < 20)
    val rows = GifCodec.sampleGifFrameStats(
        GifCodec.syntheticAnimatedGifs(spark, docs), 4)
      .orderBy("media_id", "frame_idx").collect()
    rows.groupBy(_.getLong(0)).foreach { case (id, rs) =>
      val nf = (3 + id % 5).toInt
      val k = math.min(4, nf)
      assert(rs.length == k, s"id=$id sampled ${rs.length} != $k")
      assert(rs.map(_.getInt(2)).toSeq == (0 until k).map(i => i * nf / k),
        s"id=$id offsets ${rs.map(_.getInt(2)).toSeq}")
      rs.foreach { r =>
        val f = r.getInt(2)
        val w = (6 + id % 7).toInt; val h = (6 + id % 5).toInt
        var sum = 0L
        for (y <- 0 until h; x <- 0 until w) sum += (id + 7 * f + 3 * x + 5 * y) % 256
        assert(r.getLong(3) == sum, s"id=$id frame=$f sum")
      }
    }
  }

  test("quarantine: corrupt payloads yield None, never a guess") {
    val good = GifCodec.encodeGif(fixture(3, 10, 9))
    assert(GifCodec.decodeGif("notagif".getBytes).isEmpty)
    assert(GifCodec.decodeGif(good.take(20)).isEmpty) // truncated
    // no global table + no local table = nothing to decode against
    val noPal = good.clone()
    noPal(10) = (noPal(10) & 0x7f).toByte // clear GCT flag (table bytes
    // now parse as garbage blocks — must quarantine, not guess)
    assert(GifCodec.decodeGif(noPal).isEmpty)
    val badLzw = good.clone()
    badLzw(badLzw.length - 10) = 0xff.toByte // stomp the LZW tail
    // either decodes-with-mismatch (None via expected-length check) or
    // hits an out-of-range code — both must quarantine, never throw
    GifCodec.decodeGif(badLzw) // must not throw
  }

  test("fixture + stats plumbing matches the closed form (the d38 kernel)") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") < 30)
    val stats = GifCodec.decodeGifStats(GifCodec.syntheticGifs(spark, docs))
      .orderBy("media_id").collect()
    assert(stats.length == 30)
    stats.foreach { r =>
      val id = r.getLong(0)
      val w = (8 + id % 9).toInt; val h = (8 + id % 7).toInt
      assert(r.getInt(1) == w && r.getInt(2) == h && r.getInt(3) == 256)
      var sum = 0L; var wsum = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val v = (id + 3 * x + 5 * y) % 256
        sum += v; wsum += v * (1 + (x + 3 * y) % 7)
      }
      assert(r.getLong(4) == sum && r.getLong(5) == wsum && r.getLong(6) == sum)
    }
  }
}
