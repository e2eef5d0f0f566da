package graft

import graft.operators.{AviCodec, BmpCodec}
import graft.operators.AviCodec.AviVideo

class AviCodecSpec extends SparkSpec {

  private def mkFrames(w: Int, h: Int, nF: Int, seed: Int): Seq[Array[Int]] =
    (0 until nF).map { f =>
      Array.tabulate(w * h * 3)(i => (seed + 11 * f + i * 37) % 256)
    }

  test("round trip: decode(encode(v)) == v, bytes deterministic, every stride remainder") {
    for (w <- 4 to 9; h <- Seq(3, 5); nF <- Seq(1, 3)) {
      val v = AviVideo(w, h, 12, mkFrames(w, h, nF, w * 100 + h))
      val bytes = AviCodec.encodeAvi(v)
      assert(bytes.length == AviCodec.encodedLength(w, h, nF),
        s"closed-form length w=$w h=$h nF=$nF")
      val back = AviCodec.decodeAvi(bytes)
        .getOrElse(fail(s"decode failed w=$w h=$h nF=$nF"))
      assert(back.width == w && back.height == h && back.fps == 12)
      assert(back.frames.length == nF)
      back.frames.zip(v.frames).foreach { case (a, b) =>
        assert(a.sameElements(b), s"frame planes w=$w h=$h")
      }
      assert(java.util.Arrays.equals(AviCodec.encodeAvi(back), bytes),
        "re-encode is bit-exact")
    }
  }

  test("frame payloads are byte-identical to the d41 BMP pixel array (independent path)") {
    val w = 7; val h = 4 // stride 24 > 21: padding in play
    val frames = mkFrames(w, h, 2, 9)
    val avi = AviCodec.encodeAvi(AviVideo(w, h, 10, frames))
    val stride = (w * 3 + 3) & ~3
    val fb = stride * h
    // first '00db' payload starts after 12 RIFF + 200 hdrl + 12 movi hdr + 8 ckid
    val framePayload = avi.slice(232, 232 + fb)
    val bmp = BmpCodec.encodeBmp(BmpCodec.Bmp(w, h, frames(0)))
    assert(framePayload.sameElements(bmp.drop(54)),
      "AVI frame bytes == BMP pixel array for the same planes")
    // and ImageIO (via the BMP wrapper) sees the same planes
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp))
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val base = (y * w + x) * 3
      assert(((rgb >> 16) & 0xff) == frames(0)(base) &&
        ((rgb >> 8) & 0xff) == frames(0)(base + 1) &&
        (rgb & 0xff) == frames(0)(base + 2), s"pixel ($x,$y)")
    }
  }

  test("quarantine: corrupt containers return None, never a guess") {
    val v = AviVideo(5, 4, 10, mkFrames(5, 4, 2, 3))
    val good = AviCodec.encodeAvi(v)
    assert(AviCodec.decodeAvi(good).isDefined)
    def patched(off: Int, value: Byte): Array[Byte] = {
      val b = good.clone(); b(off) = value; b
    }
    assert(AviCodec.decodeAvi(good.take(100)).isEmpty, "truncated")
    assert(AviCodec.decodeAvi(patched(0, 'X')).isEmpty, "bad magic")
    assert(AviCodec.decodeAvi(patched(188, 1)).isEmpty, "compressed essence")
    assert(AviCodec.decodeAvi(patched(186, 8)).isEmpty, "8-bit depth")
    assert(AviCodec.decodeAvi(patched(48, 9)).isEmpty, "avih frame-count mismatch")
    assert(AviCodec.decodeAvi(Array[Byte](1, 2, 3)).isEmpty, "garbage")
  }

  test("sampling offsets follow the d10 rule and stats match a hand loop") {
    import spark.implicits._
    val docs = Seq(3L, 13L).toDF("doc_id") // nF = 2+id%4 → 5 and 3 frames
    val clips = AviCodec.syntheticAvis(spark, docs)
    val got = AviCodec.sampleAviFrameStats(clips, 4)
      .collect().map(r => (r.getLong(0), r.getInt(7)) ->
        (r.getInt(4), r.getInt(6), r.getLong(8))).toMap
    // id=3: nF=5, k=4 → frames i·5/4 = 0,1,2,3 ; id=13: nF=3 → frames 0,1,2
    assert(got.keySet == Set((3L, 0), (3L, 1), (3L, 2), (3L, 3),
      (13L, 0), (13L, 1), (13L, 2)))
    got.values.foreach { case (_, eq, _) => assert(eq == 1, "bit-exact round trip") }
    // hand-check one sum: id=13, frame 1, w=4+13%6=5, h=3+13%4=4
    val (w, h, id, f) = (5, 4, 13L, 1)
    var sum = 0L
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      sum += (id + 11 * f + 7 * c + 3 * x + 5 * y) % 249
    assert(got((13L, 1))._3 == sum)
  }
}
