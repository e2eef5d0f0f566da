package graft

import graft.operators.BmpCodec
import graft.operators.BmpCodec.Bmp

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

class BmpCodecSpec extends SparkSpec {

  private def fixture(id: Long, w: Int, h: Int): Bmp = {
    val px = Array.tabulate(w * h * 3) { i =>
      val c = i % 3; val x = (i / 3) % w; val y = i / 3 / w
      ((id + 7 * c + 3 * x + 5 * y) % 253).toInt
    }
    Bmp(w, h, px)
  }

  test("round-trip across every row-padding remainder") {
    for (id <- 0L until 36L) { // w in 5..13 covers w%4 ∈ {0,1,2,3}
      val g = fixture(id, (5 + id % 9).toInt, (5 + id % 7).toInt)
      val back = BmpCodec.decodeBmp(BmpCodec.encodeBmp(g))
      assert(back.nonEmpty)
      assert(back.get.width == g.width && back.get.height == g.height)
      assert(back.get.pixels.sameElements(g.pixels))
    }
  }

  test("cross-validation: ImageIO decodes our BMPs to identical pixels") {
    for (id <- 0L until 12L) {
      val g = fixture(id, (5 + id % 9).toInt, (5 + id % 7).toInt)
      val img = ImageIO.read(new ByteArrayInputStream(BmpCodec.encodeBmp(g)))
      assert(img != null && img.getWidth == g.width && img.getHeight == g.height)
      for (y <- 0 until g.height; x <- 0 until g.width) {
        val b = (y * g.width + x) * 3
        val want = (g.pixels(b) << 16) | (g.pixels(b + 1) << 8) | g.pixels(b + 2)
        assert((img.getRGB(x, y) & 0xffffff) == want, s"($x,$y) id=$id")
      }
    }
  }

  test("cross-validation: our decoder reads ImageIO-authored BMPs identically") {
    for (id <- 0L until 12L) {
      val w = (5 + id % 9).toInt; val h = (5 + id % 7).toInt
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val c0 = ((id + 3 * x + 5 * y) % 253).toInt
        val c1 = ((id + 7 + 3 * x + 5 * y) % 253).toInt
        val c2 = ((id + 14 + 3 * x + 5 * y) % 253).toInt
        img.setRGB(x, y, (c0 << 16) | (c1 << 8) | c2)
      }
      val out = new ByteArrayOutputStream()
      assert(ImageIO.write(img, "bmp", out), "no BMP writer in this JVM")
      val got = BmpCodec.decodeBmp(out.toByteArray)
      assert(got.nonEmpty, s"rejected ImageIO BMP id=$id")
      assert(got.get.width == w && got.get.height == h)
      for (y <- 0 until h; x <- 0 until w) {
        val b = (y * w + x) * 3
        val rgb = (got.get.pixels(b) << 16) | (got.get.pixels(b + 1) << 8) |
          got.get.pixels(b + 2)
        assert(rgb == (img.getRGB(x, y) & 0xffffff), s"($x,$y) id=$id")
      }
    }
  }

  test("quarantine: corrupt/unsupported payloads yield None") {
    val good = BmpCodec.encodeBmp(fixture(1, 8, 6))
    assert(BmpCodec.decodeBmp("nope".getBytes).isEmpty)
    assert(BmpCodec.decodeBmp(good.take(53)).isEmpty)
    val rle = good.clone(); rle(30) = 1 // BI_RLE8
    assert(BmpCodec.decodeBmp(rle).isEmpty)
    val depth8 = good.clone(); depth8(28) = 8
    assert(BmpCodec.decodeBmp(depth8).isEmpty)
    val trunc = good.take(good.length - 4)
    assert(BmpCodec.decodeBmp(trunc).isEmpty)
  }

  test("fixture + stats plumbing matches the closed form (the d41 kernel)") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") < 25)
    val stats = BmpCodec.decodeBmpStats(BmpCodec.syntheticBmps(spark, docs))
      .orderBy("media_id").collect()
    assert(stats.length == 25)
    stats.foreach { r =>
      val id = r.getLong(0)
      val w = (5 + id % 9).toInt; val h = (5 + id % 7).toInt
      assert(r.getInt(1) == w && r.getInt(2) == h)
      var sum = 0L; var wsum = 0L
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
        val v = (id + 7 * c + 3 * x + 5 * y) % 253
        sum += v; wsum += v * (1 + (x + 3 * y + 11 * c) % 7)
      }
      assert(r.getLong(3) == sum && r.getLong(4) == wsum)
    }
  }
}
