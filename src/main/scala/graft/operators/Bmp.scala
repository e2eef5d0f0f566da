package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL pure-JVM BMP codec (no native deps, no library codec): the
  * uncompressed Windows DIB format — BITMAPFILEHEADER + BITMAPINFOHEADER
  * + BI_RGB pixel array with 4-byte row padding and bottom-up row
  * order (top-down via negative height also accepted on decode). The
  * whole format is integer plumbing, so unlike JPEG (d39's banded
  * gate) every byte is SQL-replayable and d41 hash-gates it bit-exact
  * like PNG (d33) and GIF (d38). BmpCodecSpec cross-validates against
  * the JDK's independent ImageIO BMP plugin in both directions.
  *
  * Scope: 24-bit BI_RGB (the interchange default). Compressed BMPs
  * (BI_RLE8 etc.), palette depths, and other header sizes return
  * None — quarantine, never a guess. Pixels are row-major RGB
  * triples in [0,255]. */
object BmpCodec {

  final case class Bmp(width: Int, height: Int, pixels: Array[Int]) {
    require(pixels.length == width * height * 3,
      s"pixel buffer ${pixels.length} != $width*$height*3")
  }

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** Encode 24-bit BI_RGB, bottom-up, rows padded to 4 bytes. */
  def encodeBmp(img: Bmp): Array[Byte] = {
    val stride = (img.width * 3 + 3) & ~3
    val dataSize = stride * img.height
    val fileSize = 54 + dataSize
    val out = new Array[Byte](fileSize)
    def put16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    def put32(i: Int, v: Long): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
      out(i + 2) = ((v >> 16) & 0xff).toByte; out(i + 3) = ((v >> 24) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    put32(2, fileSize.toLong); put32(10, 54L)
    put32(14, 40L) // BITMAPINFOHEADER
    put32(18, img.width.toLong); put32(22, img.height.toLong)
    put16(26, 1); put16(28, 24)
    put32(30, 0L) // BI_RGB
    put32(34, dataSize.toLong)
    put32(38, 2835L); put32(42, 2835L) // 72 dpi
    var y = 0
    while (y < img.height) {
      val srcRow = img.height - 1 - y // bottom-up
      var x = 0
      while (x < img.width) {
        val base = (srcRow * img.width + x) * 3
        val off = 54 + y * stride + x * 3
        // BGR byte order on disk
        out(off) = (img.pixels(base + 2) & 0xff).toByte
        out(off + 1) = (img.pixels(base + 1) & 0xff).toByte
        out(off + 2) = (img.pixels(base) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Full decode. None for: bad magic, non-BITMAPINFOHEADER, planes
    * != 1, depth != 24, compressed data, truncated pixel array,
    * dimension overflow — quarantine, never a guess. */
  def decodeBmp(p: Array[Byte]): Option[Bmp] = {
    if (p.length < 54 || p(0) != 'B' || p(1) != 'M') return None
    val dataOff = le32(p, 10)
    if (le32(p, 14) != 40L) return None
    val w = le32(p, 18).toInt
    val rawH = le32(p, 22).toInt
    val topDown = rawH < 0
    val h = math.abs(rawH)
    if (le16(p, 26) != 1 || le16(p, 28) != 24) return None
    if (le32(p, 30) != 0L) return None // compressed: quarantine
    if (w <= 0 || h <= 0 || w.toLong * h > Int.MaxValue / 8) return None
    val stride = (w * 3 + 3) & ~3
    if (dataOff < 54 || dataOff + stride.toLong * h > p.length) return None
    val px = new Array[Int](w * h * 3)
    var y = 0
    while (y < h) {
      val dstRow = if (topDown) y else h - 1 - y
      var x = 0
      while (x < w) {
        val off = (dataOff + y.toLong * stride + x * 3).toInt
        val base = (dstRow * w + x) * 3
        px(base) = p(off + 2) & 0xff
        px(base + 1) = p(off + 1) & 0xff
        px(base + 2) = p(off) & 0xff
        x += 1
      }
      y += 1
    }
    Some(Bmp(w, h, px))
  }

  /** Deterministic BMP fixture: complete valid files whose pixels are
    * pure integer functions of `doc_id` — p(x,y,c) =
    * (doc_id + 7c + 3x + 5y) mod 253 (the d33 family, mod 253 so no
    * engine confuses it with the PNG fixture's 251) — so an external
    * SQL engine replays every channel of every pixel. Width crosses
    * the 4-byte padding boundary (w mod 4 takes all values). */
  def syntheticBmps(spark: SparkSession, documents: DataFrame): DataFrame = {
    val src = documents.select(col("doc_id").cast("long"))
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val rdd = src.rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val w = (5 + id % 9).toInt
        val h = (5 + id % 7).toInt
        val px = new Array[Int](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var c = 0
            while (c < 3) {
              px((y * w + x) * 3 + c) = ((id + 7 * c + 3 * x + 5 * y) % 253).toInt
              c += 1
            }
            x += 1
          }
          y += 1
        }
        Row(id, encodeBmp(Bmp(w, h, px)))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Batched per-partition BMP decode → per-image statistics (the d33
    * stat family: dims, value sum, position-weighted sum). Payloads
    * never shuffle; undecodable rows yield null stats (quarantine). */
  def decodeBmpStats(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sum_val", LongType, nullable = true),
      StructField("wsum", LongType, nullable = true)))
    val idIdx = df.schema.fieldIndex("media_id")
    val payloadIdx = df.schema.fieldIndex("payload")
    val rdd = df.rdd.mapPartitions { it =>
      it.map { r =>
        decodeBmp(r.getAs[Array[Byte]](payloadIdx)) match {
          case Some(img) =>
            var sum = 0L; var wsum = 0L
            var y = 0
            while (y < img.height) {
              var x = 0
              while (x < img.width) {
                var c = 0
                while (c < 3) {
                  val v = img.pixels((y * img.width + x) * 3 + c)
                  sum += v
                  wsum += v.toLong * (1 + (x + 3 * y + 11 * c) % 7)
                  c += 1
                }
                x += 1
              }
              y += 1
            }
            Row(r.getLong(idIdx), img.width, img.height, sum, wsum)
          case None => Row(r.getLong(idIdx), null, null, null, null)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
