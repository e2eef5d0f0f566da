package graft

import graft.operators.JpegCodec
import org.apache.spark.sql.functions.col

/** The d39 gate's bands are MEASURED here, not guessed: the spec
  * computes the actual worst-case DCT error over the fixture ramp and
  * asserts it sits within HALF the gate's headroom, so the 0/1 claims
  * the oracle pins to 1 cannot be tight-rope passes. */
class JpegCodecSpec extends SparkSpec {

  test("JPEG round-trip on the fixture ramp: exact dims, tight lossy bands") {
    var worstMean = 0.0
    var worstPx = 0
    for (id <- 0L until 60L) {
      val w = (8 + id % 9).toInt; val h = (8 + id % 7).toInt
      val px = Array.tabulate(w * h)(i =>
        JpegCodec.fixturePixel(id, i % w, i / w))
      val payload = JpegCodec.encodeGray(w, h, px)
      val dec = JpegCodec.decodeGray(payload)
      assert(dec.nonEmpty, s"undecodable fixture id=$id")
      val (dw, dh, dpx) = dec.get
      assert(dw == w && dh == h, s"dims for id=$id: ${dw}x$dh != ${w}x$h")
      var sumErr = 0L
      for (i <- px.indices) {
        val e = math.abs(dpx(i) - px(i))
        worstPx = math.max(worstPx, e)
        sumErr += dpx(i) - px(i)
      }
      worstMean = math.max(worstMean, math.abs(sumErr.toDouble / px.length))
    }
    info(s"measured worst per-image |mean err|=$worstMean, worst pixel err=$worstPx")
    // gate bands are 3.0 mean / 32 px; require half the headroom here
    assert(worstMean <= 1.5, s"mean drift $worstMean exceeds half the d39 band")
    assert(worstPx <= 16, s"pixel error $worstPx exceeds half the d39 band")
  }

  test("quarantine: non-JPEG payloads yield None, never a throw") {
    assert(JpegCodec.decodeGray("not a jpeg".getBytes).isEmpty)
    assert(JpegCodec.decodeGray(Array.emptyByteArray).isEmpty)
    val good = JpegCodec.encodeGray(8, 8, Array.fill(64)(128))
    assert(JpegCodec.decodeGray(good.take(10)).isEmpty)
  }

  test("fixture + gate plumbing passes end-to-end (the d39 kernel)") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") < 30)
    val rows = JpegCodec.decodeJpegGate(JpegCodec.syntheticJpegs(spark, docs))
      .orderBy("media_id").collect()
    assert(rows.length == 30)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == (8 + id % 9).toInt)
      assert(r.getInt(2) == (8 + id % 7).toInt)
      assert(r.getLong(3) == r.getInt(1).toLong * r.getInt(2))
      assert(r.getInt(4) == 1 && r.getInt(5) == 1,
        s"banded claims failed for id=$id: mean_ok=${r.getInt(4)} maxerr_ok=${r.getInt(5)}")
    }
  }
}
