package graft

import graft.operators.Multimodal.{ImaAdpcmCodec, WavCodec}
import graft.operators.Multimodal.WavCodec.Wav

class ImaAdpcmSpec extends SparkSpec {

  /** Independent dense-loop reference for the IMA recurrence (written
    * straight from the published tables, no shared code path). */
  private def refDecode(pred0: Int, idx0: Int, nibbles: Seq[Int]): Seq[Int] = {
    val steps = ImaAdpcmCodec.stepTable
    var pred = pred0; var idx = idx0
    val out = scala.collection.mutable.ArrayBuffer(pred)
    nibbles.foreach { n =>
      val step = steps(idx)
      var d = step / 8
      if ((n & 1) != 0) d += step / 4
      if ((n & 2) != 0) d += step / 2
      if ((n & 4) != 0) d += step
      pred = math.max(-32768, math.min(32767,
        if ((n & 8) != 0) pred - d else pred + d))
      idx = math.max(0, math.min(88,
        idx + (if ((n & 7) < 4) -1 else ((n & 7) - 3) * 2)))
      out += pred
    }
    out.toSeq
  }

  private def mkBlock(pred: Int, idx: Int, nibbleBytes: Array[Byte]): Array[Byte] = {
    val block = new Array[Byte](4 + nibbleBytes.length)
    block(0) = (pred & 0xff).toByte
    block(1) = ((pred >> 8) & 0xff).toByte
    block(2) = idx.toByte
    block(3) = 0
    System.arraycopy(nibbleBytes, 0, block, 4, nibbleBytes.length)
    block
  }

  test("decode matches the independent recurrence, all nibble values exercised") {
    val nibbleBytes = Array.tabulate(24)(j => ((j * 37 + 11) % 256).toByte)
    val nibbles = nibbleBytes.flatMap(b => Seq(b & 0x0f, (b & 0xff) >> 4)).toSeq
    assert(nibbles.distinct.size == 16, "fixture covers every nibble value")
    val bytes = ImaAdpcmCodec.imaWavBytes(8000, 28, mkBlock(-1234, 30, nibbleBytes))
    val w = ImaAdpcmCodec.decodeImaWav(bytes)
      .getOrElse(fail("decode failed"))
    assert(w.sampleRate == 8000 && w.channels == 1)
    assert(w.samples.toSeq == refDecode(-1234, 30, nibbles))
    // clamp paths: start at the rails with the largest step
    val up = ImaAdpcmCodec.imaWavBytes(8000, 28,
      mkBlock(32700, 88, Array.fill(24)(0x77.toByte))) // +7 nibbles
    val wu = ImaAdpcmCodec.decodeImaWav(up).get
    assert(wu.samples.max == 32767 && wu.samples.forall(_ <= 32767))
    val dn = ImaAdpcmCodec.imaWavBytes(8000, 28,
      mkBlock(-32700, 88, Array.fill(24)(0xff.toByte))) // -7 nibbles
    assert(ImaAdpcmCodec.decodeImaWav(dn).get.samples.min == -32768)
  }

  test("multi-block decode concatenates; headers restate state") {
    val b1 = mkBlock(100, 5, Array.tabulate(24)(j => (j * 13).toByte))
    val b2 = mkBlock(-200, 40, Array.tabulate(24)(j => (j * 7 + 3).toByte))
    val bytes = ImaAdpcmCodec.imaWavBytes(12000, 28, b1 ++ b2)
    val w = ImaAdpcmCodec.decodeImaWav(bytes).get
    assert(w.samples.length == 98)
    assert(w.samples(0) == 100 && w.samples(49) == -200)
  }

  test("quarantine: corrupt containers and headers return None") {
    val good = ImaAdpcmCodec.imaWavBytes(8000, 28,
      mkBlock(0, 0, Array.fill(24)(0x12.toByte)))
    assert(ImaAdpcmCodec.decodeImaWav(good).isDefined)
    def patched(off: Int, v: Byte): Array[Byte] = {
      val b = good.clone(); b(off) = v; b
    }
    assert(ImaAdpcmCodec.decodeImaWav(good.take(50)).isEmpty, "truncated")
    assert(ImaAdpcmCodec.decodeImaWav(patched(22, 2)).isEmpty, "stereo")
    assert(ImaAdpcmCodec.decodeImaWav(patched(34, 8)).isEmpty, "bits != 4")
    // data block header: idx byte at 48+2, reserved at 48+3
    assert(ImaAdpcmCodec.decodeImaWav(patched(50, 89.toByte)).isEmpty, "idx > 88")
    assert(ImaAdpcmCodec.decodeImaWav(patched(51, 1)).isEmpty, "reserved != 0")
    // PCM codec refuses the ADPCM format tag (cross-quarantine)
    assert(WavCodec.decodeWav(good).isEmpty)
  }

  test("encoder tracks a ramp within the codec's step bound and is deterministic") {
    val spb = 49
    val samples = Array.tabulate(2 * spb)(i => -3000 + i * 50)
    val w = Wav(8000, 1, samples)
    val enc = ImaAdpcmCodec.encodeIma(w, 28)
    assert(java.util.Arrays.equals(enc, ImaAdpcmCodec.encodeIma(w, 28)))
    val dec = ImaAdpcmCodec.decodeImaWav(enc).get
    assert(dec.samples.length == samples.length)
    assert(dec.samples(0) == samples(0) && dec.samples(spb) == samples(spb),
      "block-header samples are exact")
    val errs = dec.samples.zip(samples).map { case (a, b) => math.abs(a - b) }
    assert(errs.max <= 2000, s"max tracking error ${errs.max}")
    assert(errs.sum.toDouble / errs.length <= 200.0,
      s"mean tracking error ${errs.sum.toDouble / errs.length}")
  }

  test("gate kernel stats match a hand loop on the synthetic fixture") {
    import spark.implicits._
    val clips = ImaAdpcmCodec.syntheticImaWavs(spark, Seq(42L).toDF("doc_id"))
    val row = ImaAdpcmCodec.decodeImaStats(clips).collect()(0)
    val id = 42L
    val nibbleBytes = Array.tabulate(24)(j => ((id * 13 + 29 * j) % 256).toByte)
    val nibbles = nibbleBytes.flatMap(b => Seq(b & 0x0f, (b & 0xff) >> 4)).toSeq
    val ref = refDecode((((id * 7919 + 123) % 65536) - 32768).toInt,
      (id % 89).toInt, nibbles)
    assert(row.getInt(1) == 8000 + (42 % 4) * 2000)
    assert(row.getInt(2) == 49)
    assert(row.getLong(3) == ref.map(_.toLong).sum)
    assert(row.getInt(4) == ref.min && row.getInt(5) == ref.max)
    val halfRef = (0 until 24).map(i => ref(2 * i).toLong).sum
    assert(row.getLong(7) == halfRef)
    assert(row.getInt(8) == 1)
  }
}
