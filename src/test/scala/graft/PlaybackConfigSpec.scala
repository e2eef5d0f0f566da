package graft

import graft.config.{Enums, PlaybackConfig}
import Enums._

class PlaybackConfigSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("defaults mirror the reference (csvplayback.py:53-236)") {
    val c = PlaybackConfig()
    assert(c.assetName == "vibration" && c.sampleRate == 8000 &&
      c.burstInterval == 1000 && c.ingestMode == IngestMode.Burst &&
      c.timestampFormat == "%Y-%m-%d %H:%M:%S.%f%z")
  }

  test("chunk derivation: burst = sampleRate*interval/1000 (csvplayback.py:296-301)") {
    val c = PlaybackConfig()
    assert(c.chunkSize == 8000 && c.periodSec == 1.0)
    assert(PlaybackConfig(sampleRate = 4000, burstInterval = 500).chunkSize == 2000)
  }

  test("chunk derivation: continuous = sampleRate, period = 1/rate (csvplayback.py:305-311)") {
    val c = PlaybackConfig(ingestMode = IngestMode.Continuous, sampleRate = 8000)
    assert(c.chunkSize == 8000 && math.abs(c.periodSec - 1.25e-4) < 1e-12)
  }

  test("ragged forces chunkSize 1 (csvplayback.py:300-309)") {
    assert(PlaybackConfig(variableCols = true).chunkSize == 1)
    assert(PlaybackConfig(variableCols = true,
      ingestMode = IngestMode.Continuous).chunkSize == 1)
  }

  test("validation rules (csvplayback.py:272-292)") {
    assert(PlaybackConfig(sampleRate = 0).validationErrors.nonEmpty)
    assert(PlaybackConfig(sampleRate = 1000001).validationErrors.nonEmpty)
    assert(PlaybackConfig(burstInterval = 0).validationErrors.nonEmpty)
    // historic styles need ts col+format and continuous mode
    val historicBurst = PlaybackConfig(
      timestampStyle = TimestampStyle.CopyCsvValue, timestampCol = "ts")
    assert(historicBurst.validationErrors.exists(_.contains("continuous")))
    val ok = PlaybackConfig(timestampStyle = TimestampStyle.CopyCsvValue,
      timestampCol = "ts", ingestMode = IngestMode.Continuous)
    assert(ok.validationErrors.isEmpty)
    val noCol = PlaybackConfig(timestampStyle = TimestampStyle.UseCsvSampleDelta,
      ingestMode = IngestMode.Continuous)
    assert(noCol.validationErrors.exists(_.contains("must be specified")))
  }

  test("FLEDGE_DATA expansion (csvplayback.py:488-494)") {
    assert(PlaybackConfig.resolveDataDir("FLEDGE_DATA", "/fr") == "/fr/data")
    assert(PlaybackConfig.resolveDataDir("FLEDGE_DATA/sub", "/fr") == "/fr/data/sub")
    assert(PlaybackConfig.resolveDataDir("/abs/dir", "/fr") == "/abs/dir")
  }
}
