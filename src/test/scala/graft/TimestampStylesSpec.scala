package graft

import graft.config.PlaybackConfig
import graft.operators.TimestampStyles
import graft.sources.CsvPlayback
import org.apache.spark.sql.functions._

import java.time.Instant

class TimestampStylesSpec extends SparkSpec {

  private def vib = CsvPlayback.readFile(spark, PlaybackConfig(), fixture("vibration.csv"))
  private val fmt = "%Y-%m-%d %H:%M:%S.%f%z"

  private def tsStrings(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy("_row_idx")
      .select(date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .collect().map(_.getString(0)).toSeq

  test("T3 copy csv value parses and keeps the column (csvplayback.py:717-721)") {
    val df = TimestampStyles.copyCsvValue(vib, "user_ts", fmt)
    assert(df.columns.contains("user_ts"))
    assert(tsStrings(df) == Seq(
      "2019-12-12 10:00:00.000000",
      "2019-12-12 10:00:00.000125",
      "2019-12-12 10:00:00.000250"))
  }

  test("T4 move csv value drops the column (csvplayback.py:723-725)") {
    val df = TimestampStyles.moveCsvValue(vib, "user_ts", fmt)
    assert(!df.columns.contains("user_ts"))
    assert(tsStrings(df).head == "2019-12-12 10:00:00.000000")
  }

  test("T5 sample delta: start + n*delta, monotone (csvplayback.py:726-736)") {
    val delta = TimestampStyles.sampleDeltaMicros(vib, "user_ts", fmt)
    assert(delta == 125L)
    val start = Instant.parse("2020-01-01T00:00:00Z")
    val df = TimestampStyles.sampleDelta(vib, "user_ts", fmt, start)
    assert(tsStrings(df) == Seq(
      "2020-01-01 00:00:00.000000",
      "2020-01-01 00:00:00.000125",
      "2020-01-01 00:00:00.000250"))
  }

  test("T1 burst: uniform emission timestamp (csvplayback.py:747-749)") {
    val t = Instant.parse("2020-06-01T12:00:00.5Z")
    val df = TimestampStyles.currentTimeBurst(vib, t)
    assert(tsStrings(df).distinct == Seq("2020-06-01 12:00:00.500000"))
  }

  test("T2 continuous: base-second + i*(1e6/n) micros (csvplayback.py:739-743,753-756)") {
    val start = Instant.parse("2020-06-01T12:00:00.999999Z")
    // chunk = all 3 rows → interval = 333333µs; seconds part kept from base
    val df = TimestampStyles.currentTimeContinuous(vib, start, chunkSize = 3, periodSec = 1.0)
    assert(tsStrings(df) == Seq(
      "2020-06-01 12:00:00.000000",
      "2020-06-01 12:00:00.333333",
      "2020-06-01 12:00:00.666666"))
    // chunkSize 2 → second chunk (1 row) based one period later
    val df2 = TimestampStyles.currentTimeContinuous(vib, start, chunkSize = 2, periodSec = 1.0)
    assert(tsStrings(df2) == Seq(
      "2020-06-01 12:00:00.000000",
      "2020-06-01 12:00:00.500000",
      "2020-06-01 12:00:01.000000"))
  }

  test("readings wrapper: reference dict shape (csvplayback.py:760-771)") {
    val df = TimestampStyles.asReadings(
      TimestampStyles.copyCsvValue(vib, "user_ts", fmt), "vibration")
    assert(df.columns.toSeq == Seq("asset", "timestamp", "readings"))
    val r = df.head()
    assert(r.getString(0) == "vibration")
    val m = r.getMap[String, String](2)
    assert(m.keys.toSet == Set("channel1", "channel2", "user_ts"))
  }
}
