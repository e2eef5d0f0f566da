package graft.queries

import graft.GraftQuery
import graft.config.{Enums, PlaybackConfig}
import Enums._
import graft.operators.TimestampStyles
import graft.preprocess.CleanCsv
import graft.sources.{CsvPlayback, NaNReport}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.time.Instant

/** Playback-operator queries over small deterministic inline fixtures
  * (FIXTURES.md §A). The fixtures are fixed inputs with fixed expected
  * outputs, so each oracle is the expected table as literal VALUES —
  * exact hash-checkable parity for operators whose *inputs* aren't the
  * shared parquet tables.
  */
object PlaybackQueries {

  /** Writes a named fixture under the JVM temp dir (idempotent). */
  private object Fixtures {
    private val dir = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft-fixtures")
    def path(name: String, content: String): String = synchronized {
      java.nio.file.Files.createDirectories(dir)
      val p = dir.resolve(name)
      if (!java.nio.file.Files.exists(p) ||
          new String(java.nio.file.Files.readAllBytes(p), "UTF-8") != content)
        java.nio.file.Files.write(p, content.getBytes("UTF-8"))
      p.toString
    }
  }

  private val vibrationCsv =
    """channel1,channel2,user_ts
      |0.0083912037,0.0071383551,2019-12-12 10:00:00.000000+0000
      |0.0083214452,0.0071025003,2019-12-12 10:00:00.000125+0000
      |0.0081125781,0.0070553812,2019-12-12 10:00:00.000250+0000
      |""".stripMargin

  private val typedCsv =
    "id,value,status\n1,2.5,OK\n2,2.7,OK\n3,2.9,FAIL\n"

  private val raggedCsv = "a,b,c\n2,3,,23\n4\n"

  private val metaCsv =
    "device=vib-007\nfirmware=1.4.2\nchannel1,channel2\n0.0081,0.0070\n0.0082,0.0071\n"

  private val skipCsv =
    "# exported by rig 7\n# 2019-12-12\n# do not edit\nchannel1,channel2\n0.0081,0.0070\n"

  private val nanCsv =
    "channel1,channel2,deadcol\n0.0081,0.0070,\n, ,\n0.0083,,\n"

  private val interpCsv = "v1,v2\n1.0,10.0\n,\n3.0,\n4.0,40.0\n"

  private val rawExportCsv =
    "reading,user_ts\n" +
      "\"{\"\"channel1\"\":0.0083912037,\"\"channel2\"\":0.0071383551}\",2019-12-12 10:00:00.000000+0000\n" +
      "\"{\"\"channel1\"\":0.0083214452,\"\"channel2\"\":0.0071025003}\",2019-12-12 10:00:00.000125+0000\n"

  private val fmt = "%Y-%m-%d %H:%M:%S.%f%z"

  private def tsStr(c: String): org.apache.spark.sql.Column =
    date_format(col(c), "yyyy-MM-dd HH:mm:ss.SSSSSS")

  // --- p01: explicit useColumns = positional rename + cast (P1-P3) ----
  private val p01 = GraftQuery(
    "p01_explicit_columns",
    (s, _) => {
      val cfg = PlaybackConfig(columnMethod = ColumnMethod.Explicit,
        useColumns = "id:int,temperature:float,status:str")
      CsvPlayback.readFile(s, cfg, Fixtures.path("typed.csv", typedCsv))
        .select(col("id"), col("temperature"), col("status"))
        .orderBy("id")
    },
    Some("""SELECT CAST(id AS BIGINT) AS id, CAST(t AS DOUBLE) AS temperature,
      status FROM (VALUES (1, 2.5, 'OK'), (2, 2.7, 'OK'), (3, 2.9, 'FAIL'))
      AS v(id, t, status) ORDER BY id"""))

  // --- p02: blank spec entry drops that file position (P1) ------------
  private val p02 = GraftQuery(
    "p02_blank_column_drop",
    (s, _) => {
      val cfg = PlaybackConfig(columnMethod = ColumnMethod.Explicit,
        useColumns = "id:int,,status:str")
      CsvPlayback.readFile(s, cfg, Fixtures.path("typed.csv", typedCsv))
        .select(col("id"), col("status"))
        .orderBy("id")
    },
    Some("""SELECT CAST(id AS BIGINT) AS id, status
      FROM (VALUES (1, 'OK'), (2, 'OK'), (3, 'FAIL')) AS v(id, status)
      ORDER BY id"""))

  // --- p03: ragged-row pivot (R2) -------------------------------------
  private val p03 = GraftQuery(
    "p03_ragged_pivot",
    (s, _) => {
      val cfg = PlaybackConfig(variableCols = true)
      CsvPlayback.readFile(s, cfg, Fixtures.path("ragged.csv", raggedCsv))
        .select(col(CsvPlayback.RowIdx).as("line_id"), col("datapoint"), col("value"))
        .orderBy("line_id", "datapoint")
    },
    Some("""SELECT CAST(line_id AS BIGINT) AS line_id, datapoint, value
      FROM (VALUES
        (0, 'column_1', 'a'), (0, 'column_2', 'b'), (0, 'column_3', 'c'),
        (1, 'column_1', '2'), (1, 'column_2', '3'), (1, 'column_4', '23'),
        (2, 'column_1', '4')) AS v(line_id, datapoint, value)
      ORDER BY line_id, datapoint"""))

  // --- p04: skip_rows header method (P5) ------------------------------
  private val p04 = GraftQuery(
    "p04_header_skip",
    (s, _) => {
      val cfg = PlaybackConfig(headerMethod = HeaderMethod.SkipRows, noOfRows = 3)
      CsvPlayback.readFile(s, cfg, Fixtures.path("skip3.csv", skipCsv))
        .select(col("channel1"), col("channel2"))
    },
    Some("""SELECT CAST(0.0081 AS DOUBLE) AS channel1,
      CAST(0.0070 AS DOUBLE) AS channel2"""))

  // --- p05: pass_in_datapoint metadata attach (R3) --------------------
  private val p05 = GraftQuery(
    "p05_meta_datapoint",
    (s, _) => {
      val cfg = PlaybackConfig(headerMethod = HeaderMethod.PassInDatapoint, noOfRows = 2)
      CsvPlayback.readFile(s, cfg, Fixtures.path("meta_header.csv", metaCsv))
        .select(col("channel1"), col("channel2"), col("metadata"))
        .orderBy("channel1")
    },
    Some("""SELECT CAST(c1 AS DOUBLE) AS channel1, CAST(c2 AS DOUBLE) AS channel2,
      m AS metadata FROM (VALUES
        (0.0081, 0.0070, 'device=vib-007_firmware=1.4.2'),
        (0.0082, 0.0071, 'device=vib-007_firmware=1.4.2')) AS v(c1, c2, m)
      ORDER BY channel1"""))

  // --- p06: T3 copy-csv-value timestamp parse (R4/T3) -----------------
  private val p06 = GraftQuery(
    "p06_ts_copy",
    (s, _) => {
      val df = CsvPlayback.readFile(s, PlaybackConfig(),
        Fixtures.path("vibration.csv", vibrationCsv))
      TimestampStyles.copyCsvValue(df, "user_ts", fmt)
        .select(round(col("channel1"), 10).as("channel1"),
          tsStr("timestamp").as("ts"))
        .orderBy("ts")
    },
    Some("""SELECT CAST(c1 AS DOUBLE) AS channel1, ts FROM (VALUES
      (0.0083912037, '2019-12-12 10:00:00.000000'),
      (0.0083214452, '2019-12-12 10:00:00.000125'),
      (0.0081125781, '2019-12-12 10:00:00.000250')) AS v(c1, ts)
      ORDER BY ts"""))

  // --- p07: T5 sample-delta synthetic timestamps ----------------------
  private val p07 = GraftQuery(
    "p07_ts_delta",
    (s, _) => {
      val df = CsvPlayback.readFile(s, PlaybackConfig(),
        Fixtures.path("vibration.csv", vibrationCsv))
      TimestampStyles.sampleDelta(df, "user_ts", fmt,
          Instant.parse("2020-01-01T00:00:00Z"))
        .select(col(CsvPlayback.RowIdx).as("n"), tsStr("timestamp").as("ts"))
        .orderBy("n")
    },
    Some("""SELECT CAST(n AS BIGINT) AS n, ts FROM (VALUES
      (0, '2020-01-01 00:00:00.000000'),
      (1, '2020-01-01 00:00:00.000125'),
      (2, '2020-01-01 00:00:00.000250')) AS v(n, ts)
      ORDER BY n"""))

  // --- p08: T2 current-time-continuous synthetic spacing --------------
  private val p08 = GraftQuery(
    "p08_ts_continuous",
    (s, _) => {
      val df = CsvPlayback.readFile(s, PlaybackConfig(),
        Fixtures.path("vibration.csv", vibrationCsv))
      TimestampStyles.currentTimeContinuous(df,
          Instant.parse("2020-06-01T12:00:00.999999Z"), chunkSize = 3, periodSec = 1.0)
        .select(col(CsvPlayback.RowIdx).as("n"), tsStr("timestamp").as("ts"))
        .orderBy("n")
    },
    Some("""SELECT CAST(n AS BIGINT) AS n, ts FROM (VALUES
      (0, '2020-06-01 12:00:00.000000'),
      (1, '2020-06-01 12:00:00.333333'),
      (2, '2020-06-01 12:00:00.666666')) AS v(n, ts)
      ORDER BY n"""))

  // --- p09: ignoreNaN=report violation scan (R6) ----------------------
  private val p09 = GraftQuery(
    "p09_nan_violations",
    (s, _) => {
      import s.implicits._
      val df = CsvPlayback.readFile(s, PlaybackConfig(),
        Fixtures.path("nan_blank.csv", nanCsv))
      NaNReport.violations(df).toSeq.toDF("column", "violations")
        .orderBy("column")
    },
    Some("""SELECT col AS "column", CAST(v AS BIGINT) AS violations
      FROM (VALUES ('channel1', 1), ('channel2', 2), ('deadcol', 3))
      AS t(col, v) ORDER BY col"""))

  // --- p10: linear interpolation fill (A1) ----------------------------
  private val p10 = GraftQuery(
    "p10_interpolate_linear",
    (s, _) => {
      val df = CsvPlayback.readFile(s, PlaybackConfig(),
        Fixtures.path("interp.csv", interpCsv))
      val f1 = CleanCsv.interpolateLinear(df, "v1")
      val f2 = CleanCsv.interpolateLinear(f1, "v2")
      f2.select(col(CsvPlayback.RowIdx).as("n"),
          round(col("v1"), 6).as("v1"), round(col("v2"), 6).as("v2"))
        .orderBy("n")
    },
    Some("""SELECT CAST(n AS BIGINT) AS n, CAST(v1 AS DOUBLE) AS v1,
      CAST(v2 AS DOUBLE) AS v2 FROM (VALUES
      (0, 1.0, 10.0), (1, 2.0, 20.0), (2, 3.0, 30.0), (3, 4.0, 40.0))
      AS t(n, v1, v2) ORDER BY n"""))

  // --- p11: rolling-mean fill (A2) ------------------------------------
  private val p11 = GraftQuery(
    "p11_rolling_mean_fill",
    (s, _) => {
      val df = CsvPlayback.readFile(s, PlaybackConfig(),
        Fixtures.path("interp.csv", interpCsv))
      val f1 = CleanCsv.rollingMeanFill(df, "v1")
      val f2 = CleanCsv.rollingMeanFill(f1, "v2")
      f2.select(col(CsvPlayback.RowIdx).as("n"),
          round(col("v1"), 6).as("v1"), round(col("v2"), 6).as("v2"))
        .orderBy("n")
    },
    Some("""SELECT CAST(n AS BIGINT) AS n, CAST(v1 AS DOUBLE) AS v1,
      CAST(v2 AS DOUBLE) AS v2 FROM (VALUES
      (0, 1.0, 10.0), (1, 1.0, 10.0), (2, 3.0, NULL), (3, 4.0, 40.0))
      AS t(n, v1, v2) ORDER BY n"""))

  // --- p12: JSON-ish channel extraction, preprocessing CLI (R7) -------
  private val p12 = GraftQuery(
    "p12_clean_extract",
    (s, _) => {
      val raw = CsvPlayback.readFile(s, PlaybackConfig(),
        Fixtures.path("raw_fledge_export.csv", rawExportCsv))
      CleanCsv.extractChannels(raw)
        .select(col("channel1"), col("channel2"), col("user_ts"))
        .orderBy("user_ts")
    },
    Some("""SELECT c1 AS channel1, c2 AS channel2, ts AS user_ts FROM (VALUES
      ('0.0083912037', '0.0071383551', '2019-12-12 10:00:00.000000+0000'),
      ('0.0083214452', '0.0071025003', '2019-12-12 10:00:00.000125+0000'))
      AS v(c1, c2, ts) ORDER BY user_ts"""))

  val all: Seq[GraftQuery] = Seq(p01, p02, p03, p04, p05, p06, p07, p08, p09, p10, p11, p12)
}
