package graft

import graft.config.{Enums, PlaybackConfig}
import Enums._
import graft.sources.{CsvPlayback, NaNReport}
import org.apache.spark.sql.functions._

class CsvPlaybackSpec extends SparkSpec {

  test("pick_from_file default: header row 0, schema inferred") {
    val df = CsvPlayback.readFile(spark, PlaybackConfig(), fixture("vibration.csv"))
    assert(df.columns.toSeq == Seq("channel1", "channel2", "user_ts", "_row_idx"))
    assert(df.count() == 3)
    val first = df.orderBy("_row_idx").select("channel1").head().getDouble(0)
    assert(math.abs(first - 0.0083912037) < 1e-12)
  }

  test("compressed variants decompress by extension (csvplayback.py:510)") {
    for (ext <- Seq(".gz", ".bz2")) {
      val df = CsvPlayback.readFile(spark, PlaybackConfig(), fixture("vibration.csv" + ext))
      assert(df.count() == 3, ext)
    }
  }

  test("explicit useColumns: rename + cast (docs/index.rst:82-114)") {
    val cfg = PlaybackConfig(columnMethod = ColumnMethod.Explicit,
      useColumns = "id:int,temperature:float,status:str")
    val df = CsvPlayback.readFile(spark, cfg, fixture("typed.csv"))
    assert(df.columns.toSeq == Seq("id", "temperature", "status", "_row_idx"))
    assert(df.schema("id").dataType.typeName == "long")
    assert(df.schema("temperature").dataType.typeName == "double")
    val r = df.orderBy("_row_idx").head()
    assert(r.getLong(0) == 1L && math.abs(r.getDouble(1) - 2.5) < 1e-12 && r.getString(2) == "OK")
  }

  test("explicit useColumns: blank entry drops that position (csvplayback.py:619-620)") {
    val cfg = PlaybackConfig(columnMethod = ColumnMethod.Explicit,
      useColumns = "id:int,,status:str")
    val df = CsvPlayback.readFile(spark, cfg, fixture("typed.csv"))
    assert(df.columns.toSeq == Seq("id", "status", "_row_idx"))
  }

  test("explicit useColumns: int cast of float column truncates like pandas") {
    val cfg = PlaybackConfig(columnMethod = ColumnMethod.Explicit,
      useColumns = "id:int,temperature:int,status:str")
    val df = CsvPlayback.readFile(spark, cfg, fixture("typed.csv"))
    assert(df.orderBy("_row_idx").select("temperature").head().getLong(0) == 2L)
  }

  test("skip_rows drops noOfRows physical lines (csvplayback.py:579-584)") {
    val cfg = PlaybackConfig(headerMethod = HeaderMethod.SkipRows, noOfRows = 3)
    val df = CsvPlayback.readFile(spark, cfg, fixture("skip3.csv"))
    assert(df.columns.toSeq == Seq("channel1", "channel2", "_row_idx"))
    assert(df.count() == 1)
  }

  test("pass_in_datapoint attaches joined header lines (csvplayback.py:661-671)") {
    val cfg = PlaybackConfig(headerMethod = HeaderMethod.PassInDatapoint, noOfRows = 2)
    val df = CsvPlayback.readFile(spark, cfg, fixture("meta_header.csv"))
    assert(df.columns.contains("metadata"))
    val metas = df.select("metadata").distinct().collect().map(_.getString(0))
    assert(metas.toSeq == Seq("device=vib-007_firmware=1.4.2"))
    assert(df.count() == 2)
  }

  test("ragged pivot skips empty fields (csvplayback.py:703-711, docs:52-67)") {
    val cfg = PlaybackConfig(variableCols = true)
    val df = CsvPlayback.readFile(spark, cfg, fixture("ragged.csv"))
    val got = df.orderBy("_row_idx", "datapoint")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got == Seq(
      (0L, "column_1", "a"), (0L, "column_2", "b"), (0L, "column_3", "c"),
      (1L, "column_1", "2"), (1L, "column_2", "3"), (1L, "column_4", "23"),
      (2L, "column_1", "4")))
  }

  test("NaN report: violations detected (csvplayback.py:681-691)") {
    val cfg = PlaybackConfig() // ignore: passes
    val df = CsvPlayback.readFile(spark, cfg, fixture("nan_blank.csv"))
    val v = NaNReport.violations(df)
    assert(v("channel1") == 1 && v("channel2") == 2 && v("deadcol") == 3)
    val reportCfg = PlaybackConfig(ignoreNaN = NaNPolicy.Report)
    intercept[IllegalStateException](
      CsvPlayback.readFile(spark, reportCfg, fixture("nan_blank.csv")).count())
  }

  test("zero-byte file raises EOF (csvplayback.py:566-568)") {
    val p = java.nio.file.Files.createTempFile("empty", ".csv")
    intercept[java.io.EOFException](
      CsvPlayback.readFile(spark, PlaybackConfig(), p.toString))
    java.nio.file.Files.delete(p)
  }

  test("file pattern matching (csvplayback.py:503-510)") {
    val dir = java.nio.file.Files.createTempDirectory("ff")
    for (n <- Seq("b_vib.csv", "a_vib.csv", "vib.txt", "other.csv", "c_vib.csv.gz"))
      java.nio.file.Files.writeString(dir.resolve(n), "x")
    val found = PlaybackConfig.matchingFiles(dir, "vib").map(_.getFileName.toString)
    assert(found == Seq("a_vib.csv", "b_vib.csv", "c_vib.csv.gz"))
  }
}
