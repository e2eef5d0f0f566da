package graft

import graft.config.PlaybackConfig
import graft.preprocess.CleanCsv
import graft.sources.CsvPlayback
import org.apache.spark.sql.functions._

class CleanCsvSpec extends SparkSpec {

  private def interp = CsvPlayback.readFile(spark, PlaybackConfig(), fixture("interp.csv"))

  private def vals(df: org.apache.spark.sql.DataFrame, c: String): Seq[Any] =
    df.orderBy("_row_idx").select(c).collect().map(r => if (r.isNullAt(0)) null else r.get(0)).toSeq

  test("channel extraction from JSON-ish strings (PD:74-81)") {
    val raw = CsvPlayback.readFile(spark, PlaybackConfig(), fixture("raw_fledge_export.csv"))
    val df = CleanCsv.extractChannels(raw)
    assert(df.columns.toSeq == Seq("channel1", "channel2", "user_ts", "_row_idx"))
    val r = df.orderBy("_row_idx").head()
    // reference keeps values as strings sliced out of the dict text
    assert(r.getString(0).contains("0.0083912037"))
    assert(r.getString(1).contains("0.0071383551"))
  }

  test("linear interpolation, limit_direction=both (PD:124-126)") {
    // v1: 1.0, null, 3.0, 4.0 → null between 1 and 3 at distance 1/2 → 2.0
    val df = CleanCsv.interpolateLinear(interp, "v1")
    assert(vals(df, "v1") == Seq(1.0, 2.0, 3.0, 4.0))
    // v2: 10.0, null, null, 40.0 → 20, 30
    val df2 = CleanCsv.interpolateLinear(interp, "v2")
    assert(vals(df2, "v2") == Seq(10.0, 20.0, 30.0, 40.0))
  }

  test("nearest interpolation: closer neighbor, ties to previous") {
    val df = CleanCsv.interpolateNearest(interp, "v2")
    // nulls at idx 1,2 between 10.0@0 and 40.0@3: idx1→prev (tie? d=1 vs 2 → prev), idx2→next
    assert(vals(df, "v2") == Seq(10.0, 10.0, 40.0, 40.0))
  }

  test("rolling mean fill: previous value (PD:128-130)") {
    val df = CleanCsv.rollingMeanFill(interp, "v1")
    assert(vals(df, "v1") == Seq(1.0, 1.0, 3.0, 4.0))
    // consecutive nulls: second null has null predecessor → stays null
    val df2 = CleanCsv.rollingMeanFill(interp, "v2")
    assert(vals(df2, "v2") == Seq(10.0, 10.0, null, 40.0))
  }

  test("rolling median fill (PD:132-134)") {
    val df = CleanCsv.rollingMedianFill(interp, "v1")
    assert(vals(df, "v1") == Seq(1.0, 1.0, 3.0, 4.0))
  }

  test("all-null column dropped (PD:113-116,137-139)") {
    val nan = CsvPlayback.readFile(spark, PlaybackConfig(), fixture("nan_blank.csv"))
    val repaired = CleanCsv.repair(nan, choice = "fill", method = "linear")
    assert(!repaired.columns.contains("deadcol"))
    assert(repaired.columns.contains("channel1"))
  }

  test("choice=drop removes any column with nulls (PD:141-146)") {
    val nan = CsvPlayback.readFile(spark, PlaybackConfig(), fixture("nan_blank.csv"))
    val repaired = CleanCsv.repair(nan, choice = "drop", method = "linear")
    assert(repaired.columns.toSeq == Seq("_row_idx"))
  }

  test("seriesKeys partition: interpolation stays within each series") {
    import spark.implicits._
    // two interleaved series; s2's null must NOT see s1's neighbors
    val df = Seq(
      ("s1", 0L, Some(0.0)), ("s2", 1L, Some(100.0)),
      ("s1", 2L, None), ("s2", 3L, None),
      ("s1", 4L, Some(4.0)), ("s2", 5L, Some(104.0)))
      .toDF("dev", "_row_idx", "v")
    val got = CleanCsv.interpolateLinear(df, "v", seriesKeys = Seq(col("dev")))
      .select("dev", "_row_idx", "v")
      .as[(String, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(got(("s1", 2L)) == 2.0)   // between 0 @0 and 4 @4
    assert(got(("s2", 3L)) == 102.0) // between 100 @1 and 104 @5
  }
}
