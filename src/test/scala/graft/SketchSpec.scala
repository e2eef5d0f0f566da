package graft

import org.apache.spark.sql.functions._

/** q27's sketches are engine-specific (rows-only at the gate); this
  * spec pins their accuracy against exact values. */
class SketchSpec extends SparkSpec {

  private lazy val ev = Tables(spark, "/root/testdata/sf0.001", "events")

  test("approx_count_distinct within 5% of exact") {
    val exact = ev.groupBy("event_type").agg(countDistinct("user_id").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = ev.groupBy("event_type").agg(approx_count_distinct("user_id").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e < 0.05, s"$k: approx $a vs exact $e")
    }
  }

  test("percentile_approx(0.5) close to exact median") {
    val exact = ev.agg(expr("percentile(value, 0.5)")).head().getDouble(0)
    val approx = ev.agg(percentile_approx(col("value"), lit(0.5), lit(1000)))
      .head().getDouble(0)
    assert(math.abs(approx - exact) / exact < 0.05, s"approx $approx vs exact $exact")
  }

  test("q27 registry output: every per-type sketch within bounds of its exact twin") {
    // the kernel tests above pin the functions; this pins the ACTUAL
    // registry query (grouping, rounding, column wiring) against an
    // exact twin computed over the same rows — the strongest gate a
    // rows-only entry can carry
    val sf = "/root/testdata/sf0.001"
    val got = QueryRegistry.queryMap("q27_approx_stats")(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val exact = Tables(spark, sf, "events").groupBy("event_type")
      .agg(countDistinct("user_id").as("d"),
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.95)").as("p95"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet == exact.keySet, "one row per event type")
    exact.foreach { case (k, (d, p50, p95)) =>
      val (ad, a50, a95) = got(k)
      assert(math.abs(ad - d).toDouble / d < 0.05, s"$k users: $ad vs $d")
      assert(math.abs(a50 - p50) / math.abs(p50) < 0.05, s"$k p50: $a50 vs $p50")
      assert(math.abs(a95 - p95) / math.abs(p95) < 0.05, s"$k p95: $a95 vs $p95")
    }
  }
}
