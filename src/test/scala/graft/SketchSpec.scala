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
}
