package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics whose exact form matters at scale (the
  * approximations — bucketed counts, sampled sweeps — are the things
  * that silently undercount at peaks). */
object EventOps {

  /** Exact peak concurrency per day over per-(user, day) activity
    * intervals: each interval emits +1 at its start and −1 at its end
    * (end-INCLUSIVE: delta DESC orders a start before an end at the
    * same instant, so a session starting exactly when another ends
    * overlaps it), and the day's peak is the max running sum. The
    * default RANGE window frame accumulates whole tie groups, so the
    * result is order-deterministic under duplicate timestamps.
    *
    * Scale shape: the sweep never sees raw events — intervals come
    * from one (day, user) partial aggregate and the swept stream is
    * 2 rows per session. The one wide edge is the day-keyed exchange;
    * the within-partition sort covers a day's session BOUNDARIES, not
    * its events. Returns (day, peak_concurrent, n_sessions). */
  def peakConcurrencyDaily(events: DataFrame, tsCol: String = "ts",
      userCol: String = "user_id"): DataFrame = {
    val iv = events
      .groupBy(to_date(col(tsCol)).as("day"), col(userCol))
      .agg(min(unix_micros(col(tsCol))).as("lo"),
        max(unix_micros(col(tsCol))).as("hi"))
    val bounds = iv
      .select(col("day"), col("lo").as("us"), lit(1L).as("delta"))
      .unionByName(iv
        .select(col("day"), col("hi").as("us"), lit(-1L).as("delta")))
    val w = Window.partitionBy(col("day"))
      .orderBy(col("us").asc, col("delta").desc)
    bounds
      .withColumn("running", sum(col("delta")).over(w))
      .groupBy(col("day"))
      .agg(max(col("running")).as("peak_concurrent"),
        (count(lit(1)) / 2).cast("long").as("n_sessions"))
      .orderBy("day")
  }
}
