package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * All queries receive a scale-factor directory and read tables through
  * here so that a future move to partitioned / bucketed layouts (or a
  * catalog) is a one-file change.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts has shipped with three physical parquet types so far:
      //   TIMESTAMP(NANOS)       -> read as long + truncate ns->us (DuckDB
      //                             applies the same truncation reading
      //                             TIMESTAMP_NS into its us-precision type)
      //   timestamp[us] no-tz    -> Spark reads TIMESTAMP_NTZ; the session
      //                             tz is pinned UTC, so casting to the
      //                             instant type is micros-identical and
      //                             keeps unix_micros() et al. analyzable
      //   timestamp[us] UTC      -> TimestampType directly, no shim
      // Normalizing here keeps every query free of per-file type guards.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // The NTZ->instant cast below is micros-identical ONLY under a
      // UTC session zone; a non-UTC session would silently shift every
      // ts value. All entry points pin UTC, but the invariant belongs
      // where it is relied on — enforce, don't assume.
      require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
        "Tables requires spark.sql.session.timeZone=UTC (the NTZ " +
          "events.ts normalization is only lossless under UTC)")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case LongType         => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
        case _                => df
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}
