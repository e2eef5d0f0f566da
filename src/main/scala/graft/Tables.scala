package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects. Read it as a nano-precision long and truncate to
      // Spark's native microsecond timestamps (DuckDB does the same
      // ns→µs truncation when reading TIMESTAMP_NS into its µs type).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      if (df.schema("ts").dataType == LongType)
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      else df
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}
