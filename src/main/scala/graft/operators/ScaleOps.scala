package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The shuffle-management toolkit for 100 TB operation: bucketed
  * co-located joins (pay the shuffle once at write time, never again)
  * and salted joins for skewed keys (beyond what AQE's skew-join
  * splitting handles).
  */
object ScaleOps {

  /** Writes a table bucketed + sorted on the join key. Subsequent joins
    * between tables bucketed the same way execute with NO exchange on
    * either side — the scan is already hash-distributed. This is the
    * 100 TB pattern for fact-fact joins (lineitem ⋈ orders): one write
    * shuffle amortized over every future join. */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
      nBuckets: Int, path: String): Unit =
    df.write
      .format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .mode("overwrite")
      .saveAsTable(tableName)

  /** Salted join for a skewed build side: the big (skewed) side gets a
    * deterministic salt in [0, salts) derived from its whole row; the
    * small side is replicated `salts` times. Join key becomes
    * (key, salt) — a hot key's rows spread over `salts` reducers.
    * Semantics identical to `big.join(small, key)` (inner). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)), lit(salts)))
    val explodedSmall = small.withColumn("_salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    saltedBig.join(explodedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-stage salted aggregation for skewed grouping keys: stage one
    * aggregates on (key, salt) so a hot key's reduce work spreads over
    * `salts` tasks; stage two re-aggregates the tiny (keys × salts)
    * intermediate. Exact for algebraic aggregates (sum/count here —
    * min/max/avg decompose the same way). Spark's hash aggregate
    * already computes map-side partials; explicit salting additionally
    * splits a hot key's reducer, which AQE can't do for aggregations. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      salts: Int): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)), lit(salts)))
    salted.groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_s"), count(lit(1)).as("_c"))
      .groupBy(col(key))
      .agg(sum(col("_s")).as("sum_value"), sum(col("_c")).as("n"))
  }

  /** Key-frequency probe for deciding salting / AQE skew thresholds:
    * top-n heaviest keys with their share of the table. */
  def keySkewProfile(df: DataFrame, key: String, topN: Int = 10): DataFrame = {
    val total = df.count()
    df.groupBy(col(key))
      .agg(count(lit(1)).as("n"))
      .withColumn("share", round(col("n") / total.toDouble, 6))
      .orderBy(col("n").desc, col(key))
      .limit(topN)
  }
}
