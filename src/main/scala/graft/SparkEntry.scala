package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are assembled from [[QueryRegistry]]; every
  * implemented operator family registers its queries there.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A 3-way join + aggregation (TPC-H Q3 shape) — exercises scan,
    * filter pushdown, broadcast join, shuffle agg, top-k in one plan.
    */
  def entry(spark: SparkSession): DataFrame =
    QueryRegistry.queryMap("q03_shipping_priority")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryRegistry.queryMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = QueryRegistry.oracleMap
}
