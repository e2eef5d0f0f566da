package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability: a Spark implementation plus (when the
  * semantics are SQL-expressible) an equivalent DuckDB oracle query.
  *
  * Determinism contract (the driver hash-compares results):
  *   - every query ends in an explicit total ORDER BY;
  *   - every floating-point output column is `round(...)`-ed identically
  *     on both sides;
  *   - every computed column is aliased to the same name on both sides
  *     (the driver sorts columns by name before hashing).
  */
final case class GraftQuery(
    name: String,
    impl: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

/** Assembles the full query surface exposed via [[SparkEntry]]. */
object QueryRegistry {
  def all: Seq[GraftQuery] =
    queries.RelationalQueries.all ++
      queries.TextQueries.all ++
      queries.DedupQueries.all ++
      queries.VectorQueries.all ++
      queries.SamplingQueries.all ++
      queries.IngestQueries.all ++
      queries.PipelineQueries.all ++
      queries.PlaybackQueries.all

  lazy val queryMap: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.impl).toMap

  // def, not lazy val: the trained-ANN oracles (VectorQueries
  // v23/v24/v25) are built from models captured during the query runs,
  // so the map must be assembled at CALL time — Verify reads it after
  // every query has executed, which is exactly when those slots are
  // filled. A memoized map would freeze whatever the first (possibly
  // pre-run) access saw.
  def oracleMap: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  lazy val benchNames: Seq[String] = all.filter(_.bench).map(_.name)
}
