package graft.queries

import graft.{GraftQuery, Tables}
import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Deterministic sampling / split queries — content-hash driven, so the
  * DuckDB oracle reproduces them exactly via the same md5 prefixes.
  */
object SamplingQueries {

  // --- s01: ~10% deterministic uniform sample -------------------------
  private val s01 = GraftQuery(
    "s01_deterministic_sample",
    (s, d) =>
      Sampling.deterministicSample(
          Tables(s, d, "documents"), col("doc_id"), 0.1)
        .select(col("doc_id"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id FROM documents
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
      ORDER BY doc_id"""))

  // --- s02: 80/10/10 train/val/test split counts ----------------------
  private val s02 = GraftQuery(
    "s02_split_assignment",
    (s, d) =>
      Tables(s, d, "documents")
        .withColumn("split", Sampling.assignSplit(col("doc_id")))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"))
        .orderBy("split"),
    Some("""SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                 ELSE 'test' END AS split, count(*) AS n
      FROM documents GROUP BY 1 ORDER BY split"""))

  // --- s03: stratified downsample of the dominant language ------------
  private val s03 = GraftQuery(
    "s03_stratified_sample",
    (s, d) =>
      Sampling.stratifiedSample(Tables(s, d, "documents"),
          col("lang"), col("doc_id"), Map("en" -> 0.25))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy("lang"),
    Some("""SELECT lang, count(*) AS n FROM documents
      WHERE CASE WHEN lang = 'en'
                 THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '40'
                 ELSE TRUE END
      GROUP BY lang ORDER BY lang"""))

  // --- s04: deterministic k-subset (hash-ordered take) ----------------
  private val s04 = GraftQuery(
    "s04_deterministic_take",
    (s, d) =>
      Sampling.deterministicTakeK(Tables(s, d, "documents"), col("doc_id"), 25)
        .select(col("doc_id"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id FROM (
      SELECT doc_id FROM documents
      ORDER BY md5(CAST(doc_id AS VARCHAR)) LIMIT 25)
      ORDER BY doc_id"""))

  val all: Seq[GraftQuery] = Seq(s01, s02, s03, s04)
}
