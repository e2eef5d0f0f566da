package graft.queries

import graft.{GraftQuery, Tables}
import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication query surface over the `documents` table.
  *
  * The driver corpus has no duplicates, so these queries plant
  * deterministic ones: exact copies (ids + 2,000,000) and near-dup
  * mutations with one appended token (ids + 1,000,000) for doc_id < 10.
  * The oracles plant the same rows in SQL, so exact/keep-first/Jaccard
  * results hash-match; the LSH operators (candidate generation is not
  * SQL-expressible) are covered rows-only here and exactly in
  * ScalaTest.
  */
object DedupQueries {

  /** documents ∪ near-dup mutations (+1M) ∪ exact copies (+2M). */
  private def planted(s: SparkSession, d: String): DataFrame = {
    val docs = Tables(s, d, "documents").select("doc_id", "text")
    val near = docs.filter(col("doc_id") < 10)
      .select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" graftdup")).as("text"))
    val exact = docs.filter(col("doc_id") < 10)
      .select((col("doc_id") + 2000000).as("doc_id"), col("text"))
    docs.unionByName(near).unionByName(exact)
  }

  private val plantedSql =
    """SELECT doc_id, text FROM documents
       UNION ALL SELECT doc_id + 1000000, text || ' graftdup'
         FROM documents WHERE doc_id < 10
       UNION ALL SELECT doc_id + 2000000, text
         FROM documents WHERE doc_id < 10"""

  // --- d01: exact dedup, keep-first -----------------------------------
  private val d01 = GraftQuery(
    "d01_exact_keep_first",
    (s, d) =>
      Dedup.exactKeepFirst(planted(s, d), "text", "doc_id")
        .select(col("doc_id"))
        .orderBy("doc_id"),
    Some(s"""SELECT doc_id FROM (
      SELECT doc_id, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
      FROM ($plantedSql))
    WHERE rn = 1 ORDER BY doc_id"""),
    bench = true)

  // --- d02: duplicate-group statistics --------------------------------
  private val d02 = GraftQuery(
    "d02_dup_stats",
    (s, d) => {
      val p = planted(s, d)
      p.agg(
        count(lit(1)).as("n_docs"),
        countDistinct(TextAnalysis.fingerprint(col("text"))).as("n_distinct"))
    },
    Some(s"""SELECT count(*) AS n_docs, count(DISTINCT text) AS n_distinct
      FROM ($plantedSql)"""))

  // --- d03: MinHash-LSH near-dup pairs (candidates not SQL-expressible;
  //     exact expectations asserted in DedupSpec) ----------------------
  private val d03 = GraftQuery(
    "d03_minhash_neardup",
    (s, d) =>
      Dedup.minhashNearDupPairs(
          planted(s, d).filter(col("doc_id") < 2000000), // exact copies excluded: near-dup op
          "doc_id", "text", numHashes = 128, bands = 32, threshold = 0.5)
        .orderBy("a", "b"),
    None,
    bench = true)

  // --- d04: SimHash hamming near-dup pairs ----------------------------
  private val d04 = GraftQuery(
    "d04_simhash_neardup",
    (s, d) =>
      Dedup.simhashNearDupPairs(
          planted(s, d).filter(col("doc_id") < 2000000),
          "doc_id", "text", maxHamming = 3)
        .orderBy("a", "b"),
    None)

  // --- d05: exact n-gram Jaccard for the planted pairs ----------------
  private val d05 = GraftQuery(
    "d05_ngram_jaccard",
    (s, d) => {
      val p = planted(s, d)
      val pairs = p.filter(col("doc_id") < 10)
        .select(col("doc_id").as("a"), (col("doc_id") + 1000000).as("b"))
      Dedup.jaccardForPairs(pairs, p, "doc_id", "text", shingleK = 3)
        .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("a")
    },
    Some(s"""WITH p AS ($plantedSql),
      sh AS (SELECT doc_id, list_distinct(list_transform(
        generate_series(1, greatest(1, len(string_split_regex(trim(text), '\\s+')) - 2)),
        i -> CASE WHEN len(string_split_regex(trim(text), '\\s+')) >= 3
          THEN string_split_regex(trim(text), '\\s+')[i] || ' ' ||
               string_split_regex(trim(text), '\\s+')[i+1] || ' ' ||
               string_split_regex(trim(text), '\\s+')[i+2]
          ELSE array_to_string(string_split_regex(trim(text), '\\s+'), ' ') END)) AS sh
        FROM p)
      SELECT a.doc_id AS a, b.doc_id AS b,
        round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
          (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
      FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1000000
      WHERE a.doc_id < 10 ORDER BY a"""))

  // --- d06: multimodal payload features (decode stub over binary) -----
  private val d06 = GraftQuery(
    "d06_media_features",
    (s, d) => {
      val media = graft.operators.Multimodal.syntheticMedia(s, Tables(s, d, "documents"))
      graft.operators.Multimodal.extractFeatures(media, dim = 4)
        .select(col("media_id"), col("kind"),
          round(element_at(col("features"), 1), 6).as("f1"),
          round(element_at(col("features"), 2), 6).as("f2"))
        .filter(col("media_id") < 50)
        .orderBy("media_id")
    },
    None) // decode stub: engine-specific, covered by MultimodalSpec

  val all: Seq[GraftQuery] = Seq(d01, d02, d03, d04, d05, d06)
}
