package graft.queries

import graft.{GraftQuery, Tables}
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Text-analysis query surface over the `documents` table: token
  * statistics, quality signals, language ID, word frequencies,
  * fingerprints. All map-side expressions (no UDFs); the only shuffle
  * is the explicit word-frequency aggregation.
  */
object TextQueries {

  private val stop = TextAnalysis.defaultStopwords // the, a, of, and, to, in, is
  private val stopSql = stop.map(s => s"'$s'").mkString(", ")

  // --- t01: tokenization statistics -----------------------------------
  private val t01 = GraftQuery(
    "t01_token_stats",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      docs.select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
        col("n_chars"),
        round(TextAnalysis.avgTokenLen(col("text")), 4).as("avg_token_len"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
      len(string_split_regex(trim(text), '\s+')) AS n_tokens,
      n_chars,
      round(CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
        / len(string_split_regex(trim(text), '\s+')), 4) AS avg_token_len
    FROM documents ORDER BY doc_id"""),
    bench = true)

  // --- t02: quality-signal ratios -------------------------------------
  private val t02 = GraftQuery(
    "t02_quality_signals",
    (s, d) =>
      Tables(s, d, "documents").select(
        col("doc_id"),
        round(TextAnalysis.stopwordRatio(col("text"), stop), 6).as("stop_ratio"),
        round(TextAnalysis.spaceRatio(col("text")), 6).as("space_ratio"))
        .orderBy("doc_id"),
    Some(s"""SELECT doc_id,
      round(CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
        t -> t IN ($stopSql))) AS DOUBLE)
        / len(string_split_regex(trim(text), '\\s+')), 6) AS stop_ratio,
      round(CAST(length(text) - length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
        / length(text), 6) AS space_ratio
    FROM documents ORDER BY doc_id"""))

  // --- t03: corpus word frequencies (explode → shuffle agg) -----------
  private val t03 = GraftQuery(
    "t03_word_freq",
    (s, d) =>
      Tables(s, d, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
        .limit(50),
    Some("""SELECT word, count(*) AS n FROM (
      SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
      FROM documents)
    GROUP BY word ORDER BY n DESC, word LIMIT 50"""),
    bench = true)

  // --- t04: language-ID heuristic vs the labeled lang column ----------
  private val t04 = GraftQuery(
    "t04_langid_confusion",
    (s, d) =>
      Tables(s, d, "documents")
        .select(col("lang"), TextAnalysis.langId(col("text")).as("predicted"))
        .groupBy("lang", "predicted")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "predicted"),
    Some("""WITH scored AS (
      SELECT lang,
        list_filter(string_split_regex(trim(lower(text)), '\s+'),
          t -> t IN ('the','a','of','to','and','is','in')) AS hit_en,
        list_filter(string_split_regex(trim(lower(text)), '\s+'),
          t -> t IN ('der','die','das','und','ist','nicht')) AS hit_de,
        list_filter(string_split_regex(trim(lower(text)), '\s+'),
          t -> t IN ('el','los','las','que','por','una')) AS hit_es,
        list_filter(string_split_regex(trim(lower(text)), '\s+'),
          t -> t IN ('le','les','des','et','une','est')) AS hit_fr,
        regexp_matches(text, '[^\x00-\x7F]') AS non_ascii
      FROM documents)
    SELECT lang,
      CASE WHEN non_ascii THEN 'other'
           WHEN len(hit_en) >= len(hit_de) AND len(hit_en) >= len(hit_es)
                AND len(hit_en) >= len(hit_fr) THEN 'en'
           WHEN len(hit_de) >= len(hit_es) AND len(hit_de) >= len(hit_fr) THEN 'de'
           WHEN len(hit_es) >= len(hit_fr) THEN 'es'
           ELSE 'fr' END AS predicted,
      count(*) AS n
    FROM scored GROUP BY 1, 2 ORDER BY lang, predicted"""))

  // --- t05: content fingerprints --------------------------------------
  private val t05 = GraftQuery(
    "t05_fingerprint",
    (s, d) =>
      Tables(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
      md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
    FROM documents ORDER BY doc_id"""))

  // --- t06: the full curation pipeline in one plan --------------------
  // quality gate → exact dedup (keep-first) → deterministic split →
  // per-(lang, split) counts. The composition a training-data pipeline
  // actually runs; every stage is the operator verified individually
  // above, and the whole plan stays map-side except the dedup shuffle
  // and final count.
  private val t06 = GraftQuery(
    "t06_curation_pipeline",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      val quality = docs.filter(
        TextAnalysis.stopwordRatio(col("text"), stop) >= 0.03 &&
          col("n_chars").between(50, 520))
      val deduped = graft.operators.Dedup.exactKeepFirst(quality, "text", "doc_id")
      deduped
        .withColumn("split", graft.operators.Sampling.assignSplit(col("doc_id")))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "split")
    },
    Some(s"""WITH quality AS (
      SELECT * FROM documents
      WHERE CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
          t -> t IN ($stopSql))) AS DOUBLE)
          / len(string_split_regex(trim(text), '\\s+')) >= 0.03
        AND n_chars BETWEEN 50 AND 520),
    deduped AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM quality) WHERE rn = 1)
    SELECT lang,
      CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
           WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
           ELSE 'test' END AS split,
      count(*) AS n
    FROM deduped GROUP BY 1, 2 ORDER BY lang, split"""),
    bench = true)

  val all: Seq[GraftQuery] = Seq(t01, t02, t03, t04, t05, t06)
}
