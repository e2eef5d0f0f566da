package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality signals, language ID, fingerprinting,
  * shingling. All pure `functions._` expressions — codegen'd, no UDFs,
  * embarrassingly parallel (no shuffle), so they scale linearly with
  * input splits at 100 TB.
  */
object TextAnalysis {

  /** Whitespace tokenization (the only tokenizer the synthetic corpus
    * needs; a BPE-ish regex variant is [[regexTokens]]). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish pre-tokenizer: words, numbers, or single punctuation. */
  def regexTokens(text: Column): Column =
    filter(split(text, "(?=[^\\p{L}\\p{N}])|(?<=[^\\p{L}\\p{N}])"),
      t => length(trim(t)) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  def avgTokenLen(text: Column): Column =
    length(regexp_replace(text, "\\s", "")).cast("double") /
      tokenCount(text).cast("double")

  /** Character-class ratios over the raw text. */
  def charRatio(text: Column, charClassRe: String): Column =
    when(length(text) === 0, 0.0).otherwise(
      (length(text) - length(regexp_replace(text, charClassRe, ""))).cast("double") /
        length(text).cast("double"))

  def digitRatio(text: Column): Column = charRatio(text, "[0-9]")
  def upperRatio(text: Column): Column = charRatio(text, "[A-Z]")
  def punctRatio(text: Column): Column = charRatio(text, "[\\p{Punct}]")
  def spaceRatio(text: Column): Column = charRatio(text, "\\s")

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is")

  def stopwordRatio(text: Column, stopwords: Seq[String] = defaultStopwords): Column = {
    val ts = tokens(text)
    size(filter(ts, t => t.isInCollection(stopwords))).cast("double") /
      size(ts).cast("double")
  }

  /** A simple document quality score in [0,1]: rewards stopword
    * presence and sane token lengths, penalizes digit/punct noise
    * (the length/punct/stopword-ratio family used by corpus filters). */
  def qualityScore(text: Column): Column = {
    val stop = least(stopwordRatio(text) * 5.0, lit(1.0)) // ≥20% stopwords → full marks
    val lenOk = when(avgTokenLen(text).between(2.0, 12.0), 1.0).otherwise(0.3)
    val noise = greatest(lit(0.0), lit(1.0) - (digitRatio(text) + punctRatio(text)) * 3.0)
    round((stop * 0.4 + lenOk * 0.3 + noise * 0.3), 6)
  }

  /** Language-ID heuristic: non-ASCII script check, then stopword
    * profiles with a deterministic preference ladder (en ≥ de ≥ es ≥
    * fr). Mirrors are SQL-expressible for the oracle. */
  def langId(text: Column): Column = {
    val ts = tokens(lower(text))
    def score(words: Seq[String]) = size(filter(ts, t => t.isInCollection(words)))
    val en = score(Seq("the", "a", "of", "to", "and", "is", "in"))
    val de = score(Seq("der", "die", "das", "und", "ist", "nicht"))
    val es = score(Seq("el", "los", "las", "que", "por", "una"))
    val fr = score(Seq("le", "les", "des", "et", "une", "est"))
    when(text.rlike("[^\\x00-\\x7F]"), "other")
      .when(en >= de && en >= es && en >= fr, "en")
      .when(de >= es && de >= fr, "de")
      .when(es >= fr, "es")
      .otherwise("fr")
  }

  /** Whitespace-normalized lowercase form used for fingerprinting. */
  def normalized(text: Column): Column =
    lower(regexp_replace(trim(text), "\\s+", " "))

  /** Content fingerprint of the normalized text (md5 — stable across
    * engines; a cheap 64-bit variant is [[fingerprint64]]). */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** xxhash64 fingerprint — the cheap in-engine form for shuffles/keys. */
  def fingerprint64(text: Column): Column = xxhash64(normalized(text))

  /** Winnowing fingerprint set (rolling-hash k-grams, window minima):
    * overlap between two documents' sets localizes shared passages —
    * the passage-level dedup signal a whole-document digest can't give.
    * See [[graft.functions.HashExpressions.Winnow]]. */
  def winnowFingerprints(text: Column, k: Int = 5, w: Int = 4): Column =
    graft.functions.HashExpressions.winnow(normalized(text), k, w)

  /** k-word shingles of the token stream; documents shorter than k
    * tokens contribute their whole (normalized) token string as a
    * single shingle. Distinct-ified (set semantics for Jaccard).
    *
    * Built by zipping k shifted views of the token array — array-level
    * operations only, so the tokenizer runs k+1 times per ROW. (The
    * index-lambda formulation `element_at(tokens, i+j)` re-evaluates
    * the split per shingle element — ~60× slower on real documents.)
    * zip_with pads the shorter side with null and `concat` propagates
    * it, so padded tails drop out in the filter. */
  def wordShingles(text: Column, k: Int): Column = {
    val ts = tokens(text)
    val n = size(ts)
    val shifted = (1 until k).map(j => slice(ts, lit(j + 1), greatest(n - j, lit(0))))
    val combined = shifted.foldLeft(ts)((acc, s) =>
      zip_with(acc, s, (a, b) => concat(a, lit(" "), b)))
    val sh = filter(combined, x => x.isNotNull)
    array_distinct(when(n >= k, sh).otherwise(array(concat_ws(" ", ts))))
  }

  /** Exact Jaccard similarity of two (distinct) shingle arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter).cast("double")
  }
}
