package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token count and avg length") {
    val d = Seq("the cat  sat", "a").toDF("text")
    val got = d.select(
      TextAnalysis.tokenCount(col("text")),
      round(TextAnalysis.avgTokenLen(col("text")), 4))
      .as[(Int, Double)].collect().toSeq
    assert(got == Seq((3, 3.0), (1, 1.0))) // "thecatsat" = 9 chars / 3 tokens
  }

  test("char ratios") {
    val d = Seq("ab12!?").toDF("text")
    val got = d.select(
      round(TextAnalysis.digitRatio(col("text")), 4),
      round(TextAnalysis.punctRatio(col("text")), 4))
      .as[(Double, Double)].head()
    assert(got == ((0.3333, 0.3333)))
  }

  test("stopword ratio and quality score") {
    val good = "the quick brown fox jumps over the lazy dog and runs to a barn"
    val noisy = "x9 $$ 77 !! 3j 99 ## @@ 11 zz"
    val d = Seq(good, noisy).toDF("text")
    val got = d.select(TextAnalysis.qualityScore(col("text"))).as[Double].collect()
    assert(got(0) > got(1), s"quality(good)=${got(0)} should beat quality(noisy)=${got(1)}")
  }

  test("langid heuristic picks profile languages deterministically") {
    val d = Seq(
      "the cat is in the house and a dog",
      "der hund ist nicht die katze und das haus",
      "el perro que los gatos por una casa",
      "le chien et les chats des maisons est une",
      "コンピュータ").toDF("text")
    val got = d.select(TextAnalysis.langId(col("text"))).as[String].collect().toSeq
    assert(got == Seq("en", "de", "es", "fr", "other"))
  }

  test("fingerprint is whitespace/case insensitive") {
    val d = Seq(("A  b\tC", "a b c"), ("x", "y")).toDF("t1", "t2")
    val got = d.select(
      (TextAnalysis.fingerprint(col("t1")) === TextAnalysis.fingerprint(col("t2"))).as("eq"))
      .as[Boolean].collect().toSeq
    assert(got == Seq(true, false))
  }

  test("NGrams expression matches the pure-builtin HOF shingles on the corpus") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    for (k <- Seq(2, 3, 5); distinct <- Seq(true, false)) {
      val fast = if (distinct) TextAnalysis.wordShingles(col("text"), k)
        else TextAnalysis.wordShinglesAll(col("text"), k)
      val mismatches = docs.select(
        fast.as("a"), TextAnalysis.wordShinglesHof(col("text"), k, distinct).as("b"))
        .filter(col("a") =!= col("b")).count()
      assert(mismatches == 0, s"k=$k distinct=$distinct")
    }
    // short-doc fallback parity
    val shorts = Seq("a b", "x", "").toDF("text")
    val m = shorts.select(TextAnalysis.wordShingles(col("text"), 3).as("a"),
      TextAnalysis.wordShinglesHof(col("text"), 3).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(m == 0)
  }

  test("gram_stats matches explode+groupBy reference on the corpus") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val fast = docs.select(col("doc_id"),
      graft.functions.HashExpressions.gram_stats(
        TextAnalysis.wordShinglesAll(col("text"), 2)).as("gs"))
      .select(col("doc_id"), col("gs.top").as("top"), col("gs.tot").as("tot"))
    val ref = docs
      .select(col("doc_id"), explode(TextAnalysis.wordShinglesAll(col("text"), 2)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").cast("int").as("top"), sum("c").cast("int").as("tot"))
    assert(fast.exceptAll(ref).count() == 0 && ref.exceptAll(fast).count() == 0)
  }

  test("wordShinglesAll keeps duplicates that wordShingles drops") {
    val d = Seq("a b a b a").toDF("text")
    val all = d.select(TextAnalysis.wordShinglesAll(col("text"), 2))
      .as[Seq[String]].head()
    val set = d.select(TextAnalysis.wordShingles(col("text"), 2))
      .as[Seq[String]].head()
    assert(all == Seq("a b", "b a", "a b", "b a"))
    assert(set == Seq("a b", "b a"))
  }

  test("pii redaction tags every pattern family and counts matches") {
    val d = Seq(
      "mail a.b+c@test.org or visit https://x.org/p/1 call +1 555-1234 ip 10.0.0.7 end"
    ).toDF("text")
    val red = d.select(TextAnalysis.redactPii(col("text")).as("r"))
      .as[String].head()
    assert(red == "mail [EMAIL] or visit [URL] call [PHONE] ip [IP] end")
    val counts = d.select(
      TextAnalysis.piiPatterns.map { case (tag, re) =>
        TextAnalysis.countPattern(col("text"), re).as(tag)
      }: _*).head()
    assert((0 until 4).map(counts.getLong) == Seq(1L, 1L, 1L, 1L))
  }

  test("tfidf ranks a doc's distinctive term above corpus-wide terms") {
    val docs = Seq(
      (1L, "alpha beta beta gamma"),
      (2L, "alpha beta delta"),
      (3L, "alpha epsilon epsilon epsilon")).toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopK(docs, "doc_id", "text", k = 1, docCount = 3)
      .select("doc_id", "term").as[(Long, String)].collect().toMap
    // 'alpha' appears everywhere → idf 0; the per-doc distinctive term
    // wins (doc 1: gamma tf=1·ln3 ≈ 1.10 beats beta tf=2·ln1.5 ≈ 0.81)
    assert(top == Map(1L -> "gamma", 2L -> "delta", 3L -> "epsilon"))
  }
}
