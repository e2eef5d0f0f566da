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

  test("bigrams: shifted-slice zip, lowercased, empty under two tokens") {
    val d = Seq("The cat SAT", "solo", "", "a b").toDF("text")
    val got = d.select(TextAnalysis.bigrams(col("text")).cast("array<struct<w1:string,w2:string>>"))
      .as[Seq[(String, String)]].collect().toSeq
    assert(got == Seq(
      Seq(("the", "cat"), ("cat", "sat")),
      Nil, Nil,
      Seq(("a", "b"))))
  }

  test("bigram LM: repeated bigram scores lower NLL than a rare one") {
    // train corpus: "a b" appears 3×, "a c" once; V=3, k=0.5
    val train = Seq((1L, "a b a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val eval = Seq((10L, "a b"), (11L, "a c"), (12L, "q z")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmScore(eval, train, "doc_id", "text", vocabSize = 3)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    // P(b|a) = (3+.5)/(4+1.5), P(c|a) = (1+.5)/(4+1.5); unseen context
    // "q z" coalesces both counts to 0 → P = .5/1.5, still finite
    assert(math.abs(got(10L) - -math.log(3.5 / 5.5)) < 1e-6)
    assert(math.abs(got(11L) - -math.log(1.5 / 5.5)) < 1e-6)
    assert(math.abs(got(12L) - -math.log(0.5 / 1.5)) < 1e-6)
    // the dominant train bigram is cheapest; note add-k gives the
    // UNSEEN context a shallow denominator (0+1.5), so it lands
    // between the two seen ones — the classic add-k overestimate
    assert(got(10L) < got(12L) && got(12L) < got(11L))
  }

  test("bm25: rare term outranks common, length norm breaks tf ties") {
    val docs = Seq(
      (1L, "rare word word word"),
      (2L, "common word word word"),
      (3L, "common word"),
      (4L, "common filler filler filler filler filler filler")).toDF("doc_id", "text")
    val stats = docs.agg(count(lit(1)),
      avg(TextAnalysis.tokenCount(col("text")))).head()
    val got = TextAnalysis.bm25TopK(docs, "doc_id", "text",
      Seq("rare", "common"), k = 4,
      docCount = stats.getLong(0), avgDl = stats.getDouble(1))
      .as[(Long, Double)].collect().toSeq
    // 'rare' (df=1) beats 'common' (df=3) on idf; among the common
    // docs the shortest (3) scores highest, the longest (4) lowest
    assert(got.map(_._1) == Seq(1L, 3L, 2L, 4L))
    assert(got.map(_._2) == got.map(_._2).sorted.reverse)
  }

  test("normalize_utf8 folds accents, case, ligatures, width, whitespace") {
    val cases = Seq(
      "Café  DU  MONDE",          // é + case + double spaces
      "Café du monde",           // decomposed e + combining acute
      "ﬁn de siècle",        // ﬁ ligature (NFKC → fi)
      "ＡＢＣ",            // full-width ＡＢＣ (NFKC → ABC)
      "  träiling \t spaces \n ") // umlaut + tabs/newlines/trim
    val got = cases.toDF("t")
      .select(TextAnalysis.normalizedUnicode(col("t"))).as[String]
      .collect().toSeq
    assert(got == Seq("cafe du monde", "cafe du monde",
      "fin de siecle", "abc", "trailing spaces"))
    // SQL surface registered by GraftExtensions
    val viaSql = spark.sql(
      "SELECT normalize_text('CafÉ  du  Monde')").as[String].head()
    assert(viaSql == "cafe du monde")
    // identical canonical forms ⇒ identical unicode fingerprints
    val fps = Seq("Café du monde", "CAFÉ DU MONDE").toDF("t")
      .select(TextAnalysis.fingerprintUnicode(col("t"))).as[String]
      .collect().toSet
    assert(fps.size == 1)
  }

  test("encoding-quality signals flag mojibake and control bytes") {
    val rows = Seq(
      "clean ascii text",          // clean
      "café crème",      // non-ASCII but clean
      "bad � decode �",  // two replacement chars
      "bin\u0001ary\u0007spill",   // two control chars
      "tabs\tand\nnewlines are fine").toDF("text")
      .select(
        TextAnalysis.replacementCharCount(col("text")).as("n_repl"),
        TextAnalysis.controlCharCount(col("text")).as("n_ctl"),
        round(TextAnalysis.asciiRatio(col("text")), 2).as("ascii"))
      .as[(Long, Long, Double)].collect().toSeq
    assert(rows(0) == ((0L, 0L, 1.0)))
    assert(rows(1)._1 == 0L && rows(1)._2 == 0L && rows(1)._3 < 1.0)
    assert(rows(2)._1 == 2L, "replacement chars counted")
    assert(rows(3)._2 == 2L, "control chars counted")
    assert(rows(4) == ((0L, 0L, 1.0)), "tab/newline are not violations")
  }

  test("char entropy: degenerate text scores low, uniform alphabet exact") {
    val rows = Seq(
      "aaaa",         // one symbol → 0 bits
      "abab",         // two symbols, uniform → 1 bit
      "abcd",         // four symbols, uniform → 2 bits
      "",             // empty → 0 by convention
      "éé",           // non-BMP-safe code-point counting: one symbol → 0
      "the quick brown fox jumps over the lazy dog").toDF("text")
      .select(round(TextAnalysis.charEntropy(col("text")), 4))
      .as[Double].collect().toSeq
    assert(rows(0) == 0.0 && rows(1) == 1.0 && rows(2) == 2.0)
    assert(rows(3) == 0.0 && rows(4) == 0.0)
    assert(rows(5) > 3.0 && rows(5) < 5.0, s"prose entropy ${rows(5)}")
    // SQL registration parity
    val viaSql = spark.sql("SELECT round(char_entropy('abab'), 4)")
      .as[Double].head()
    assert(viaSql == 1.0)
  }

  test("markup strip and density: tags gone, plain text untouched, fraction bounded") {
    val d = Seq(
      "<html><body>hi <a href=\"x\">there</a> <b>friend</b></body></html>",
      "no markup at all",
      "<only><tags></tags></only>").toDF("text")
    val got = d.select(
      TextAnalysis.stripMarkup(col("text")),
      TextAnalysis.countPattern(col("text"), TextAnalysis.markupTagRe),
      TextAnalysis.countPattern(col("text"), TextAnalysis.anchorTagRe),
      round(TextAnalysis.markupCharFrac(col("text")), 6))
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got(0) == (("hi there friend", 8L, 1L, 0.765625))) // 49/64 markup
    assert(got(1) == (("no markup at all", 0L, 0L, 0.0)))
    assert(got(2)._1 == "" && got(2)._4 == 1.0, "all-markup doc strips to empty")
  }

  test("unique token sequence: order-preserving, idempotent, repetition-insensitive") {
    def sig(rows: Seq[String]) = rows.toDF("text")
      .withColumn("_toks", TextAnalysis.tokens(col("text")))
      .select(TextAnalysis.uniqueTokenSeq(col("_toks")))
      .as[String].collect().toSeq
    assert(sig(Seq("b a b c a a d")) == Seq("b a c d"),
      "first occurrence kept, order preserved")
    // a doc and its copy-paste-inflated variant share a signature
    assert(sig(Seq("the quick fox", "the quick fox the quick fox")).distinct.size == 1)
    // but word order still distinguishes (unlike a sorted bag)
    assert(sig(Seq("alpha beta", "beta alpha")).distinct.size == 2)
    // idempotent: applying to an already-unique sequence is identity
    assert(sig(Seq("x y z")) == Seq("x y z"))
  }

  test("source divergence: identical mixes ~0, disjoint mixes ~ln 2, symmetric bounds") {
    import org.apache.spark.sql.functions._
    // token mass must dominate the smoothing mass (alpha * vocabSize)
    // for the divergence to approach its analytic endpoints
    val docs = Seq(
      ("s1", Seq.fill(50)("alpha beta gamma delta alpha beta").mkString(" ")),
      ("s2", Seq.fill(50)("alpha beta gamma delta alpha beta").mkString(" ")),
      ("s3", Seq.fill(50)("omega sigma tau phi omega sigma").mkString(" ")))
      .toDF("source", "text")
    val m = TextAnalysis.sourceDivergenceMatrix(docs, "source", "text",
        vocabSize = 10, alpha = 0.5)
      .select("source_a", "source_b", "js_div")
      .as[(String, String, Double)].collect()
      .map { case (a, b, v) => (a, b) -> v }.toMap
    // identical word mixes: divergence ~0 (not exactly 0 — smoothing
    // over the shared vocab keeps both strictly positive)
    assert(m(("s1", "s2")) < 0.01, m.toString)
    // disjoint vocab: close to the ln 2 ceiling
    assert(m(("s1", "s3")) > 0.5 && m(("s1", "s3")) <= math.log(2.0) + 1e-9,
      m.toString)
    // JS is symmetric, so one ordered pair per combination is the
    // whole matrix: 3 sources -> 3 pairs, all in [0, ln 2]
    assert(m.size == 3 && m.values.forall(v => v >= 0 && v <= math.log(2.0) + 1e-9))
  }

  test("regexTokens: alnum runs plus single punctuation, blanks dropped") {
    import org.apache.spark.sql.functions.col
    val df = Seq("ab!cd e.f", "x=9; !!", "plain words here", " ")
      .toDF("t")
    val got = df.select(TextAnalysis.regexTokens(col("t")).as("r"))
      .as[Seq[String]].collect().toSeq
    assert(got(0) == Seq("ab", "!", "cd", "e", ".", "f"), got(0).toString)
    assert(got(1) == Seq("x", "=", "9", ";", "!", "!"), got(1).toString)
    assert(got(2) == Seq("plain", "words", "here"))
    assert(got(3).isEmpty, got(3).toString)
  }
}
