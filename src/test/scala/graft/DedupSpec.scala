package graft

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs: DataFrame =
    Tables(spark, "/root/testdata/sf0.001", "documents").select("doc_id", "text")

  private lazy val withNearDups: DataFrame = {
    val near = docs.filter(col("doc_id") < 10)
      .select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" graftdup")).as("text"))
    docs.unionByName(near)
  }

  test("exact keep-first removes planted exact copies only") {
    val exact = docs.filter(col("doc_id") < 10)
      .select((col("doc_id") + 2000000).as("doc_id"), col("text"))
    val all = docs.unionByName(exact)
    val kept = Dedup.exactKeepFirst(all, "text", "doc_id")
    assert(kept.count() == docs.count())
    assert(kept.filter(col("doc_id") >= 2000000).count() == 0)
  }

  /** Brute-force ground truth: all pairs with exact shingle-Jaccard ≥ t. */
  private def bruteForcePairs(df: DataFrame, threshold: Double): Set[(Long, Long)] = {
    val ids = df.select("doc_id").as[Long].collect().sorted
    val allPairs = (for (i <- ids; j <- ids if i < j) yield (i, j)).toSeq
      .toDF("a", "b")
    Dedup.jaccardForPairs(allPairs, df, "doc_id", "text")
      .filter(col("jaccard") >= threshold)
      .select("a", "b").as[(Long, Long)].collect().toSet
  }

  test("minhash LSH output equals brute-force jaccard>=0.5 ground truth " +
      "(incl. the corpus's own near-dups and the planted ones)") {
    val got = Dedup.minhashNearDupPairs(withNearDups, "doc_id", "text",
        numHashes = 128, bands = 32, threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val expected = bruteForcePairs(withNearDups, 0.5)
    val planted = (0L until 10L).map(i => (i, i + 1000000)).toSet
    assert(planted.subsetOf(expected), "sanity: planted pairs are true near-dups")
    assert(got == expected)
  }

  test("minhash jaccard estimates are close to exact jaccard") {
    val got = Dedup.minhashNearDupPairs(withNearDups, "doc_id", "text")
      .select("a", "jaccard").as[(Long, Double)].collect().toMap
    assert(got.values.forall(j => j > 0.8 && j <= 1.0))
  }

  test("simhash block join finds exactly the hamming<=3 ground truth") {
    val pairs = Dedup.simhashNearDupPairs(withNearDups, "doc_id", "text", maxHamming = 3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // ground truth from the signatures themselves (pigeonhole join must
    // be lossless within the bound)
    val sigs = withNearDups
      .select(col("doc_id"), Dedup.simhash64(col("text")).as("s"))
      .as[(Long, Long)].collect()
    val expected = (for {
      (a, sa) <- sigs; (b, sb) <- sigs
      if a < b && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (a, b)).toSet
    assert(pairs == expected)
    assert(pairs.nonEmpty, "short word-salad docs: at least some planted pairs land within hamming 3")
  }

  test("simhash of identical text is identical; near-dup is close") {
    val d = Seq((1L, "spark table scan join"), (2L, "spark table scan join"),
      (3L, "spark table scan join extra")).toDF("doc_id", "text")
    val sigs = d.select(col("doc_id"), Dedup.simhash64(col("text")).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) <= 16)
  }

  test("shingles: set semantics, short docs fall back to whole text") {
    val d = Seq((1L, "a b c d"), (2L, "a b")).toDF("doc_id", "text")
    val sh = d.select(col("doc_id"),
      TextAnalysis.wordShingles(col("text"), 3).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(sh(1L) == Seq("a b c", "b c d"))
    assert(sh(2L) == Seq("a b"))
  }

  test("jaccard for explicit pairs") {
    val pairs = Seq((0L, 1000000L)).toDF("a", "b")
    val j = Dedup.jaccardForPairs(pairs, withNearDups, "doc_id", "text")
      .select("jaccard").head().getDouble(0)
    assert(j > 0.8 && j < 1.0)
  }

  test("keep-best dedup keeps the highest-scored copy of each text") {
    val df = Seq(
      (1L, "same text", 5L), (2L, "same text", 9L), (3L, "same text", 9L),
      (4L, "other", 1L)).toDF("id", "text", "score")
    val kept = Dedup.exactKeepBest(df, "text", col("score").desc, "id")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L)) // score 9 wins; id 2 beats id 3 on tiebreak
  }

  test("contamination finds only train docs sharing a 5-gram with eval") {
    val eval = Seq((100L, "one two three four five six")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "zz one two three four five yy"), // shares 'one two three four five'
      (2L, "one three five two four six")    // same words, no shared 5-gram
    ).toDF("doc_id", "text")
    val got = Dedup.contaminated(train, eval, "doc_id", "text", shingleK = 5)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L))
  }

  test("connected components: chains merge transitively, singletons survive") {
    // 1-2-3 chained (no direct 1-3 edge), 4-5 pair, 6 isolated
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("a", "b")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("node")
    val comp = Dedup.connectedComponents(edges, nodes)
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L))
  }

  test("connected components: empty edges, self-loops, duplicate edges") {
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    // no edges → all singletons
    val none = Dedup.connectedComponents(
      spark.emptyDataset[(Long, Long)].toDF("a", "b"), nodes)
      .as[(Long, Long)].collect().toMap
    assert(none == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
    // self-loop and duplicate edges are harmless
    val edges = Seq((2L, 2L), (2L, 3L), (2L, 3L), (3L, 2L)).toDF("a", "b")
    val comp = Dedup.connectedComponents(edges, nodes)
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 2L, 3L -> 2L))
  }

  test("connected components: long path needs multiple propagation rounds") {
    val n = 12
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
    val nodes = (1 to n).map(_.toLong).toDF("node")
    val comp = Dedup.connectedComponents(edges, nodes)
      .as[(Long, Long)].collect().toMap
    assert(comp.values.toSet == Set(1L))
    assert(comp.size == n)
  }

  test("star CC: chains merge transitively, singletons survive") {
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("a", "b")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("node")
    val comp = Dedup.connectedComponentsStar(edges, nodes)
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L))
  }

  test("star CC: empty edges, self-loops, duplicate and reversed edges") {
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    val none = Dedup.connectedComponentsStar(
      spark.emptyDataset[(Long, Long)].toDF("a", "b"), nodes)
      .as[(Long, Long)].collect().toMap
    assert(none == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
    val edges = Seq((2L, 2L), (2L, 3L), (2L, 3L), (3L, 2L)).toDF("a", "b")
    val comp = Dedup.connectedComponentsStar(edges, nodes)
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 2L, 3L -> 2L))
  }

  test("star CC: 200-node path converges in O(log n) rounds, not O(diameter)") {
    // min-label propagation would need ~200 rounds here; the star
    // alternation must finish within 12 (each double-round roughly
    // halves the remaining tree height)
    val n = 200
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
    val nodes = (1 to n).map(_.toLong).toDF("node")
    val comp = Dedup.connectedComponentsStar(edges, nodes, maxIters = 12)
      .as[(Long, Long)].collect().toMap
    assert(comp.values.toSet == Set(1L))
    assert(comp.size == n)
  }

  test("line dedup keeps each distinct line at its first occurrence only") {
    val docs = Seq(
      (1L, "a\nb\nshared"),
      (2L, "shared\nc"),
      (3L, "b\nd"),
      (4L, "x\nx")). // within-doc duplicate: second copy goes too
      toDF("doc_id", "text")
    val got = Dedup.lineDedup(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, "a\nb\nshared"), // first doc keeps everything
      (2L, 1L, "c"),            // 'shared' already seen in doc 1
      (3L, 1L, "d"),            // 'b' already seen in doc 1
      (4L, 1L, "x")))
  }

  test("line dedup drops docs made entirely of seen lines, keeps blank-line identity") {
    val docs = Seq(
      (1L, "only\n\nlines"), // contains an empty line
      (2L, "only\nlines"),   // fully covered by doc 1 → absent from output
      (3L, "\nfresh")).      // its empty line is doc 1's; 'fresh' survives
      toDF("doc_id", "text")
    val got = Dedup.lineDedup(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 3L, "only\n\nlines"), (3L, 1L, "fresh")))
  }

  test("boilerplate strip removes frequent lines everywhere, keeps rare ones") {
    val docs = Seq(
      (1L, "h1\nfooter\npair"),
      (2L, "h2\nfooter\npair"), // 'pair' in 2 docs only → below minDocs=3
      (3L, "h3\nfooter"),
      (4L, "footer")).          // all-boilerplate doc → absent from output
      toDF("doc_id", "text")
    val got = Dedup.stripBoilerplateLines(docs, "doc_id", "text", minDocs = 3)
      .orderBy("doc_id")
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, "h1\npair"), // unlike lineDedup, doc 1's 'footer' goes too
      (2L, 2L, "h2\npair"),
      (3L, 1L, "h3")))
    // within-doc repetition counts once: 3 copies in one doc ≠ 3 docs
    val rep = Seq((1L, "spam\nspam\nspam"), (2L, "other")).toDF("doc_id", "text")
    val keptRep = Dedup.stripBoilerplateLines(rep, "doc_id", "text", minDocs = 3)
      .orderBy("doc_id").as[(Long, Long, String)].collect().toSeq
    assert(keptRep == Seq((1L, 3L, "spam\nspam\nspam"), (2L, 1L, "other")))
    intercept[IllegalArgumentException] {
      Dedup.stripBoilerplateLines(docs, "doc_id", "text", minDocs = 1)
    }
  }

  test("star CC agrees with min-label CC on a pseudo-random graph") {
    // deterministic pseudo-random edges over 60 nodes (LCG, fixed seed)
    var s = 12345L
    def next(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L); math.abs(s) }
    val nodes = (0L until 60L).toDF("node")
    val edges = (1 to 45).map { _ => (next() % 60, next() % 60) }.toDF("a", "b")
    val star = Dedup.connectedComponentsStar(edges, nodes)
      .as[(Long, Long)].collect().toMap
    val label = Dedup.connectedComponents(edges, nodes)
      .as[(Long, Long)].collect().toMap
    assert(star == label)
  }

  test("semDedup groups planted semantic dups, keeps min-id survivors") {
    // two well-separated semantic clusters in 8-d; ids 0/1/2 are
    // near-copies of each other (cluster A), 10/11 near-copies
    // (cluster B), 20 a lone far-out doc
    def v(base: Array[Double], eps: Double): Seq[Double] =
      base.zipWithIndex.map { case (x, i) => x + eps * (if (i % 2 == 0) 1 else -1) * 0.01 }
    val a = Array(1.0, 0, 0, 0, 1.0, 0, 0, 0)
    val b = Array(0, 1.0, 0, 0, 0, 1.0, 0, 0)
    val c = Array(0, 0, 1.0, -1.0, 0, 0, 1.0, 0)
    val rows = Seq(
      0L -> v(a, 0), 1L -> v(a, 1), 2L -> v(a, 2),
      10L -> v(b, 0), 11L -> v(b, 3),
      20L -> v(c, 0))
    val df = rows.toDF("vec_id", "embedding")
    val got = Dedup.semDedup(df, "vec_id", "embedding",
      threshold = 0.95, nlist = 2)
      .as[(Long, Int, Long, Boolean)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    assert(got(0L) == ((0L, true)))
    assert(got(1L) == ((0L, false)) && got(2L) == ((0L, false)))
    assert(got(10L) == ((10L, true)) && got(11L) == ((10L, false)))
    assert(got(20L) == ((20L, true))) // singleton keeps itself
    // near-copies share their original's k-means cell (the property
    // that makes the within-cell restriction lose nothing here)
    val cells = Dedup.semDedup(df, "vec_id", "embedding",
      threshold = 0.95, nlist = 2)
      .as[(Long, Int, Long, Boolean)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(cells(0L) == cells(1L) && cells(1L) == cells(2L))
    assert(cells(10L) == cells(11L))
  }

  test("substring spans: corpus-first occurrence kept, overlaps merged per doc") {
    val docs = Seq(
      (1L, "a b c d e f g h"),      // the original — every window kept
      (2L, "x x a b c d e f y z"),  // embeds doc 1's tokens 0..5
      (3L, "a b c d e f g h"),      // full copy — removed end to end
      (4L, "p q r")                 // shorter than k: no windows at all
    ).toDF("doc_id", "text")
    val spans = Dedup.substringSpans(docs, "doc_id", "text", k = 5)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long)].collect().toSeq
    // doc 2: dup windows at pos 2 ("a b c d e") and 3 ("b c d e f")
    // overlap → one span [2, 8); doc 3: all 4 windows dup → [0, 8)
    assert(spans == Seq((2L, 2L, 8L), (3L, 0L, 8L)))
  }

  test("substring spans: non-overlapping dup regions stay separate spans") {
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "f g h i j"),
      (3L, "a b c d e m n o p q r f g h i j")  // two disjoint dup regions
    ).toDF("doc_id", "text")
    val spans = Dedup.substringSpans(docs, "doc_id", "text", k = 5)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long)].collect().toSeq
    assert(spans == Seq((3L, 0L, 5L), (3L, 11L, 16L)))
  }

  test("cross-corpus near-dup handles an empty side without crashing") {
    val docs = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.minhashCrossNearDupPairs(empty, docs, "doc_id", "text").count() == 0)
    assert(Dedup.minhashCrossNearDupPairs(docs, empty, "doc_id", "text").count() == 0)
    // non-empty sides still pair up
    val twin = Seq((2L, "a b c d e f g h zz")).toDF("doc_id", "text")
    assert(Dedup.minhashCrossNearDupPairs(twin, docs, "doc_id", "text")
      .count() == 1)
  }

  test("applySubstringDedup cuts exactly the reported spans from each doc") {
    val docs = Seq(
      (1L, "a b c d e f g h"),      // the original — untouched
      (2L, "x x a b c d e f y z"),  // span [2, 8) cut → "x x y z"
      (3L, "a b c d e f g h"),      // full copy — everything cut
      (4L, "p q r")                 // shorter than k: untouched
    ).toDF("doc_id", "text")
    val got = Dedup.applySubstringDedup(docs, "doc_id", "text", k = 5)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    def m(s: String) = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    assert(got == Seq(
      (1L, 8L, 8L, m("a b c d e f g h")),
      (2L, 10L, 4L, m("x x y z")),
      (3L, 8L, 0L, m("")),
      (4L, 3L, 3L, m("p q r"))), got.toString)
  }

  test("incremental dedup drops history dups and in-batch copies, keeps first") {
    val history = Seq((1L, "alpha beta"), (2L, "gamma")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta"),  // already in history → dropped
      (11L, "delta"),       // genuinely new → kept
      (12L, "delta"),       // in-batch copy of 11 → dropped (keep-first)
      (13L, "Gamma  ")      // history dup modulo normalization → dropped
    ).toDF("doc_id", "text")
    val kept = Dedup.incrementalDedup(batch, history, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(11L))
  }

  test("lshBandPlan meets the miss bound with the widest band that fits") {
    def missAt(s: Double, numHashes: Int, bands: Int): Double =
      math.pow(1.0 - math.pow(s, numHashes / bands), bands)
    for ((thr, miss, budget) <- Seq(
        (0.9, 5e-10, 2048), (0.8, 1e-6, 512), (0.5, 1e-3, 256))) {
      val (n, b) = Dedup.lshBandPlan(thr, miss, budget)
      val r = n / b
      assert(n % b == 0 && n <= budget, s"plan ($n, $b) within budget $budget")
      assert(missAt(thr, n, b) <= miss,
        s"miss ${missAt(thr, n, b)} exceeds $miss for plan ($n, $b)")
      // maximality: one row wider can't meet the bound inside the budget
      val pWider = math.pow(thr, r + 1)
      val bWider = math.ceil(math.log(miss) / math.log1p(-pWider))
      assert(bWider * (r + 1) > budget,
        s"width ${r + 1} would also fit — plan not maximal")
    }
    // an impossible budget fails fast instead of returning a bad plan
    intercept[IllegalArgumentException] {
      Dedup.lshBandPlan(0.99, 1e-12, maxHashes = 2)
    }
  }

  test("containment finds a snippet inside a long doc that Jaccard misses") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog while rain " +
        "falls softly on distant silver hills and rivers keep moving " +
        "toward an old gray sea past quiet villages"),
      (2L, "the quick brown fox jumps over the lazy dog"), // ⊂ doc 1
      (3L, "completely unrelated text about database engines and " +
        "vectorized execution pipelines")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(corpus, "doc_id", "text",
        shingleK = 3, threshold = 0.9)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)), s"snippet must surface: $got")
    // the same pair is invisible to symmetric Jaccard at any useful
    // threshold — that asymmetry is the operator's reason to exist
    val jac = Dedup.jaccardForPairs(Seq((1L, 2L)).toDF("a", "b"),
        corpus, "doc_id", "text")
      .select("jaccard").as[Double].head()
    assert(jac < 0.5, s"jaccard should miss the inclusion: $jac")
  }

  test("containment doc-frequency cap excludes boilerplate shingles as evidence") {
    // two docs sharing ONLY a boilerplate sentence that appears in
    // every doc: with the cap below the corpus size, that shared
    // content stops counting and the pair drops below threshold
    val boiler = "all rights reserved by the example corporation"
    val corpus = (1L to 6L).map(i =>
      (i, s"$boiler unique words number $i ${"x" * i.toInt}"))
      .toDF("doc_id", "text")
    val capped = Dedup.containmentPairs(corpus, "doc_id", "text",
      shingleK = 3, threshold = 0.9, maxShingleDocFreq = 3)
    assert(capped.count() == 0, "boilerplate-only overlap must not pair")
  }

  test("sourceOverlapMatrix fans a 3-source doc into all 3 ordered pairs") {
    val df = Seq(
      ("shared doc", "a"), ("shared doc", "b"), ("Shared  doc", "c"), // norm dup
      ("only a", "a"), ("only a twice", "a"),                         // a-only
      ("ab doc", "a"), ("ab doc", "b"))                               // a∩b
      .toDF("text", "source")
    val got = Dedup.sourceOverlapMatrix(df, "text", "source")
      .orderBy("source_a", "source_b")
      .as[(String, String, Long, Double, Double)].collect().toSeq
    // distinct counts: a=4, b=2, c=1
    assert(got == Seq(
      ("a", "b", 2L, 0.5, 1.0),       // shared + ab
      ("a", "c", 1L, 0.25, 1.0),
      ("b", "c", 1L, 0.5, 1.0)), got.toString)
  }

  test("templateSkeletons groups distinct fillings of one form") {
    val df = Seq(
      (1L, "[log] id=1; ok"), (2L, "[log] id=22; ok"),     // one template
      (3L, "[log] id=333; ok"),
      (4L, "totally different text"), (5L, "another unrelated doc here"),
      (6L, "x=9!"), (7L, "y=77!"))                         // second template
      .toDF("doc_id", "text")
    val got = Dedup.templateSkeletons(df, "doc_id", "text")
      .as[(String, Long, Long, Long)].collect().toSeq
    // two groups survive minDocs=2: the log template (3 distinct
    // texts) first, then the assignment template (2); docs 4/5 differ
    // in word count so their plain-prose skeletons stay singletons
    assert(got.map(r => (r._2, r._3, r._4)) == Seq((3L, 3L, 1L), (2L, 2L, 6L)),
      got.toString)
    // singleton shapes never report
    assert(!got.exists(_._4 == 4L))
    intercept[IllegalArgumentException] {
      Dedup.templateSkeletons(df, "doc_id", "text", minDocs = 1)
    }
  }

  test("source sketch: identical sources estimate Jaccard 1, disjoint 0") {
    val a = docs.limit(40).select(col("doc_id"), col("text"), lit("a").as("src"))
    val twin = a.select(col("doc_id"), col("text"), lit("b").as("src"))
    val other = docs.filter(col("doc_id") >= 40).limit(40)
      .select(col("doc_id"), col("text"), lit("c").as("src"))
    val got = Dedup.sourceSketchJaccard(
        a.unionByName(twin).unionByName(other), "text", "src")
      .as[(String, String, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got(("a", "b")) == ((1.0, 1.0)), got.toString)
    // disjoint content: exact 0; the 32-bit md5 slots make an
    // accidental sketch agreement vanishingly unlikely
    assert(got(("a", "c"))._2 == 0.0 && got(("a", "c"))._1 <= 0.02, got.toString)
    assert(got.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")),
      "disjoint pairs must still appear")
  }

  test("source sketch estimates track exact Jaccard within sampling error") {
    // Planted overlap ladder: source s_i shares its first 40−8i docs
    // with s_0. σ of a 128-slot estimate is √(J(1−J)/128) ≤ 0.045, so
    // |est − exact| ≤ 0.15 is a >3σ bound for every pair.
    val base = docs.limit(40).cache()
    val srcs = (0 to 3).map { i =>
      base.limit(40 - 8 * i)
        .select(col("doc_id"), col("text"), lit(s"s$i").as("src"))
    }.reduce(_ unionByName _)
    val rows = Dedup.sourceSketchJaccard(srcs, "text", "src")
      .as[(String, String, Double, Double, Double)].collect()
    assert(rows.length == 6)
    rows.foreach { case (a, b, est, exact, err) =>
      assert(err <= 0.15, s"($a,$b): est=$est exact=$exact err=$err")
      assert(math.abs(err - math.abs(est - exact)) < 1e-6)
    }
    // nested prefixes: exact Jaccard of (s0, s_i) is (40−8i)/40
    val exactMap = rows.map(r => (r._1, r._2) -> r._4).toMap
    assert(exactMap(("s0", "s1")) == 0.8 && exactMap(("s0", "s3")) == 0.4)
    base.unpersist()
  }

  test("source sketches merge by elementwise min") {
    // The 100 TB contract: sketch(A ∪ B) == slotwise min of the two
    // sketches — so per-shard sketches union without content.
    val a = docs.limit(30).select(col("text"), lit("a").as("src"))
    val b = docs.filter(col("doc_id") >= 30).limit(30)
      .select(col("text"), lit("b").as("src"))
    val merged = Dedup.sourceMinHashSketch(
        a.unionByName(b).withColumn("src", lit("ab")), "text", "src")
      .select("t", "mh").as[(Int, Long)].collect().toMap
    val parts = Dedup.sourceMinHashSketch(a.unionByName(b), "text", "src")
      .groupBy("t").agg(min("mh").as("mh"))
      .select("t", "mh").as[(Int, Long)].collect().toMap
    assert(merged == parts, "union sketch must equal slotwise min of parts")
    assert(merged.size == 128)
  }
}
