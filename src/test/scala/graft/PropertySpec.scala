package graft

import graft.config.{Enums, PlaybackConfig}
import Enums._
import graft.sources.CsvPlayback
import graft.timefmt.Strftime
import org.scalacheck.Gen

import java.nio.file.Files

/** Property-based invariants (SURVEY.md §5 item 3), driven by raw
  * ScalaCheck generators with a fixed seed (deterministic, and Spark
  * jobs are slow so each property runs 8 generated cases, not 100). */
class PropertySpec extends SparkSpec {

  private def forAll[T](gen: Gen[T], n: Int = 8)(f: T => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(42L)
    var done = 0
    var attempts = 0
    while (done < n && attempts < n * 20) {
      gen.apply(Gen.Parameters.default.withSize(20), seed).foreach { v => f(v); done += 1 }
      seed = seed.next
      attempts += 1
    }
    assert(done == n, s"generator too sparse: $done/$n cases")
  }

  private val cell: Gen[String] = Gen.oneOf(
    Gen.choose(-1000, 1000).map(_.toString),
    Gen.choose(0.0, 1.0).map(d => f"$d%.4f"),
    Gen.alphaStr.map(_.take(6)))

  private def writeTemp(content: String): String = {
    val p = Files.createTempFile("prop", ".csv")
    Files.writeString(p, content)
    p.toString
  }

  test("fixed CSV: row count preserved, header names preserved") {
    val table = for {
      nCols <- Gen.choose(1, 5)
      names <- Gen.listOfN(nCols, Gen.identifier.map(_.take(8))).map(_.distinct)
      if names.nonEmpty
      nRows <- Gen.choose(1, 12)
      rows <- Gen.listOfN(nRows, Gen.listOfN(names.length, cell))
    } yield (names, rows)
    forAll(table) { case (names, rows) =>
      val csv = (names.mkString(",") +: rows.map(_.mkString(","))).mkString("\n") + "\n"
      val df = CsvPlayback.readFile(spark, PlaybackConfig(), writeTemp(csv))
      assert(df.count() == rows.length)
      assert(df.columns.filterNot(_ == "_row_idx").toSeq == names)
    }
  }

  test("ragged CSV: pivot never emits empty values; datapoint count = non-empty fields") {
    val table = for {
      nRows <- Gen.choose(1, 10)
      rows <- Gen.listOfN(nRows, Gen.choose(1, 6).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf(cell, Gen.const("")))))
      if rows.forall(_.exists(_.nonEmpty)) // pandas drops fully-empty rows anyway
    } yield rows
    forAll(table) { rows =>
      val csv = rows.map(_.mkString(",")).mkString("\n") + "\n"
      val cfg = PlaybackConfig(variableCols = true)
      val df = CsvPlayback.readFile(spark, cfg, writeTemp(csv))
      val got = df.collect()
      assert(got.forall(_.getString(2).nonEmpty), "no empty datapoint values")
      val expected = rows.map(_.count(_.nonEmpty)).sum
      assert(got.length == expected)
      // datapoint names carry the original position
      assert(got.forall(_.getString(1).startsWith("column_")))
    }
  }

  test("useColumns rename+select equals rename-then-project by hand") {
    val table = for {
      nCols <- Gen.choose(2, 5)
      nRows <- Gen.choose(1, 8)
      rows <- Gen.listOfN(nRows, Gen.listOfN(nCols, Gen.choose(0, 99)))
      dropIdx <- Gen.choose(0, nCols - 1)
    } yield (nCols, rows, dropIdx)
    forAll(table) { case (nCols, rows, dropIdx) =>
      val header = (0 until nCols).map(i => s"orig$i").mkString(",")
      val csv = (header +: rows.map(_.mkString(","))).mkString("\n") + "\n"
      val names = (0 until nCols).map(i => if (i == dropIdx) "" else s"c$i")
      val cfg = PlaybackConfig(columnMethod = ColumnMethod.Explicit,
        useColumns = names.mkString(","))
      val df = CsvPlayback.readFile(spark, cfg, writeTemp(csv))
      val expectCols = names.filter(_.nonEmpty)
      assert(df.columns.filterNot(_ == "_row_idx").toSeq == expectCols)
      // values survive the positional relabel
      val firstKept = (0 until nCols).filter(_ != dropIdx).head
      val got = df.orderBy("_row_idx").select(expectCols.head).collect().map(_.get(0).toString)
      assert(got.toSeq == rows.map(_(firstKept).toString))
    }
  }

  test("strftime translation round-trips random timestamps") {
    val instants = Gen.choose(0L, 4102444800L) // 1970..2100
    forAll(instants) { epochSec =>
      val micro = (epochSec % 1000000L).max(0)
      val odt = java.time.Instant.ofEpochSecond(epochSec, micro * 1000)
        .atOffset(java.time.ZoneOffset.UTC)
      val fmt = Strftime.toJava("%Y-%m-%d %H:%M:%S.%f%z")
      val s = odt.format(java.time.format.DateTimeFormatter.ofPattern(fmt))
      val back = java.time.OffsetDateTime.parse(s,
        java.time.format.DateTimeFormatter.ofPattern(fmt))
      assert(back.toInstant == odt.toInstant)
    }
  }

  test("NaN violation count = hand count of null/whitespace cells") {
    val dirtyCell = Gen.frequency(4 -> cell, 1 -> Gen.const(""), 1 -> Gen.const(" "))
    val table = for {
      nRows <- Gen.choose(1, 8)
      rows <- Gen.listOfN(nRows, Gen.listOfN(3, dirtyCell))
    } yield rows
    forAll(table) { rows =>
      val csv = ("a,b,c" +: rows.map(_.mkString(","))).mkString("\n") + "\n"
      val df = CsvPlayback.readFile(spark, PlaybackConfig(), writeTemp(csv))
      val v = graft.sources.NaNReport.violations(df)
      val expected = (0 until 3).map(i => rows.count(r => r(i).isEmpty || r(i).trim.isEmpty))
      assert(Seq(v("a"), v("b"), v("c")) == expected)
    }
  }

  // ------------------------- custom text kernels vs builtin reference

  private val tokenGen: Gen[List[String]] = Gen.choose(0, 12).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf(
      Gen.oneOf("a", "b", "ab", "x1"),          // collisions likely
      Gen.alphaStr.map(s => if (s.isEmpty) "z" else s.take(5)),
      Gen.const("héllo"), Gen.const("日本"))))   // non-ASCII

  test("NGrams == scala sliding-window reference on random token lists") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    forAll(Gen.zip(tokenGen, Gen.choose(1, 4))) { case (toks, k) =>
      val text = toks.mkString(" ")
      val df = Seq(text).toDF("text")
      val got = df.select(
        graft.operators.TextAnalysis.wordShinglesAll(col("text"), k))
        .as[Seq[String]].head()
      // tokens("") splits to [""] — mirror that in the reference
      val refToks = text.trim.split("\\s+").toSeq
      val want = if (refToks.length < k) Seq(refToks.mkString(" "))
        else refToks.sliding(k).map(_.mkString(" ")).toSeq
      assert(got == want, s"k=$k toks=$toks")
    }
  }

  test("NGramHashPairs: pair equality == window text equality on tiny vocab") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // tiny vocab forces window repeats, so both sides of the iff fire;
    // lengths below k exercise the one-window short-input rule
    val smallTokGen = Gen.choose(1, 24)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b"))).map(_.toSeq)
    forAll(Gen.zip(smallTokGen, Gen.choose(1, 4))) { case (toks, k) =>
      val df = Seq(toks).toDF("toks")
      val pairs = df.select(
          graft.functions.HashExpressions.ngram_hash_pairs(col("toks"), k))
        .as[Seq[(Long, Long)]].head()
      val windows =
        if (toks.length < k) Seq(toks.mkString(" "))
        else toks.sliding(k).map(_.mkString(" ")).toSeq
      assert(pairs.length == windows.length, s"k=$k toks=$toks")
      for (i <- windows.indices; j <- windows.indices)
        assert((pairs(i) == pairs(j)) == (windows(i) == windows(j)),
          s"k=$k i=$i j=$j: hash-pair equality must track window equality")
    }
    // empty array: no windows at all (documented divergence from NGrams)
    val empty = Seq(Seq.empty[String]).toDF("toks")
      .select(graft.functions.HashExpressions.ngram_hash_pairs(col("toks"), 3))
      .as[Seq[(Long, Long)]].head()
    assert(empty.isEmpty)
  }

  test("IntersectSize == size(array_intersect) on random string arrays") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    forAll(Gen.zip(tokenGen, tokenGen)) { case (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val fast = df.select(graft.functions.HashExpressions
        .intersect_size(col("a"), col("b"))).as[Int].head()
      assert(fast == (a.toSet & b.toSet).size, s"a=$a b=$b")
    }
  }

  test("VecL2 kernel == HOF reference and scala reference on random vectors") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val vec = Gen.listOfN(16, Gen.choose(-10.0, 10.0))
    forAll(Gen.zip(vec, vec)) { case (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val (fast, hof) = df.select(
        graft.functions.Vec.l2(col("a"), col("b")),
        graft.functions.Vec.l2Hof(col("a"), col("b")))
        .as[(Double, Double)].head()
      val ref = math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
      assert(fast == hof, s"kernel vs HOF: $fast vs $hof")
      assert(math.abs(fast - ref) < 1e-9, s"kernel vs scala: $fast vs $ref")
    }
  }

  test("charEntropy ∈ [0, log2(distinct chars)] and is permutation-invariant") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    forAll(Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)) { s =>
      val shuffled = new String(s.toArray.sortBy(c => (c.hashCode * 31) ^ 7))
      val df = Seq((s, shuffled)).toDF("a", "b")
      val (ha, hb) = df.select(
        graft.operators.TextAnalysis.charEntropy(col("a")),
        graft.operators.TextAnalysis.charEntropy(col("b")))
        .as[(Double, Double)].head()
      val bound = math.log(s.distinct.length.toDouble) / math.log(2.0)
      assert(ha >= 0.0 && ha <= bound + 1e-9, s"H=$ha bound=$bound s=$s")
      assert(math.abs(ha - hb) < 1e-9, "entropy ignores character order")
    }
  }

  test("globalIds is a bijection onto [0, N) on random corpus subsets") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    forAll(Gen.choose(1, 200), n = 4) { limit =>
      val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id").filter(col("doc_id") < limit)
      val n = docs.count()
      val gids = graft.operators.Sampling.globalIds(docs, col("doc_id"), nShards = 8)
        .select("gid").as[Long].collect().sorted.toSeq
      assert(gids == (0L until n), s"limit=$limit")
    }
  }

  test("TopGramStats == max-multiplicity/total on random arrays") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    forAll(tokenGen) { toks =>
      val df = Seq(toks).toDF("g")
      val got = df.select(graft.functions.HashExpressions.gram_stats(col("g")).as("gs"))
        .select(col("gs.top"), col("gs.tot")).as[(Int, Int)].head()
      val want = (
        if (toks.isEmpty) 0 else toks.groupBy(identity).values.map(_.size).max,
        toks.size)
      assert(got == want, s"toks=$toks")
    }
  }

  /** In-memory reference for [[graft.operators.Dedup.substringSpans]]:
    * enumerate windows, drop all but the corpus-first occurrence of
    * each duplicated window, merge overlapping/adjacent removals. */
  private def refSpans(docs: Seq[(Long, String)], k: Int): Seq[(Long, Long, Long)] = {
    val wins = for {
      (id, text) <- docs
      toks = text.trim.split("\\s+").toSeq
      if toks.size >= k
      i <- 0 to toks.size - k
    } yield (toks.slice(i, i + k).mkString(" "), id, i)
    val removal = wins.groupBy(_._1).values.filter(_.size > 1).toSeq
      .flatMap(_.sortBy(o => (o._2, o._3)).tail.map(o => (o._2, o._3, o._3 + k)))
    removal.groupBy(_._1).toSeq.flatMap { case (id, spans) =>
      val merged = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      spans.map(s => (s._2, s._3)).sortBy(_._1).foreach { case (a, b) =>
        if (merged.nonEmpty && merged.last._2 >= a)
          merged(merged.size - 1) = (merged.last._1, math.max(merged.last._2, b))
        else merged += ((a, b))
      }
      merged.map { case (a, b) => (id, a.toLong, b.toLong) }
    }.sortBy(s => (s._1, s._2))
  }

  test("substringSpans == in-memory reference on random tiny-vocab corpora") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val corpusGen = for {
      nDocs <- Gen.choose(2, 6)
      docs <- Gen.listOfN(nDocs,
        Gen.choose(1, 14).flatMap(len =>
          Gen.listOfN(len, Gen.oneOf("a", "b", "c")).map(_.mkString(" "))))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    forAll(corpusGen, n = 6) { docs =>
      val got = graft.operators.Dedup
        .substringSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k = 3)
        .orderBy("doc_id", "span_start")
        .as[(Long, Long, Long)].collect().toSeq
      val want = refSpans(docs, 3)
      assert(got == want, s"docs=$docs")
      // structural invariants: spans sorted, disjoint, within bounds
      got.groupBy(_._1).foreach { case (id, spans) =>
        val nToks = docs.find(_._1 == id).get._2.trim.split("\\s+").length
        spans.foreach { case (_, s, e) => assert(s >= 0 && s < e && e <= nToks) }
        spans.map(s => (s._2, s._3)).sliding(2).foreach {
          case Seq((_, e1), (s2, _)) => assert(s2 > e1, "merged spans stay disjoint")
          case _ => ()
        }
      }
    }
  }

  test("normalize_utf8 is idempotent on arbitrary unicode strings") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val gen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', '\t', '\n', 'É', 'é',
        '́', 'ﬁ', 'Ａ', ' ', '　'))).map(_.mkString)
    forAll(gen, n = 8) { s =>
      val df = Seq(s, s).toDF("t")
        .select(graft.functions.HashExpressions.normalize_utf8(col("t")).as("n1"))
        .select(col("n1"),
          graft.functions.HashExpressions.normalize_utf8(col("n1")).as("n2"))
      val (n1, n2) = df.as[(String, String)].head()
      assert(n1 == n2, s"input=${s.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("stripBoilerplateLines == in-memory reference on random line corpora") {
    import org.apache.spark.sql.functions.col
    val corpus = for {
      nDocs <- Gen.choose(2, 8)
      docs <- Gen.listOfN(nDocs, Gen.choose(1, 5).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))))
      minDocs <- Gen.choose(2, 4)
    } yield (docs, minDocs)
    forAll(corpus) { case (docs, minDocs) =>
      val df = spark.createDataFrame(
        docs.zipWithIndex.map { case (ls, i) => (i.toLong, ls.mkString("\n")) })
        .toDF("doc_id", "text")
      val got = graft.operators.Dedup
        .stripBoilerplateLines(df, "doc_id", "text", minDocs)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
        .toMap
      // reference: a line is boilerplate iff it occurs in >= minDocs
      // distinct docs; survivors keep original order; empty docs vanish
      val lineDocs = docs.zipWithIndex
        .flatMap { case (ls, i) => ls.distinct.map(_ -> i) }
        .groupBy(_._1).view.mapValues(_.size).toMap
      val want = docs.zipWithIndex.flatMap { case (ls, i) =>
        val kept = ls.filter(l => lineDocs(l) < minDocs)
        if (kept.isEmpty) None
        else Some(i.toLong -> ((kept.length.toLong, kept.mkString("\n"))))
      }.toMap
      assert(got == want, s"docs=$docs minDocs=$minDocs")
    }
  }

  test("lshBandPlan: plan meets the miss bound and is maximal, over random knobs") {
    // Pure planner math — no Spark job per case, so run a wide sweep.
    def missAt(s: Double, r: Int, b: Int): Double =
      math.pow(1.0 - math.pow(s, r), b)
    val knobs = for {
      thr <- Gen.choose(0.05, 0.95)
      missExp <- Gen.choose(1.0, 12.0) // missProb ∈ [1e-12, 1e-1]
      budget <- Gen.oneOf(64, 128, 256, 512, 1024, 2048)
    } yield (thr, math.pow(10, -missExp), budget)
    forAll(knobs, n = 200) { case (thr, miss, budget) =>
      // Feasibility mirrors the planner's r=1 floor: if even single-row
      // bands can't meet the bound within the budget, it must throw.
      val bFloor = math.ceil(math.log(miss) / math.log1p(-thr))
      if (bFloor > budget) {
        intercept[IllegalArgumentException] {
          graft.operators.Dedup.lshBandPlan(thr, miss, budget)
        }
      } else {
        val (nh, b) = graft.operators.Dedup.lshBandPlan(thr, miss, budget)
        val r = nh / b
        assert(nh % b == 0 && nh <= budget && b >= 1 && r >= 1,
          s"malformed plan ($nh, $b) for thr=$thr miss=$miss budget=$budget")
        assert(missAt(thr, r, b) <= miss,
          s"plan ($nh, $b) misses at ${missAt(thr, r, b)} > $miss (thr=$thr)")
        // Maximality: one row wider cannot meet the bound within budget.
        val pWider = math.pow(thr, r + 1)
        val bWider = math.ceil(math.log(miss) / math.log1p(-pWider))
        assert(!(bWider >= 1.0 && bWider * (r + 1) <= budget),
          s"width ${r + 1} also fits budget $budget — plan ($nh, $b) not maximal (thr=$thr miss=$miss)")
      }
    }
  }

  test("sourceOverlapMatrix == in-memory reference on random corpora") {
    val corpus = for {
      n <- Gen.choose(3, 12)
      rows <- Gen.listOfN(n, for {
        t <- Gen.oneOf("aa", "bb", "cc", "dd", "  aa", "BB")
        s <- Gen.oneOf("s1", "s2", "s3")
      } yield (t, s))
    } yield rows
    forAll(corpus) { rows =>
      val df = spark.createDataFrame(rows).toDF("text", "source")
      val got = graft.operators.Dedup
        .sourceOverlapMatrix(df, "text", "source")
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getDouble(3), r.getDouble(4))))
        .toMap
      // reference: distinct (normalized text, source); for each pair
      // of sources the intersection of their content sets
      def norm(t: String) = t.trim.replaceAll("\\s+", " ").toLowerCase
      val bySrc = rows.map { case (t, s) => s -> norm(t) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val want = (for {
        a <- bySrc.keys; b <- bySrc.keys if a < b
        shared = (bySrc(a) & bySrc(b)).size if shared > 0
      } yield (a, b) -> ((shared.toLong,
        BigDecimal(shared.toDouble / bySrc(a).size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(shared.toDouble / bySrc(b).size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))).toMap
      assert(got == want, s"rows=$rows")
    }
  }

  test("lengthBucketAudit == in-memory reference on random ladders") {
    import org.apache.spark.sql.functions._
    val gen = for {
      caps <- Gen.nonEmptyListOf(Gen.choose(1, 64)).map(_.distinct.sorted)
      if caps.nonEmpty
      toks <- Gen.nonEmptyListOf(Gen.choose(0, 100))
    } yield (caps, toks)
    forAll(gen) { case (caps, toks) =>
      val df = spark.createDataFrame(toks.map(Tuple1(_))).toDF("tok")
      val got = graft.operators.Sampling
        .lengthBucketAudit(df, col("tok").cast("long"), caps)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getDouble(5))))
        .toMap
      val top = caps.last
      val want = toks.groupBy(t => caps.find(t <= _).getOrElse(top).toLong)
        .map { case (cap, ts) =>
          val kept = ts.map(t => math.min(t, top).toLong).sum
          val pad = ts.size * cap - kept
          val trunc = ts.map(t => math.max(t - top, 0).toLong).sum
          cap -> ((ts.size.toLong, kept, pad, trunc,
            BigDecimal(pad.toDouble / (ts.size * cap))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        }
      assert(got == want, s"caps=$caps toks=$toks")
    }
  }

  test("tokenBudgetMix == in-memory reference on random corpora") {
    import org.apache.spark.sql.functions._
    val gen = for {
      n <- Gen.choose(4, 14)
      rows <- Gen.listOfN(n, for {
        words <- Gen.choose(1, 9)
        s <- Gen.oneOf("web", "code", "wiki")
      } yield (words, s))
      weights <- Gen.mapOf(Gen.zip(Gen.oneOf("web", "code", "wiki"),
        Gen.choose(0.0, 2.0)))
      if weights.nonEmpty
      budget <- Gen.choose(1L, 60L)
    } yield (rows, weights, budget)
    forAll(gen) { case (rows, weights, budget) =>
      val docs = spark.createDataFrame(
        rows.zipWithIndex.map { case ((w, s), i) =>
          (i.toLong, Seq.fill(w)("tok").mkString(" "), s)
        }).toDF("doc_id", "text", "source")
      val got = graft.operators.Sampling
        .tokenBudgetMix(docs, "doc_id", "text", "source", weights, budget)
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
        .toMap
      // reference: the documented float ops verbatim, md5 deviate by hand
      val md = java.security.MessageDigest.getInstance("MD5")
      def deviate(id: Long): Double = {
        val hex = md.digest(id.toString.getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString.take(8)
        java.lang.Long.parseLong(hex, 16) / 4294967296.0
      }
      val toks = rows.zipWithIndex.map { case ((w, s), i) => (i.toLong, w.toLong, s) }
      val totals = toks.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
      val want = toks.groupBy(_._3).flatMap { case (src, ds) =>
        val ratio = math.min(1.0,
          weights.getOrElse(src, 0.0) * budget.toDouble / totals(src))
        val kept = ds.filter(d => deviate(d._1) < ratio)
        if (kept.isEmpty) None
        else Some(src -> ((kept.size.toLong, kept.map(_._2).sum,
          BigDecimal(ratio).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble)))
      }
      assert(got == want, s"rows=$rows weights=$weights budget=$budget")
      // the mixture contract: expected kept token mass per present
      // source is min(total, w·budget) — check the realized mass is
      // exactly the reference's (determinism), and never exceeds the
      // source's own total
      got.foreach { case (src, (_, keptToks, _)) =>
        assert(keptToks <= totals(src), s"$src kept more than it has")
      }
    }
  }

  test("ngramNovelty == in-memory reference on random duplicated corpora") {
    import org.apache.spark.sql.functions._
    // tiny vocab + shared phrase prefixes so shingles genuinely collide
    // across docs, and occasional exact copies
    val gen = for {
      n <- Gen.choose(3, 10)
      rows <- Gen.listOfN(n, for {
        words <- Gen.choose(1, 8)
        ws <- Gen.listOfN(words, Gen.oneOf("a", "b", "c", "d"))
      } yield ws.mkString(" "))
      dupOf <- Gen.choose(0, n - 1)
    } yield rows :+ rows(dupOf) // always at least one exact copy
    forAll(gen) { texts =>
      val docs = spark.createDataFrame(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }).toDF("doc_id", "text")
      val got = graft.operators.TextAnalysis
        .ngramNovelty(docs, "doc_id", "text", k = 3)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      // reference: wordShingles semantics by hand — distinct 3-grams,
      // docs under 3 tokens contribute their whole token string
      def shingles(t: String): Set[String] = {
        val toks = t.trim.split("\\s+").toSeq
        if (toks.size >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
        else Set(toks.mkString(" "))
      }
      val perDoc = texts.zipWithIndex.map { case (t, i) => i.toLong -> shingles(t) }
      val docCount = perDoc.flatMap { case (id, ss) => ss.map(_ -> id) }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
      val want = perDoc.map { case (id, ss) =>
        val novel = ss.count(s => docCount(s) == 1).toLong
        id -> ((ss.size.toLong, novel,
          BigDecimal(novel.toDouble / ss.size * 1e6)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
      }.toMap
      assert(got == want, s"texts=$texts")
    }
  }

  test("blockDedupStats == in-memory reference incl. empty and near-copy texts") {
    import org.apache.spark.sql.functions._
    val gen = for {
      n <- Gen.choose(2, 8)
      rows <- Gen.listOfN(n, for {
        len <- Gen.oneOf(0, 1, 5, 7, 8, 9, 20)
        cs <- Gen.listOfN(len, Gen.oneOf('x', 'y'))
      } yield cs.mkString)
      dupOf <- Gen.choose(0, n - 1)
    } yield rows :+ (rows(dupOf) + "z") // a suffix-edited near-copy
    forAll(gen) { texts =>
      val docs = spark.createDataFrame(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }).toDF("doc_id", "text")
      // blockChars = 4 so multi-block payloads are common at these sizes
      val got = graft.operators.Dedup
        .blockDedupStats(docs, "doc_id", "text", blockChars = 4)
        .collect().map(_.toSeq).head
      val blocks = texts.zipWithIndex.flatMap { case (t, i) =>
        t.grouped(4).map(b => (i.toLong, b)) }
      val distinct = blocks.map(_._2).distinct
      val total = blocks.map(_._2.length.toLong).sum
      val dedup = distinct.map(_.length.toLong).sum
      val want = Seq(
        blocks.map(_._1).distinct.size.toLong, blocks.size.toLong,
        distinct.size.toLong, blocks.size.toLong - distinct.size,
        total, dedup, total - dedup,
        BigDecimal(dedup.toDouble / total * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      assert(got == want, s"texts=$texts")
    }
  }

  test("weightedSample == hand md5 filter on the documents table") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val got = graft.operators.Sampling
      .weightedSample(docs, col("doc_id"), col("n_chars") / lit(400.0))
      .select("doc_id").as[Long].collect().toSet
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = docs.select("doc_id", "n_chars").as[(Long, Long)].collect()
      .filter { case (id, nc) =>
        val hex = md.digest(id.toString.getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString.take(8)
        java.lang.Long.parseLong(hex, 16) / 4294967296.0 <
          math.min(1.0, nc / 400.0)
      }.map(_._1).toSet
    assert(got == want)
  }

  test("waterfill allocation satisfies the analytic invariants on random mixes") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val cases: Gen[(Seq[Long], Seq[Double], Long, Int)] = for {
      n <- Gen.choose(2, 6)
      masses <- Gen.listOfN(n, Gen.choose(5L, 2000L))
      weights <- Gen.listOfN(n, Gen.choose(1, 100).map(_.toDouble))
      budget <- Gen.choose(10L, 4000L)
      epochs <- Gen.oneOf(1, 1, 2, 4) // E = 1 (the plain fill) dominates
    } yield (masses, weights, budget, epochs)
    forAll(cases, n = 6) { case (masses, weights, budget, epochs) =>
      val srcs = masses.indices.map(i => f"s$i%02d")
      val docs = masses.zip(srcs).map { case (m, s) =>
        (s.hashCode.toLong, s, Seq.fill(m.toInt)("w").mkString(" "))
      }.toDF("doc_id", "source", "text")
      val wmap = srcs.zip(weights).toMap
      val got = graft.operators.Sampling.waterfillBudgetMix(
          docs, "doc_id", "text", "source", wmap, budget, maxEpochs = epochs)
        .select("source", "n_tokens", "alloc_tokens", "capped")
        .as[(String, Long, Long, Int)].collect()
      val totalC = masses.sum * epochs
      val totalAlloc = got.map(_._3).sum
      // (a) never allocate above a source's epoch cap E·m
      got.foreach { case (s, m, a, _) =>
        assert(a <= m * epochs && a >= 0, s"$s alloc=$a cap=${m * epochs}") }
      // (b) budget consumed exactly up to per-source rounding (±1 per
      //     uncapped source), or the whole E-epoch corpus if it fits
      val target = math.min(budget, totalC)
      val slack = got.count(_._4 == 0).max(1)
      assert(math.abs(totalAlloc - target) <= slack,
        s"masses=$masses weights=$weights budget=$budget E=$epochs " +
          s"alloc=$totalAlloc target=$target")
      // (c) capped sources are fully taken (all E epochs); uncapped
      //     never are (unless rounding lands exactly on the cap)
      got.foreach { case (s, m, a, c) =>
        if (c == 1) assert(a == m * epochs, s"$s capped but alloc=$a") }
    }
  }

  test("containment pairs equal the in-memory shingle-set reference") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta")
    // small random corpora: 4-7 docs of 3-14 tokens over an 8-word
    // vocab, so shared shingles (and full inclusions) actually occur
    val corpus: Gen[Seq[String]] = for {
      n <- Gen.choose(4, 7)
      docs <- Gen.listOfN(n, for {
        len <- Gen.choose(3, 14)
        ws <- Gen.listOfN(len, Gen.choose(0, vocab.size - 1))
      } yield ws.map(vocab).mkString(" "))
    } yield docs
    forAll(corpus, n = 5) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.operators.Dedup
        .containmentPairs(df, "doc_id", "text", shingleK = 3, threshold = 0.5)
        .select("a", "b", "containment")
        .as[(Long, Long, Double)].collect()
        .map { case (a, b, c) => (a, b) -> c }.toMap
      // reference: explicit shingle sets, exact |∩|/min, same rounding
      def shingles(t: String): Set[String] = {
        val ws = t.trim.split("\\s+").toSeq
        if (ws.length >= 3) ws.sliding(3).map(_.mkString(" ")).toSet
        else Set(ws.mkString(" "))
      }
      val sets = docs.zipWithIndex.map { case (t, i) => i.toLong -> shingles(t) }
      val want = (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        c = BigDecimal((sa & sb).size.toDouble / math.min(sa.size, sb.size))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        if c >= 0.5
      } yield (a, b) -> c).toMap
      assert(got == want, s"docs=$docs\ngot=$got\nwant=$want")
    }
  }

  test("containment prefix filter is lossless under a df cap and tight threshold") {
    import spark.implicits._
    // The prefix filter indexes only each doc's rarest fps; the df cap
    // makes "rare" a strict subset of a doc's shingles while sizes
    // still count ALL of them — exactly the interaction that could
    // clip a boundary pair if the pigeonhole bound were off by one.
    // High thresholds (0.75/0.9) make prefixes as short as possible.
    val vocab = Vector("a1", "b2", "c3", "d4", "e5", "f6")
    val corpus: Gen[(Seq[String], Double)] = for {
      n <- Gen.choose(5, 8)
      docs <- Gen.listOfN(n, for {
        len <- Gen.choose(3, 12)
        ws <- Gen.listOfN(len, Gen.choose(0, vocab.size - 1))
      } yield ws.map(vocab).mkString(" "))
      thr <- Gen.oneOf(0.75, 0.9)
    } yield (docs, thr)
    forAll(corpus, n = 5) { case (docs, thr) =>
      val cap = 3L
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      def run(prefix: Boolean) = graft.operators.Dedup
        .containmentPairs(df, "doc_id", "text", shingleK = 3,
          threshold = thr, maxShingleDocFreq = cap, prefixFilter = prefix)
        .select("a", "b", "containment")
        .as[(Long, Long, Double)].collect()
        .map { case (a, b, c) => (a, b) -> c }.toMap
      def shingles(t: String): Set[String] = {
        val ws = t.trim.split("\\s+").toSeq
        if (ws.length >= 3) ws.sliding(3).map(_.mkString(" ")).toSet
        else Set(ws.mkString(" "))
      }
      val sets = docs.zipWithIndex.map { case (t, i) => i.toLong -> shingles(t) }
      val dfreq = sets.flatMap(_._2).groupBy(identity).map { case (s, o) => s -> o.size }
      val rareOf = sets.map { case (i, s) => i -> s.filter(dfreq(_) <= cap) }.toMap
      val want = (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        shared = (rareOf(a) & rareOf(b)).size
        c = BigDecimal(shared.toDouble / math.min(sa.size, sb.size))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        if c >= thr
      } yield (a, b) -> c).toMap
      assert(run(prefix = false) == want, s"naive thr=$thr docs=$docs")
      assert(run(prefix = true) == want, s"prefix thr=$thr docs=$docs")
    }
  }

  test("templateSkeletons is filler-invariant and content-sensitive") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // a "form" alternates punctuation scaffolding with alnum filler;
    // regenerating fillers must preserve the skeleton fingerprint,
    // touching the scaffolding must change it
    val scaffold = for {
      nSeg <- Gen.choose(2, 5)
      seps <- Gen.listOfN(nSeg, Gen.oneOf(": ", "; ", "# ", "=", "! ", ", "))
    } yield seps
    val filler: Gen[String] = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
    forAll(scaffold) { seps =>
      def render(fs: Seq[String]): String =
        fs.zip(seps).map { case (f, p) => f + p }.mkString + "end"
      val fillsA = seps.indices.map(i =>
        filler.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i + 1L)).get)
      val fillsB = seps.indices.map(i =>
        filler.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i + 100L)).get)
      val df = Seq((1L, render(fillsA)), (2L, render(fillsB)),
        (3L, render(fillsA).replace(seps.head.trim.headOption.getOrElse(';'), '~')))
        .toDF("doc_id", "text")
      val sk = df.select(col("doc_id"), org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.regexp_replace(
          org.apache.spark.sql.functions.lower(
            org.apache.spark.sql.functions.trim(col("text"))),
          "[a-z0-9]+", "w")).as("fp"))
        .as[(Long, String)].collect().toMap
      assert(sk(1L) == sk(2L),
        s"different fillers must share a skeleton: ${render(fillsA)} vs ${render(fillsB)}")
      if (seps.head.trim.nonEmpty)
        assert(sk(1L) != sk(3L), "changing scaffolding must change the skeleton")
    }
  }

  test("PixelCodec: encode→decode round-trips random images exactly") {
    import graft.operators.Multimodal.PixelCodec
    val gen = for {
      w <- Gen.choose(1, 23)
      h <- Gen.choose(1, 17)
      ch <- Gen.oneOf(1, 2, 3, 4)
      seed <- Gen.choose(0, Int.MaxValue)
    } yield (w, h, ch, seed)
    forAll(gen, n = 12) { case (w, h, ch, seed) =>
      // deterministic pseudo-random pixels from the generated seed
      val px = Array.tabulate(w * h * ch) { i =>
        var v = i * 2654435761L + seed.toLong
        v ^= v >>> 13; v ^= v << 7; (v & 0xff).toInt
      }
      val img = PixelCodec.Image(w, h, ch, px)
      val back = PixelCodec.decodePng(PixelCodec.encodePng(img))
      assert(back.nonEmpty, s"decode failed ${w}x$h ch=$ch seed=$seed")
      assert(back.get.width == w && back.get.height == h &&
        back.get.channels == ch)
      assert(back.get.pixels.sameElements(px),
        s"pixel mismatch ${w}x$h ch=$ch seed=$seed")
      // resize(w, h) to the same size is the identity
      assert(PixelCodec.resizeNearest(img, w, h).pixels.sameElements(px))
    }
  }

  test("WavCodec round-trips random PCM clips; resample to same rate is identity") {
    import graft.operators.Multimodal.WavCodec
    val gen = for {
      sr <- Gen.oneOf(8000, 12000, 16000, 44100)
      ch <- Gen.choose(1, 4)
      nf <- Gen.choose(1, 300)
      seed <- Gen.choose(0, Int.MaxValue)
    } yield (sr, ch, nf, seed)
    forAll(gen, n = 12) { case (sr, ch, nf, seed) =>
      val samples = Array.tabulate(nf * ch) { i =>
        var v = i * 2654435761L + seed.toLong
        v ^= v >>> 13; v ^= v << 7
        ((v % 65536 + 65536) % 65536 - 32768).toInt
      }
      val w = WavCodec.Wav(sr, ch, samples)
      val back = WavCodec.decodeWav(WavCodec.encodeWav(w))
      assert(back.nonEmpty, s"decode failed $sr/$ch/$nf seed=$seed")
      assert(back.get.sampleRate == sr && back.get.channels == ch &&
        back.get.samples.sameElements(samples),
        s"sample mismatch $sr/$ch/$nf seed=$seed")
      assert(WavCodec.resample(w, sr).samples.sameElements(samples),
        "same-rate resample must be the identity")
      // down-then-inspect: every output frame is some input frame,
      // channels moved together
      val down = WavCodec.resample(w, math.max(1, sr / 3))
      (0 until down.nFrames).foreach { i =>
        val src = (i.toLong * sr / down.sampleRate).toInt
        (0 until ch).foreach(c => assert(
          down.samples(i * ch + c) == samples(src * ch + c)))
      }
    }
  }

  test("WavCodec.decodeWav never throws on arbitrary byte soup (incl. RIFF-prefixed)") {
    import graft.operators.Multimodal.WavCodec
    val gen = for {
      n <- Gen.choose(0, 200)
      seed <- Gen.choose(0, Int.MaxValue)
      riff <- Gen.oneOf(true, false)
    } yield (n, seed, riff)
    forAll(gen, n = 16) { case (n, seed, riff) =>
      val junk = Array.tabulate(n) { i =>
        var v = i * 1099511628211L + seed.toLong
        v ^= v >>> 17; (v & 0xff).toByte
      }
      val payload = if (riff)
        "RIFF".getBytes("US-ASCII") ++ junk ++ "WAVE".getBytes("US-ASCII")
      else junk
      WavCodec.decodeWav(payload) // quarantine contract: None or a
      // genuinely well-formed parse — either way, NO throw
    }
  }
}
