package graft

import graft.functions.Vec
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val d = Seq(
      (Seq(1.0, 0.0), Seq(1.0, 0.0)),
      (Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (Seq(1.0, 0.0), Seq(-1.0, 0.0))).toDF("a", "b")
    val got = d.select(round(Vec.cosine(col("a"), col("b")), 9)).as[Double].collect().toSeq
    assert(got == Seq(1.0, 0.0, -1.0))
  }

  test("brute-force top-k: k rows per query, ranked by cosine desc") {
    val topk = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 3),
      "vec_id", "embedding", k = 5)
    val rows = topk.collect()
    assert(rows.length == 15)
    val perQuery = rows.groupBy(_.getLong(0))
    perQuery.values.foreach { rs =>
      val cos = rs.sortBy(_.getInt(1)).map(_.getDouble(3)).toSeq
      assert(cos == cos.sorted.reverse, "ranks ordered by cosine desc")
    }
    assert(rows.forall(r => r.getLong(0) != r.getLong(2)), "no self matches")
  }

  test("truncationOverlap: full-width prefix is identity; overlaps stay in [0, k]") {
    val q = emb.filter(col("vec_id") < 5)
    // cutting to the full 64 dims changes nothing → overlap is exactly k
    val ident = Similarity.truncationOverlap(emb, q, "vec_id", "embedding",
      k = 5, prefixDims = 64).collect()
    assert(ident.length == 5)
    assert(ident.forall(r => r.getLong(1) == 5L && r.getDouble(2) == 1.0),
      "prefix = full width must reproduce the exact top-k")
    // a real cut: one row per query, overlap bounded by k
    val cut = Similarity.truncationOverlap(emb, q, "vec_id", "embedding",
      k = 5, prefixDims = 8).collect()
    assert(cut.length == 5)
    assert(cut.forall(r => r.getLong(1) >= 0L && r.getLong(1) <= 5L))
    intercept[IllegalArgumentException] {
      Similarity.truncationOverlap(emb, q, "vec_id", "embedding", k = 5,
        prefixDims = 0)
    }
  }

  test("range search returns exactly the neighbors at or above the radius") {
    val corpus = Seq(
      (0L, Seq(1.0, 0.0)),   // the query itself — excluded by id
      (1L, Seq(0.9, 0.1)),   // cosine ≈ 0.9939 → in
      (2L, Seq(1.0, 1.0)),   // cosine ≈ 0.7071 → in at τ = 0.7
      (3L, Seq(0.0, 1.0)),   // cosine 0 → out
      (4L, Seq(-1.0, 0.0))   // cosine -1 → out
    ).toDF("vec_id", "embedding")
    val got = Similarity.rangeSearch(corpus, corpus.filter(col("vec_id") === 0),
        "vec_id", "embedding", minCosine = 0.7)
      .select("neighbor_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
    // tighter radius excludes the 45-degree vector
    val tight = Similarity.rangeSearch(corpus, corpus.filter(col("vec_id") === 0),
        "vec_id", "embedding", minCosine = 0.8)
      .select("neighbor_id").as[Long].collect().toSet
    assert(tight == Set(1L))
  }

  test("euclidean top-k ranks by L2 ascending; duplicate vector is rank 1 at 0") {
    val corpus = Seq(
      (0L, Seq(2.0, 0.0)),  // the query itself — excluded by id
      (1L, Seq(2.0, 0.0)),  // exact duplicate → l2 = 0
      (2L, Seq(2.0, 1.0)),  // l2 = 1
      (3L, Seq(0.0, 0.0)),  // l2 = 2 — cosine-undefined but L2-valid
      (4L, Seq(-2.0, 0.0))  // l2 = 4
    ).toDF("vec_id", "embedding")
    val got = Similarity.euclideanTopK(corpus,
        corpus.filter(col("vec_id") === 0), "vec_id", "embedding", k = 3)
      .orderBy("rank")
      .select("neighbor_id", "l2").as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 0.0), (2L, 1.0), (3L, 2.0)), got.toString)
  }

  test("MIPS: ranks by inner product; augmentation makes cosine agree with MIPS") {
    // b is nearly parallel to the query (cosine ≈ 1) but short; a is at
    // 45° but long — MIPS must pick a, cosine would pick b
    val corpus = Seq(
      (1L, Seq(5.0, 5.0)),    // ip = 5.0, cosine ≈ 0.707
      (2L, Seq(0.99, 0.01)),  // ip = 0.99, cosine ≈ 0.9999
      (3L, Seq(-1.0, 0.0))    // ip = -1
    ).toDF("vec_id", "embedding")
    val queries = Seq((0L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val mips = Similarity.mipsTopK(corpus, queries, "vec_id", "embedding", k = 2)
      .orderBy("rank").select("neighbor_id", "ip")
      .as[(Long, Double)].collect().toSeq
    assert(mips == Seq((1L, 5.0), (2L, 0.99)), mips.toString)
    // cosine on RAW vectors disagrees with MIPS order...
    val cosRaw = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", k = 1)
      .select("neighbor_id").as[Long].head()
    assert(cosRaw == 2L)
    // ...but cosine on AUGMENTED vectors reproduces the MIPS ranking,
    // so any cosine ANN index serves MIPS unchanged
    val m = math.sqrt(50.0) // max corpus norm
    val cAug = Similarity.augmentForMips(corpus, "embedding", m)
      .select(col("vec_id"), col("_aug").as("embedding"))
    val qAug = Similarity.augmentForMips(queries, "embedding", m, isQuery = true)
      .select(col("vec_id"), col("_aug").as("embedding"))
    val cosAug = Similarity.bruteForceTopK(cAug, qAug, "vec_id", "embedding", k = 2)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(cosAug == Seq(1L, 2L), cosAug.toString)
  }

  test("augmentForMips strict mode fails loudly on an underestimated maxNorm") {
    val corpus = Seq((1L, Seq(3.0, 4.0))).toDF("vec_id", "embedding") // norm 5
    // exact max norm passes strict (sqrt/square roundtrip tolerance)
    val ok = Similarity.augmentForMips(corpus, "embedding", maxNorm = 5.0)
      .select(element_at(col("_aug"), 3)).as[Double].head()
    assert(math.abs(ok) < 1e-6, s"slack dim at exact max norm should be ~0, got $ok")
    // an underestimated cap raises instead of silently clamping
    val e = intercept[Exception] {
      Similarity.augmentForMips(corpus, "embedding", maxNorm = 4.0)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("augmentForMips")), e.getMessage)
    // explicit opt-out keeps the documented clamp behavior
    val clamped = Similarity
      .augmentForMips(corpus, "embedding", maxNorm = 4.0, strict = false)
      .select(element_at(col("_aug"), 3)).as[Double].head()
    assert(clamped == 0.0)
  }

  test("LSH paths return empty results on an empty corpus, not a crash") {
    val empty = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding")
    val queries = Seq((0L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    assert(Similarity.lshTopK(empty, queries, "vec_id", "embedding", k = 3)
      .count() == 0)
    assert(Similarity.lshNearDupPairs(empty, "vec_id", "embedding", 0.9)
      .count() == 0)
  }

  test("LSH ANN recall vs brute force is reasonable at this scale") {
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(emb, queries, "vec_id", "embedding",
        k = 5, nbits = 6, tables = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low for 4 tables x 1-bit multiprobe at dim 64")
    // the v03 gate's md5-parity planes (uniform-cube directions instead
    // of Gaussian) must retrieve comparably — parity trades isotropy
    // for SQL replayability, not retrieval quality
    val parity = Similarity.lshTopK(emb, queries, "vec_id", "embedding",
        k = 5, nbits = 6, tables = 4, md5Parity = true)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val parityRecall = (exact & parity).size.toDouble / exact.size
    assert(parityRecall >= 0.5, s"parity-plane recall $parityRecall too low")
  }

  test("v15 ANN-composed kNN labels: exhaustive probing reproduces v12 exactly") {
    val sf = "/root/testdata/sf0.001"
    val table = Tables(spark, sf, "embeddings")
    val exact = QueryRegistry.queryMap("v12_knn_label")(spark, sf)
      .collect().map(_.toSeq).toSet
    // nprobe = nlist probes every cell: candidates (and their rounded
    // cosine ranking) are exactly the brute-force set, so the identical
    // vote must produce v12's rows verbatim — this isolates the
    // composition from IVF recall and proves the vote path is shared
    val exhaustive = graft.queries.VectorQueries
      .knnLabelAnn(table, k = 5, nlist = 16, nprobe = 16)
      .collect().map(_.toSeq).toSet
    assert(exhaustive == exact, "nprobe=nlist must equal the exact v12 output")
  }

  test("parity models are the smallest-id unit vectors — the SQL-replayable contract") {
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val emb = Tables(spark, sf, "embeddings")
    // expected: unit vectors of the 16 smallest vec_ids, computed
    // independently of the operator under test
    val expected = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .orderBy("vec_id").limit(16).collect()
      .map { r =>
        val e = r.getSeq[Double](1).toArray
        val n = math.sqrt(e.map(x => x * x).sum)
        e.map(_ / n)
      }
    val ivf = graft.operators.IvfIndex.parityModel(emb, "vec_id", "embedding", 16)
    assert(ivf.centroids.length == 16)
    ivf.centroids.zip(expected).foreach { case (got, exp) =>
      got.zip(exp).foreach { case (g, x) => assert(math.abs(g - x) < 1e-12) }
    }
    val pq = graft.operators.PqIndex.parityModel(emb, "vec_id", "embedding", m = 16, k = 16)
    assert(pq.m == 16 && pq.dsub == expected.head.length / 16)
    for (s <- 0 until pq.m; j <- expected.indices; i <- 0 until pq.dsub)
      assert(math.abs(pq.codebooks(s)(j)(i) - expected(j)(s * pq.dsub + i)) < 1e-12,
        s"codebook[$s][$j][$i] must be the sub-slice of unit vector $j")
  }

  test("v15 parity mode: exhaustive probing still reproduces v12 exactly") {
    // Parity centroids change WHICH cells exist, not the probe/vote
    // semantics: probing all 16 cells must recover the brute-force
    // candidates and therefore v12's rows verbatim, independent of how
    // the centroids were chosen — the gate's approximation error comes
    // only from nprobe < nlist, same contract as the trained path.
    val sf = "/root/testdata/sf0.001"
    val table = Tables(spark, sf, "embeddings")
    val exact = QueryRegistry.queryMap("v12_knn_label")(spark, sf)
      .collect().map(_.toSeq).toSet
    val exhaustive = graft.queries.VectorQueries
      .knnLabelAnn(table, k = 5, nlist = 16, nprobe = 16, parity = true)
      .collect().map(_.toSeq).toSet
    assert(exhaustive == exact, "parity + nprobe=nlist must equal the exact v12 output")
  }

  test("v15 at its ANN knobs: full output shape, well-above-chance agreement") {
    val sf = "/root/testdata/sf0.001"
    val exact = QueryRegistry.queryMap("v12_knn_label")(spark, sf)
      .select("vec_id", "pred_label").as[(Long, String)].collect().toMap
    val ann = QueryRegistry.queryMap("v15_knn_label_ann")(spark, sf)
      .select("vec_id", "pred_label").as[(Long, String)].collect().toMap
    // same output shape: one prediction per corpus vector
    assert(ann.keySet == exact.keySet,
      s"v15 predicts for all ${exact.size} vectors, got ${ann.size}")
    // The synthetic labels are ~uniform over 10 classes, so a 5-vote
    // majority is knife-edged: candidate recall ~0.5-0.75 at
    // nprobe/nlist = 1/4 (IvfWinnowSpec) only carries ~50% prediction
    // agreement. The pin is against chance (0.1), not near-equality —
    // the exhaustive-probe test above covers exactness.
    val agree = exact.count { case (id, l) => ann(id) == l }.toDouble / exact.size
    assert(agree >= 0.3, f"v12/v15 prediction agreement $agree%.3f vs 0.1 chance")
  }

  test("ivfRecallSweep: recall monotone in nprobe, exactly 1.0 at full probing") {
    val q = emb.filter(col("vec_id") < 10)
    val sweep = Similarity.ivfRecallSweep(emb, q, "vec_id", "embedding",
        k = 5, nlist = 8, nprobes = Seq(1, 2, 4, 8))
      .orderBy("nprobe")
      .as[(Int, Double)].collect().toSeq
    assert(sweep.map(_._1) == Seq(1, 2, 4, 8))
    val recalls = sweep.map(_._2)
    assert(recalls.forall(r => r >= 0.0 && r <= 1.0))
    assert(recalls == recalls.sorted,
      s"recall must be non-decreasing in nprobe: $recalls")
    assert(recalls.last == 1.0,
      s"nprobe = nlist probes every cell → brute-force recall, got ${recalls.last}")
    graft.operators.OpCaches.release()
    intercept[IllegalArgumentException] {
      Similarity.ivfRecallSweep(emb, q, "vec_id", "embedding",
        k = 5, nlist = 8, nprobes = Seq(0, 8))
    }
  }

  test("lshNearDupPairs matches the exact all-pairs result at threshold 0.9") {
    // plant perturbed twins like v04 does, then compare against the
    // exact O(N²) computation on this bounded corpus
    val perturbed = emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + 1000000).as("vec_id"),
        expr("transform(sequence(1, 64), i -> " +
          "CAST(element_at(embedding, i) AS DOUBLE) + " +
          "0.1 * CAST(element_at(embedding, 65 - i) AS DOUBLE))").as("embedding"))
    val all = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      .unionByName(perturbed)
    val u = Similarity.withUnit(all, "embedding")
    val exact = u.select(col("vec_id").as("a"), col("_unit").as("u_a"))
      .join(u.select(col("vec_id").as("b"), col("_unit").as("u_b")), col("a") < col("b"))
      .select(col("a"), col("b"), round(Vec.dot(col("u_a"), col("u_b")), 6).as("cosine"))
      .filter(col("cosine") >= 0.9)
      .as[(Long, Long, Double)].collect().toSet
    val lsh = Similarity.lshNearDupPairs(all, "vec_id", "embedding", threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(exact.nonEmpty, "fixture plants at least the 5 twin pairs")
    assert(lsh == exact, s"missed=${exact -- lsh} extra=${lsh -- exact}")
  }

  test("topPairs refuses an over-budget corpus with a pointer to the scale path") {
    val ex = intercept[IllegalArgumentException] {
      Similarity.topPairs(emb, "vec_id", "embedding", limit = 5, maxRows = 10)
    }
    assert(ex.getMessage.contains("lshNearDupPairs"))
  }

  test("signBits packs strict-positive signs into the expected long") {
    import spark.implicits._
    // dims 0, 1, 63 positive; dim 2 exactly 0.0 must NOT set its bit
    val v = Array.fill(64)(-1.0f)
    v(0) = 0.5f; v(1) = 2.0f; v(2) = 0.0f; v(63) = 1e-9f
    val got = Seq(Tuple1(v)).toDF("embedding")
      .select(Similarity.signBits(col("embedding")).as("s"))
      .as[Long].head()
    assert(got == (1L | 2L | (1L << 63)), s"got=$got")
    // scaling never flips a signature: unit-normalized twin agrees
    val scaled = Seq(Tuple1(v.map(_ * 7.5f))).toDF("embedding")
      .select(Similarity.signBits(col("embedding")).as("s"))
      .as[Long].head()
    assert(scaled == got)
  }

  test("binary overlap audit: identical binary/exact rankings give full overlap") {
    import spark.implicits._
    // orthogonal one-hot-ish vectors: cosine ranking and Hamming
    // ranking agree exactly, so every query overlaps k/k
    val rows = (0 until 8).map { i =>
      val v = Array.fill(64)(-1.0f); v(i) = 1.0f; (i.toLong, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.binarySignOverlap(df, df.filter(col("vec_id") < 3),
        "vec_id", "embedding", k = 3)
      .select("query_id", "n_overlap")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L), got.toString)
  }

  test("rerank with exhaustive candidates equals brute force exactly") {
    val n = emb.count().toInt
    val qs = emb.filter(col("vec_id") < 3)
    // candidate budget = whole corpus ⇒ the bit prefilter drops
    // nothing and the float pass IS brute force
    val rr = Similarity.rerankTopK(emb, qs, "vec_id", "embedding",
        k = 5, nCandidates = n)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .collect().map(_.toSeq).toSet
    val bf = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", k = 5)
      .collect().map(_.toSeq).toSet
    assert(rr == bf)
  }

  test("rerank candidate budget bounds work and guards reject bad k") {
    val qs = emb.filter(col("vec_id") < 2)
    val rr = Similarity.rerankTopK(emb, qs, "vec_id", "embedding",
      k = 4, nCandidates = 4)
    // nCandidates = k: the rerank can only reorder the 4 bit-pass
    // survivors; still exactly k rows per query
    assert(rr.groupBy("query_id").count().as[(Long, Long)].collect()
      .toMap.values.toSet == Set(4L))
    intercept[IllegalArgumentException] {
      Similarity.rerankTopK(emb, qs, "vec_id", "embedding",
        k = 5, nCandidates = 4)
    }
  }

  test("rerank recall sweep: monotone in C, exact at exhaustive depth") {
    val qs = emb.filter(col("vec_id") < 3)
    val n = emb.count().toInt
    val got = Similarity.rerankRecallSweep(emb, qs, "vec_id", "embedding",
        k = 5, nCandidates = Seq(5, 20, n - 1))
      .orderBy("n_candidates")
      .select("recall_ppm").as[Long].collect().toSeq
    assert(got == got.sorted, s"recall must be non-decreasing in C: $got")
    assert(got.last == 1000000L, s"exhaustive C must recover brute force: $got")
  }

  test("hyperplane signature is deterministic and balanced-ish") {
    val planes = Vec.randomPlanes(6, 64)
    val sigs = Similarity.withUnit(emb, "embedding")
      .select(Vec.hyperplaneSignature(col("_unit"), planes).as("s"))
      .as[Long].collect()
    assert(sigs.toSet.size > 8, "signatures spread over buckets")
    val again = Similarity.withUnit(emb, "embedding")
      .select(Vec.hyperplaneSignature(col("_unit"), planes).as("s"))
      .as[Long].collect()
    assert(sigs.toSeq == again.toSeq)
  }

  test("mmrTopK: diversity flips the second pick away from the near-duplicate") {
    // q along dim 1; c1/c2 nearly parallel (10° and 12° in the same
    // plane — c2 is a near-dup of c1), c3 at 25° in a DIFFERENT plane.
    // Plain top-2 = (c1, c2). MMR at λ=0.5: c2 scores .5·rel − .5·~cos2°
    // < c3's .5·rel − .5·cos10°cos25°, so the diversified pick is c3.
    def rad(d: Double) = math.toRadians(d)
    val rows = Seq(
      (100L, Seq(1.0, 0.0, 0.0)),
      (1L, Seq(math.cos(rad(10)), math.sin(rad(10)), 0.0)),
      (2L, Seq(math.cos(rad(12)), math.sin(rad(12)), 0.0)),
      (3L, Seq(math.cos(rad(25)), 0.0, math.sin(rad(25)))))
      .toDF("vec_id", "embedding")
    val plain = Similarity.bruteForceTopK(rows,
        rows.filter(col("vec_id") === 100), "vec_id", "embedding", k = 2)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(plain == Seq(1L, 2L), s"plain top-2: $plain")
    val mmr = Similarity.mmrTopK(rows, rows.filter(col("vec_id") === 100),
        "vec_id", "embedding", k = 2, poolSize = 3, lambda = 0.5)
      .orderBy("sel_round")
      .select("sel_round", "neighbor_id").as[(Long, Long)].collect().toSeq
    assert(mmr == Seq((1L, 1L), (2L, 3L)),
      s"MMR must pick the diverse candidate second: $mmr")
    graft.operators.OpCaches.release()
  }
}
