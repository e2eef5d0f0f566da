package graft

import graft.operators.{PqIndex, Similarity}
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")

  test("codes are valid and compress to m small ints") {
    val model = PqIndex.train(emb, "embedding", m = 16, k = 16)
    assert(model.codebooks.length == 16 && model.dsub == 4)
    val codes = Similarity.withUnit(emb, "embedding")
      .select(PqIndex.encode(col("_unit"), model).as("c"))
      .as[Seq[Int]].collect()
    assert(codes.forall(c => c.length == 16 && c.forall(j => j >= 0 && j < 16)))
  }

  test("ADC reconstruction approximates true cosine") {
    val model = PqIndex.train(emb, "embedding", m = 16, k = 16)
    val u = Similarity.withUnit(emb, "embedding").limit(50).cache()
    val pairs = u.select(col("vec_id").as("a"), col("_unit").as("u_a"),
        PqIndex.encode(col("_unit"), model).as("c_a"))
      .crossJoin(u.select(col("vec_id").as("b"), col("_unit").as("u_b")).limit(5))
      .filter(col("a") =!= col("b"))
      .select(
        graft.functions.Vec.dot(col("u_a"), col("u_b")).as("exact"),
        PqIndex.adcScore(col("u_b"), col("c_a"), model).as("approx"))
      .as[(Double, Double)].collect()
    val mae = pairs.map { case (e, a) => math.abs(e - a) }.sum / pairs.length
    assert(mae < 0.15, s"mean abs error $mae")
  }

  test("reconstruction cosine: exact vs hand-decoded, monotone in m (trained)") {
    // reconNormSq + adcScore(u, codes) must equal cos(u, decode(codes))
    // computed by hand from the model; and finer subspaces (larger m,
    // shorter sub-slices) reconstruct at least as well on average.
    def avgRecon(m: Int): Double = {
      val model = PqIndex.train(emb, "embedding", m = m, k = 16)
      val rows = Similarity.withUnit(emb, "embedding")
        .select(col("_unit"),
          PqIndex.encode(col("_unit"), model).as("_codes"))
        .withColumn("_cos",
          PqIndex.adcScore(col("_unit"), col("_codes"), model) /
            sqrt(PqIndex.reconstructionNormSq(col("_codes"), model)))
        .select(col("_unit"), col("_codes"), col("_cos"))
        .as[(Seq[Double], Seq[Int], Double)].collect()
      // hand decode + cosine for a sample of rows
      rows.take(20).foreach { case (u, codes, got) =>
        val r = codes.zipWithIndex.flatMap { case (j, s) => model.codebooks(s)(j) }
        val num = u.zip(r).map { case (a, b) => a * b }.sum
        val den = math.sqrt(r.map(x => x * x).sum)
        assert(math.abs(got - num / den) < 1e-9, s"hand=${num / den} got=$got")
      }
      rows.map(_._3).sum / rows.length
    }
    val a8 = avgRecon(8); val a16 = avgRecon(16)
    assert(a16 >= a8 - 1e-6, s"m=16 ($a16) must not reconstruct worse than m=8 ($a8)")
    assert(a8 > 0.2 && a16 <= 1.0 + 1e-9, s"a8=$a8 a16=$a16")
  }

  test("PQ top-k recall against brute force") {
    val queries = emb.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = PqIndex.pqTopK(emb, queries, "vec_id", "embedding", k = 5, m = 16)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // keys is a Set — map to a Seq first or equal recalls collapse
    val recall = exact.keys.toSeq.map(q =>
      (exact(q) & approx.getOrElse(q, Set.empty)).size.toDouble / exact(q).size)
      .sum / exact.size
    assert(recall >= 0.8, s"recall@5 = $recall")
  }

  test("parity codebooks: un-pruned re-rank reproduces brute force exactly") {
    // With rerankFactor covering the whole corpus, the ADC stage prunes
    // nothing and the exact re-rank must equal bruteForceTopK row for
    // row — whatever the codebooks are. This pins the v07 gate's
    // re-rank plumbing under the parity model; the ADC cut's quality
    // under TRAINED codebooks is the recall test above.
    val queries = emb.filter(col("vec_id") < 5)
    val parity = PqIndex.parityModel(emb, "vec_id", "embedding", m = 16, k = 16)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
      .collect().map(_.toSeq).toSet
    val full = PqIndex.pqTopK(emb, queries, "vec_id", "embedding", k = 5,
        m = 16, rerankFactor = 1000000, model0 = Some(parity))
      .collect().map(_.toSeq).toSet
    assert(full == exact, "un-pruned parity PQ must equal brute force")
  }

  test("IVF-PQ top-k recall against brute force") {
    val queries = emb.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = PqIndex.ivfPqTopK(emb, queries, "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 8, m = 16)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = exact.keys.toSeq.map(q =>
      (exact(q) & approx.getOrElse(q, Set.empty)).size.toDouble / exact(q).size)
      .sum / exact.size
    // IVF restriction stacks on PQ approximation; at nprobe=8/16 the
    // cell filter should cost little extra recall over PQ alone
    assert(recall >= 0.72, s"recall@5 = $recall")
  }

  test("IVF-PQ candidates per query shrink with the cell restriction") {
    // with k and rerankFactor unbounded the output IS the probed-cell
    // candidate set, so its size per query exposes the IVF cut:
    // nprobe=4 of 16 cells must leave well under the whole corpus
    val queries = emb.filter(col("vec_id") < 3)
    val n = emb.count()
    val out = PqIndex.ivfPqTopK(emb, queries, "vec_id", "embedding",
      k = Int.MaxValue / 2, nlist = 16, nprobe = 4, m = 16, rerankFactor = 1)
    val perQuery = out.groupBy("query_id").count()
      .select("count").as[Long].collect()
    assert(perQuery.length == 3)
    perQuery.foreach(c =>
      assert(c < (n * 0.8).toLong, s"candidates $c vs corpus $n: cell cut missing"))
  }

  test("saved IVF-PQ index: searchSaved == live ivfPqTopK, models round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString
    val queries = emb.filter(col("vec_id") < 5)
    val (_, pqSaved) = PqIndex.saveIvfPq(emb, "vec_id", "embedding", dir,
      nlist = 16, m = 8, nCentroids = 16)
    val loaded = PqIndex.loadModel(spark, dir)
    assert(loaded.m == pqSaved.m && loaded.dsub == pqSaved.dsub)
    assert(loaded.codebooks.map(_.map(_.toSeq).toSeq).toSeq
      == pqSaved.codebooks.map(_.map(_.toSeq).toSeq).toSeq,
      "codebooks must round-trip parquet bit-exactly")
    val live = PqIndex.ivfPqTopK(emb, queries, "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 4, m = 8, nCentroids = 16)
      .as[(Long, Int, Long, Double)].collect().toSet
    val saved = PqIndex.searchSaved(spark, dir, queries, "vec_id", "embedding",
      k = 5, nprobe = 4)
    val got = saved.as[(Long, Int, Long, Double)].collect().toSet
    assert(got == live, "persisted IVF-PQ must reproduce the live search")
    val plan = saved.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan.take(2000))
    graft.operators.OpCaches.release(spark)
  }

  test("fused parityIvfResidualModels == the two-collect parity builds") {
    val ivf2 = graft.operators.IvfIndex.parityModel(
      emb, "vec_id", "embedding", 16)
    val pq2 = PqIndex.parityResidualModel(
      emb, "vec_id", "embedding", ivf2, m = 16, k = 16)
    val (ivf1, pq1) = PqIndex.parityIvfResidualModels(
      emb, "vec_id", "embedding", nlist = 16, m = 16, k = 16)
    assert(ivf1.centroids.map(_.toSeq).toSeq ==
      ivf2.centroids.map(_.toSeq).toSeq,
      "one-collect IVF centroids must equal parityModel's")
    assert(pq1.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      pq2.codebooks.map(_.map(_.toSeq).toSeq).toSeq,
      "one-collect residual codebooks must equal parityResidualModel's")
  }

  test("residual IVF-PQ: exhaustive probe + un-pruned re-rank is exact") {
    // nprobe = nlist removes the cell cut and a corpus-sized
    // rerankFactor removes the ADC cut, so whatever the residual
    // codebooks quantize to, the exact re-rank must reproduce brute
    // force row for row — the same invariant the raw-codes path pins.
    val queries = emb.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
      .collect().map(_.toSeq).toSet
    val full = PqIndex.residualIvfPqTopK(emb, queries, "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 16, m = 16, rerankFactor = 1000000)
      .collect().map(_.toSeq).toSet
    assert(full == exact, "exhaustive residual IVF-PQ must equal brute force")
  }

  test("residual IVF-PQ recall against brute force (trained)") {
    val queries = emb.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = PqIndex.residualIvfPqTopK(emb, queries, "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 8, m = 16)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = exact.keys.toSeq.map(q =>
      (exact(q) & approx.getOrElse(q, Set.empty)).size.toDouble / exact(q).size)
      .sum / exact.size
    assert(recall >= 0.72, s"recall@5 = $recall")
  }

  test("residual ADC: decomposition is exact, error bounded, regime measured") {
    // Three pins. (1) CORRECTNESS: the decomposed estimate
    // dot(q, c_cell) + Σ_s dot(q_sub, codebook_s(code_s)) must equal a
    // hand-decoded dot(q, c_cell + decode(codes)) to float precision —
    // the plumbing the v34 oracle replays. (2) BOUND: residual ADC mae
    // vs true cosine stays small. (3) REGIME: residual-vs-raw is
    // data-dependent — residual wins iff the coarse quantizer captures
    // real structure (mean ‖r‖² = 2 − 2·cos(u, c) < 1). The driver's
    // synthetic embeddings are near-isotropic, so ‖r‖ is measured
    // LARGE here and raw codes may measure at parity or better; the
    // test asserts the relationship between the measured norms and
    // which encoding a deployment should pick, not a universal win.
    import graft.operators.IvfIndex
    val sample = IvfIndex.sampleUnits(emb, "embedding")
    val ivf = IvfIndex.train(sample, 16, iters = 10)
    val resPq = PqIndex.train(PqIndex.residualsOf(sample, ivf),
      m = 16, k = 16, iters = 8)
    val centLit = array(
      ivf.centroids.map(c => array(c.toSeq.map(lit(_)): _*)).toSeq: _*)
    val u = Similarity.withUnit(emb, "embedding").limit(200)
      .select(col("vec_id").as("a"), col("_unit").as("u_a"))
      .withColumn("_cell", IvfIndex.assignCell(col("u_a"), ivf))
      .withColumn("_cent", element_at(centLit, col("_cell") + 1))
      .withColumn("_rvec", zip_with(col("u_a"), col("_cent"), (x, c) => x - c))
      .withColumn("_res", PqIndex.encode(col("_rvec"), resPq))
      .cache()
    // (3) measured residual norms on this corpus
    val meanR2 = u.select(avg(graft.functions.Vec.dot(col("_rvec"), col("_rvec"))))
      .as[Double].head()
    val pairs = u.crossJoin(
        Similarity.withUnit(emb, "embedding").limit(5)
          .select(col("vec_id").as("b"), col("_unit").as("u_b")))
      .filter(col("a") =!= col("b"))
      .select(col("u_b"), col("_cent"), col("_res"),
        graft.functions.Vec.dot(col("u_a"), col("u_b")).as("exact"),
        (graft.functions.Vec.dot(col("u_b"), col("_cent")) +
          PqIndex.adcScore(col("u_b"), col("_res"), resPq)).as("res_adc"))
      .as[(Seq[Double], Seq[Double], Seq[Int], Double, Double)].collect()
    // (1) hand-decode a sample of pairs
    pairs.take(25).foreach { case (qv, cent, codes, _, got) =>
      val recon = cent.indices.map { i =>
        val s = i / resPq.dsub
        cent(i) + resPq.codebooks(s)(codes(s))(i - s * resPq.dsub)
      }
      val hand = qv.zip(recon).map { case (a, b) => a * b }.sum
      assert(math.abs(got - hand) < 1e-9, s"hand=$hand got=$got")
    }
    // (2) bounded error
    val resMae = pairs.map { case (_, _, _, e, r) => math.abs(e - r) }
      .sum / pairs.length
    u.unpersist()
    assert(resMae < 0.15, s"residual mae $resMae")
    // (3) isotropic corpus: residuals are NOT small here — this is the
    // measured regime note in residualIvfPqTopK's scaladoc
    assert(meanR2 > 0.5, s"mean residual norm² $meanR2: corpus unexpectedly " +
      "clustered; revisit the scaladoc regime note if this flips")
  }
}
