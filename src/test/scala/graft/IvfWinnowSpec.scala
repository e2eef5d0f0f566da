package graft

import graft.functions.HashExpressions
import graft.operators.{IvfIndex, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

class IvfWinnowSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")

  test("IVF training is deterministic; centroids are unit-ish") {
    val m1 = IvfIndex.train(emb, "embedding", nlist = 8)
    val m2 = IvfIndex.train(emb, "embedding", nlist = 8)
    assert(m1.centroids.map(_.toSeq).toSeq == m2.centroids.map(_.toSeq).toSeq)
    m1.centroids.foreach { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9)
    }
  }

  test("training sample is memoized per (plan, params): same array, no re-scan") {
    IvfIndex.clearSampleCache()
    val s1 = IvfIndex.sampleUnits(emb, "embedding", sampleSize = 64)
    val s2 = IvfIndex.sampleUnits(emb, "embedding", sampleSize = 64)
    assert(s1 eq s2, "second call must return the memoized array")
    // a different plan or param is a different key
    val s3 = IvfIndex.sampleUnits(emb, "embedding", sampleSize = 32)
    assert(!(s3 eq s1) && s3.length == 32)
    val s4 = IvfIndex.sampleUnits(emb.filter(col("vec_id") < 100), "embedding",
      sampleSize = 64)
    assert(!(s4 eq s1))
    IvfIndex.clearSampleCache()
    assert(!(IvfIndex.sampleUnits(emb, "embedding", sampleSize = 64) eq s1))
  }

  test("OpCaches.release unpersists every operator-cached frame") {
    import graft.operators.OpCaches
    OpCaches.release() // start from a clean registry
    IvfIndex.ivfTopK(emb, emb.filter(col("vec_id") < 3),
      "vec_id", "embedding", k = 3).count()
    assert(OpCaches.trackedCount > 0, "index build should register its caches")
    assert(spark.sharedState.cacheManager.isEmpty == false)
    OpCaches.release()
    assert(OpCaches.trackedCount == 0)
    // further searches still work (recompute instead of failing)
    val n = IvfIndex.ivfTopK(emb, emb.filter(col("vec_id") < 3),
      "vec_id", "embedding", k = 3).count()
    assert(n > 0)
    OpCaches.release()
  }

  test("OpCaches dedups plan-identical frames: search-many stays O(1) entries") {
    import graft.operators.OpCaches
    OpCaches.release()
    // the build-once/search-many pattern re-derives plan-identical
    // cached frames each call; the registry must not grow per call
    IvfIndex.ivfTopK(emb, emb.filter(col("vec_id") < 3),
      "vec_id", "embedding", k = 3).count()
    val afterFirst = OpCaches.trackedCount
    IvfIndex.ivfTopK(emb, emb.filter(col("vec_id") < 3),
      "vec_id", "embedding", k = 3).count()
    IvfIndex.ivfTopK(emb, emb.filter(col("vec_id") < 3),
      "vec_id", "embedding", k = 3).count()
    assert(OpCaches.trackedCount == afterFirst,
      s"repeat searches added entries: $afterFirst -> ${OpCaches.trackedCount}")
    OpCaches.release()
  }

  test("IVF cell assignment partitions the corpus") {
    val model = IvfIndex.train(emb, "embedding", nlist = 8)
    val cells = Similarity.withUnit(emb, "embedding")
      .select(IvfIndex.assignCell(col("_unit"), model).as("c"))
      .groupBy("c").count().collect()
    assert(cells.map(_.getLong(1)).sum == emb.count())
    assert(cells.length > 2, "multiple cells populated")
  }

  test("IVF recall vs brute force is reasonable at nprobe=4/nlist=16") {
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = IvfIndex.ivfTopK(emb, queries, "vec_id", "embedding", 5,
        nlist = 16, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall below 0.5 for nprobe/nlist = 1/4")
  }

  test("saved IVF index: searchSaved == ivfTopK, cells partition-pruned") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    val queries = emb.filter(col("vec_id") < 5)
    IvfIndex.save(emb, "vec_id", "embedding", dir, nlist = 16)
    val live = IvfIndex.ivfTopK(emb, queries, "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 4)
      .as[(Long, Int, Long, Double)].collect().toSet
    val saved = IvfIndex.searchSaved(spark, dir, queries, "vec_id", "embedding",
      k = 5, nprobe = 4)
    val got = saved.as[(Long, Int, Long, Double)].collect().toSet
    assert(got == live, "persisted index must reproduce the live search exactly")
    // the inverted file is laid out one directory per cell, so probes
    // can prune; the join key is the partition column
    val cellDirs = new java.io.File(s"$dir/cells").listFiles()
      .filter(_.getName.startsWith("_cell=")).map(_.getName).toSeq
    assert(cellDirs.nonEmpty && cellDirs.size <= 16, cellDirs.toString)
    // the scan's partition filters must carry the dynamic pruning
    // subquery over _cell — the mechanism that drops un-probed cells'
    // files at 100 TB (static plan: DPP placement happens pre-AQE)
    val plan = saved.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan.take(2000))
    graft.operators.OpCaches.release(spark)
  }

  test("winnowing: identical text → identical fingerprints; shared passage → overlap") {
    val passage = "the quick brown fox jumps over the lazy dog again and again"
    val d = Seq(
      (1L, s"prefix one $passage suffix alpha"),
      (2L, s"completely different start $passage and another ending"),
      (3L, "nothing in common with the others at all zebra quantum")).toDF("id", "text")
    val fps = d.select(col("id"), TextAnalysis.winnowFingerprints(col("text")).as("f"))
      .as[(Long, Seq[Long])].collect().toMap
    val shared12 = fps(1L).toSet & fps(2L).toSet
    val shared13 = fps(1L).toSet & fps(3L).toSet
    assert(shared12.size > 5, s"shared passage yields shared fingerprints: ${shared12.size}")
    assert(shared13.size < shared12.size / 2, "unrelated docs share far fewer")
  }

  test("winnowing: fingerprint count scales sub-linearly (window minima)") {
    val d = Seq("a b c d e f g h i j k l m n o p q r s t u v w x y z").toDF("text")
    val fp = d.select(TextAnalysis.winnowFingerprints(col("text"), 5, 4).as("f"))
      .as[Seq[Long]].head()
    val textLen = 51
    assert(fp.length < textLen - 4, s"winnowing selects a subset: ${fp.length}")
    assert(fp == fp.sorted && fp.distinct == fp, "sorted distinct set")
  }

  test("winnow handles short text (below k) via whole-string hash") {
    val d = Seq("ab").toDF("text")
    val fp = d.select(HashExpressions.winnow(col("text"), 5, 4).as("f"))
      .as[Seq[Long]].head()
    assert(fp.length == 1)
  }

  test("probe cost curve: monotone in nprobe, exhaustive = whole corpus") {
    import graft.operators.IvfIndex
    val m = IvfIndex.parityModel(emb, "vec_id", "embedding", nlist = 8)
    val qs = emb.filter(col("vec_id") < 3)
    val got = IvfIndex.probeCostCurve(emb, qs, "vec_id", "embedding",
        nprobes = Seq(1, 2, 8), model = m)
      .orderBy("nprobe")
      .as[(Long, Long, Long)].collect().toSeq
    val costs = got.map(_._2)
    assert(costs == costs.sorted && costs.distinct == costs,
      s"cost must be strictly monotone in nprobe: $got")
    // probing every cell scans the whole corpus for every query
    assert(got.last._2 == emb.count() * 3 && got.last._3 == 1000000L,
      got.toString)
    intercept[IllegalArgumentException] {
      IvfIndex.probeCostCurve(emb, qs, "vec_id", "embedding",
        nprobes = Seq(0), model = m)
    }
    // a zero-norm (unindexable) vector must not deflate the ppm: the
    // denominator is the INDEXED corpus, so exhaustive probing still
    // reads exactly 1e6 ppm
    val withZero = emb.select("vec_id", "embedding").unionByName(
      Seq((99999L, Array.fill(64)(0.0f))).toDF("vec_id", "embedding"))
    val gz = IvfIndex.probeCostCurve(withZero, qs, "vec_id", "embedding",
        nprobes = Seq(8), model = m)
      .as[(Long, Long, Long)].collect().head
    assert(gz._2 == emb.count() * 3 && gz._3 == 1000000L, gz.toString)
  }

  test("appendToSaved: incremental delta equals a one-shot index over the full corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-append").toString
    val half1 = emb.filter(col("vec_id") % 2 === 0)
    val half2 = emb.filter(col("vec_id") % 2 === 1)
    // build on half the corpus, append the other half as a "crawl delta"
    val model = IvfIndex.save(half1, "vec_id", "embedding", dir, nlist = 8)
    IvfIndex.appendToSaved(spark, dir, half2, "vec_id", "embedding")
    val qs = emb.filter(col("vec_id") < 3)
    val got = IvfIndex.searchSaved(spark, dir, qs, "vec_id", "embedding",
        k = 5, nprobe = 8)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .as[(Long, Int, Long, Double)].collect().toSeq.sortBy(r => (r._1, r._2))
    // one-shot reference: the SAME model (trained on half1) searched
    // over the full corpus in memory — append must only change storage,
    // never results
    val want = IvfIndex.ivfTopKWithModel(emb, qs, "vec_id", "embedding",
        k = 5, model, nprobe = 8)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .as[(Long, Int, Long, Double)].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(got.nonEmpty && got == want, s"got=$got\nwant=$want")
    // both halves actually contribute neighbors
    val ids = got.map(_._3).toSet
    assert(ids.exists(_ % 2 == 0) && ids.exists(_ % 2 == 1),
      s"append must be searchable: $ids")
    graft.operators.OpCaches.release()
  }

  test("filtered ANN: results stay within the allowed set; exhaustive probe equals filtered brute force") {
    val m = IvfIndex.parityModel(emb, "vec_id", "embedding", 8)
    val qs = emb.filter(col("vec_id") < 3)
    val allowed = emb.filter(col("vec_id") % 2 === 0).select("vec_id")
    val allowedIds = allowed.as[Long].collect().toSet
    val got = IvfIndex.ivfTopKWithModel(emb, qs, "vec_id", "embedding",
        k = 5, m, nprobe = 8, allowed = Some(allowed)) // nprobe = nlist
      .select("query_id", "rank", "neighbor_id", "cosine")
      .as[(Long, Int, Long, Double)].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(got.nonEmpty && got.forall(r => allowedIds(r._3)),
      "every filtered neighbor must satisfy the predicate")
    // exhaustive probe ⇒ the filtered search IS brute force over the
    // allowed subset (minus self-matches, same tie rules)
    val brute = Similarity.bruteForceTopK(
        emb.join(allowed, Seq("vec_id"), "left_semi"), qs,
        "vec_id", "embedding", k = 5)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .as[(Long, Int, Long, Double)].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(got == brute, s"got=$got\nbrute=$brute")
    graft.operators.OpCaches.release()
  }
}
