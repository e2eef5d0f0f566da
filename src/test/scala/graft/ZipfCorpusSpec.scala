package graft

import graft.tools.ZipfCorpus
import org.apache.spark.sql.functions._

/** The d28 crossover fixture: pins that [[ZipfCorpus]] actually HAS
  * the heavy-tailed shingle-df shape the prefix filter targets (unlike
  * the driver's near-uniform synthetic documents), and that both d28
  * candidate paths stay bit-identical on it — the property the bench
  * comparison (README) rests on.
  */
class ZipfCorpusSpec extends SparkSpec {

  test("fixture df distribution is heavy-tailed: top decile of fps carries most df mass") {
    val corpus = ZipfCorpus.docs(spark, 2000)
    val dfs = corpus.select(explode(
        graft.operators.TextAnalysis.wordShingles(col("text"), 3)).as("s"))
      .groupBy(col("s")).agg(count(lit(1)).as("df"))
    val rows = dfs.select(col("df")).as[Long](
      org.apache.spark.sql.Encoders.scalaLong).collect().sortBy(-_)
    val total = rows.sum.toDouble
    val topDecile = rows.take(math.max(1, rows.length / 10)).sum.toDouble
    // the uniform synthetic corpus puts ~10% of mass in its top decile
    // (df ≈ constant); the Zipf fixture must put the MAJORITY there
    assert(topDecile / total > 0.5,
      f"expected heavy tail, got top-decile share ${topDecile / total}%.3f")
    // and the head must be genuinely deep: phrase r=2 appears in n/2 docs
    assert(rows.head >= 900L, s"deepest df should be ~n/2: ${rows.head}")
  }

  test("both d28 candidate paths are bit-identical on the heavy-tailed shape") {
    // threshold 0.5, not the 0.9 production default: every fixture doc
    // carries unique preamble/boundary shingles, capping pairwise
    // containment below ~0.75 by construction — 0.5 yields a real pair
    // set while keeping the prefix cut selective
    val corpus = ZipfCorpus.docs(spark, 600)
    def run(prefix: Boolean) =
      graft.operators.Dedup.containmentPairs(corpus, "doc_id", "text",
          shingleK = 3, threshold = 0.5, maxShingleDocFreq = 50,
          prefixFilter = prefix)
        .orderBy("a", "b").collect().map(_.toString).toSeq
    val (self, pre) = (run(false), run(true))
    graft.operators.OpCaches.release(spark)
    assert(self.nonEmpty,
      "fixture must produce containment pairs (i%r structure nests shingle sets)")
    assert(self == pre,
      s"paths diverged on the Zipf shape: ${self.size} vs ${pre.size} pairs")
  }

  test("path probe separates the shapes by a decade each side of the flip point") {
    import graft.operators.Dedup
    // heavy tail with an uncapped head: fanout must sit above 100
    val zipf = ZipfCorpus.docs(spark, 2000)
    val zf = Dedup.containmentPathProbe(zipf, "doc_id", "text",
      maxShingleDocFreq = 2000).head()
    // near-unique corpus (every doc six unique words, no boilerplate):
    // df ≈ 1 everywhere, fanout ≈ 1
    val unique = zipf.select(col("doc_id"),
      concat_ws(" ", (1 to 6).map(i =>
        format_string(s"u${i}x%d u${i}y%d", col("doc_id"), col("doc_id"))): _*)
        .as("text"))
    val uf = Dedup.containmentPathProbe(unique, "doc_id", "text").head()
    assert(zf.getAs[Double]("fanout") > 100.0,
      s"zipf fanout should exceed the flip point: $zf")
    assert(uf.getAs[Double]("fanout") < 10.0,
      s"unique-corpus fanout should sit well below it: $uf")
    // sum_df2 is the self-join's candidate count: sanity the ordering
    assert(zf.getAs[Long]("sum_df2") > uf.getAs[Long]("sum_df2"))
  }

  test("containmentPairsAuto matches the explicit paths on both shapes") {
    import graft.operators.Dedup
    val corpus = ZipfCorpus.docs(spark, 600)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("a", "b").collect().map(_.toString).toSeq
    // flipAt low → auto takes prefix; flipAt high → self-join; both
    // must equal the explicit call, whatever path auto picked
    val explicit = rows(Dedup.containmentPairs(corpus, "doc_id", "text",
      shingleK = 3, threshold = 0.5, maxShingleDocFreq = 50))
    val autoLo = rows(Dedup.containmentPairsAuto(corpus, "doc_id", "text",
      shingleK = 3, threshold = 0.5, maxShingleDocFreq = 50, flipAt = 1.0))
    val autoHi = rows(Dedup.containmentPairsAuto(corpus, "doc_id", "text",
      shingleK = 3, threshold = 0.5, maxShingleDocFreq = 50, flipAt = 1e18))
    graft.operators.OpCaches.release(spark)
    assert(autoLo == explicit && autoHi == explicit,
      s"auto diverged: lo=${autoLo.size} hi=${autoHi.size} explicit=${explicit.size}")
  }
}
