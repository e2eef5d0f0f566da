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
}
