package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Link-graph analytics for crawl curation — the domain-authority
  * signal (PageRank) that large-scale web corpora weight quality and
  * crawl priority by.
  *
  * Spark shape, built for the 100 TB graph rather than the toy one:
  * each iteration is ONE shuffle — contributions flow
  * `ranks ⋈ edges → groupBy(dst) → sum` — and both `edges` and the
  * rank frame hash-partition on the SAME key (`src` resp. `node`), so
  * AQE reuses the exchange where sizes allow; at warehouse scale both
  * sides come pre-bucketed on the node key
  * ([[ScaleOps.writeBucketed]]) and the per-iteration join is
  * exchange-free. The rank frame is `localCheckpoint`-ed every
  * iteration: an iterative DataFrame loop otherwise stacks 10 joins of
  * lineage into one exponential plan (a reliable checkpoint replaces
  * it on a real cluster — shape unchanged, the engine's standard
  * iterative-operator trade, same as `Sampling.curriculumStages`).
  *
  * Dangling mass: nodes with no out-edges leak rank in the naive
  * formulation; here the caller's edge set defines the node universe
  * (every node appears as a src or dst), and nodes WITHOUT out-edges
  * redistribute implicitly through the damping term only — the
  * textbook "simplified" PageRank, which is exactly SQL-replayable
  * (q68's oracle unrolls the iterations; no spectral shortcut could
  * be gated that tightly). */
object GraphOps {

  /** `edges`: two columns (src, dst), assumed DISTINCT pairs. Returns
    * (node, rank) after `iters` damped iterations from the uniform
    * start. Deterministic given the edge set (float sums commute to
    * within ulps; outputs are rounded by the caller's query). */
  def pageRank(spark: SparkSession, edges: DataFrame, srcCol: String,
      dstCol: String, iters: Int, damping: Double): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val n = nodes.count()
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    var ranks = nodes.withColumn("r", lit(1.0 / n)).localCheckpoint()
    var i = 0
    while (i < iters) {
      val contribs = ranks
        .join(outDeg, ranks("node") === outDeg("src"))
        .join(e, "src")
        .select(col("dst").as("node"), (col("r") / col("deg")).as("c"))
        .groupBy("node")
        .agg(sum(col("c")).as("cin"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("cin"), lit(0.0))).as("r"))
        .localCheckpoint()
      i += 1
    }
    ranks
  }
}
