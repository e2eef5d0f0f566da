package graft.operators

import graft.functions.Vec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over embedding columns.
  *
  * Two paths:
  *   - [[bruteForceTopK]]: exact baseline — broadcast the (small) query
  *     set against the corpus; O(N·Q·d) distributed work, no shuffle of
  *     the corpus, one window per query for the top-k.
  *   - [[lshTopK]]: the scale path — random-hyperplane signatures bucket
  *     the corpus; queries probe their own bucket plus all 1-bit
  *     neighbors (multiprobe), so candidate volume is ~N·(nbits+1)/2^nbits
  *     per query instead of N.
  *
  * Cosine is computed as a dot product of pre-normalized vectors: one
  * fused codegen loop per pair.
  */
object Similarity {

  /** Adds `_unit` (normalized embedding). Rows with zero norm are
    * dropped (cosine undefined). */
  def withUnit(df: DataFrame, embCol: String): DataFrame = {
    val emb = Vec.asDouble(col(embCol))
    df.withColumn("_norm", Vec.norm(emb))
      .filter(col("_norm") > 0)
      .withColumn("_unit", transform(emb, x => x / col("_norm")))
      .drop("_norm")
  }

  /** Every (query, corpus) pair scored with exact rounded cosine,
    * self-matches excluded by id: the probe loop [[bruteForceTopK]]
    * and [[rangeSearch]] share. The query side broadcasts, so the
    * corpus never shuffles and the per-pair dot product runs inside
    * the probe's codegen stage; at 100 TB the cost is one corpus scan
    * per query batch. */
  private def scoredPairs(corpus: DataFrame, queries: DataFrame,
      idCol: String, embCol: String, roundTo: Int): DataFrame = {
    val c = withUnit(corpus, embCol)
      .select(col(idCol).as("neighbor_id"), col("_unit").as("u_c"))
    val q = withUnit(queries, embCol)
      .select(col(idCol).as("query_id"), col("_unit").as("u_q"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(Vec.dot(col("u_c"), col("u_q")), roundTo))
  }

  /** Exact range search: every corpus neighbor with cosine ≥
    * `minCosine` for each query row — the radius-query twin of
    * [[bruteForceTopK]], the shape used for "find everything within
    * ε" retrieval and near-dup audits. The threshold filter runs
    * map-side on the scored probe stream, however selective the
    * radius is. */
  def rangeSearch(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, minCosine: Double, roundTo: Int = 6): DataFrame =
    scoredPairs(corpus, queries, idCol, embCol, roundTo)
      .filter(col("cosine") >= minCosine)
      .select(col("query_id"), col("neighbor_id"), col("cosine"))

  /** Exact top-k neighbors for each query row (excluding self-matches
    * by id). Ranking is on cosine rounded to `roundTo` decimals with id
    * as tiebreak — fully deterministic across engines. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, k: Int, roundTo: Int = 6): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scoredPairs(corpus, queries, idCol, embCol, roundTo)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Matryoshka-style truncation audit: how much of each query's exact
    * top-k survives when every vector is cut to its first `prefixDims`
    * dimensions. MRL-trained embeddings promise usable prefixes; this
    * measures the retrieval cost of the cut on an actual corpus before
    * committing the smaller (cheaper to store, faster to scan) width.
    * Output: (query_id, n_overlap, overlap_frac) with n_overlap =
    * |topk_full ∩ topk_prefix|.
    *
    * Scale shape: two broadcast-probe corpus scans (one per width —
    * the corpus itself never shuffles) and a narrow (query_id,
    * neighbor_id) join over 2·k·|queries| rows. At corpus-as-queries
    * scale, swap either [[bruteForceTopK]] for the IVF path and feed
    * the same join. */
  def truncationOverlap(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, k: Int, prefixDims: Int, roundTo: Int = 6): DataFrame = {
    require(prefixDims >= 1, s"prefixDims=$prefixDims must be >= 1")
    def cut(df: DataFrame) =
      df.withColumn(embCol, slice(col(embCol), 1, prefixDims))
    val full = bruteForceTopK(corpus, queries, idCol, embCol, k, roundTo)
    val pref = bruteForceTopK(cut(corpus), cut(queries), idCol, embCol, k, roundTo)
      .select(col("query_id"), col("neighbor_id"))
    full.join(pref.withColumn("_hit", lit(1)),
        Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(col("_hit")).as("n_overlap"))
      .select(col("query_id"), col("n_overlap"),
        round(col("n_overlap").cast("double") / k, 6).as("overlap_frac"))
  }

  /** Maximal-marginal-relevance diversified top-k: the standard RAG
    * re-rank that trades raw relevance for novelty — pick the most
    * relevant candidate, then k−1 times the candidate maximizing
    * λ·rel(c) − (1−λ)·max{sim(c, s) : s already selected}, so
    * near-duplicate results can't crowd the answer set (Carbonell &
    * Goldstein 1998).
    *
    * Scale shape: the corpus is touched exactly twice, both times
    * streaming — once by the broadcast-probe pool build (exact
    * top-`poolSize` per query) and once by a broadcast id-join
    * fetching the pool members' unit vectors. Everything after is
    * bounded by |queries|·poolSize rows: the candidate-pair sim table
    * (poolSize² per query) and k−1 unrolled select rounds, each one
    * narrow join + argmax window partitioned by query. The pool and
    * pair-sim frames are cached via [[OpCaches]] because every round
    * re-reads them. The selection loop builds PLAN depth, never
    * collects — k is a literal, so Catalyst sees one static k-round
    * plan.
    *
    * Determinism: rel and sim are rounded to `roundTo` before any
    * comparison and the argmax tie-breaks on neighbor_id, so the
    * greedy trajectory is engine-replayable (the v35 oracle unrolls
    * the same rounds in SQL). Pass λ as-is; the kernel uses the
    * DOUBLE value of 1−λ, which the oracle must interpolate verbatim
    * (0.7 ⇒ 0.30000000000000004, not 0.3). */
  def mmrTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, k: Int, poolSize: Int, lambda: Double,
      roundTo: Int = 6): DataFrame = {
    require(k >= 1 && poolSize >= k,
      s"need 1 <= k=$k <= poolSize=$poolSize")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda=$lambda in [0,1]")
    val pool = OpCaches.track(
      bruteForceTopK(corpus, queries, idCol, embCol, poolSize, roundTo)
        .select(col("query_id"), col("neighbor_id"), col("cosine").as("rel")))
    val poolIds = pool.select("neighbor_id").distinct()
    val members = withUnit(corpus, embCol)
      .select(col(idCol).as("neighbor_id"), col("_unit"))
      .join(broadcast(poolIds), "neighbor_id")
    val ps = OpCaches.track(
      pool.select(col("query_id"), col("neighbor_id").as("a_id"))
        .join(pool.select(col("query_id"), col("neighbor_id").as("b_id")),
          "query_id")
        .filter(col("a_id") =!= col("b_id"))
        .join(broadcast(members.select(col("neighbor_id").as("a_id"),
          col("_unit").as("_ua"))), "a_id")
        .join(broadcast(members.select(col("neighbor_id").as("b_id"),
          col("_unit").as("_ub"))), "b_id")
        .withColumn("sim", round(Vec.dot(col("_ua"), col("_ub")), roundTo))
        .select(col("query_id"), col("a_id"), col("b_id"), col("sim")))
    // NOT a LoopSession.nonAdaptive loop — measured r16, kept adaptive:
    // the graph-loop treatment (AQE off + derived partitions) read
    // 1.5× SLOWER here in paired same-window probes (pass-2 walls
    // 6.9/7.6 s vs 4.5/5.5 s adaptive at sf0.1) even though it cut
    // jobs 39 → 17, tasks 756 → 112 and halved shuffle bytes: unlike
    // the rank loops' fixed-shape joins, each MMR round joins frames
    // DERIVED from the growing selected set (LogicalRDD-backed, no
    // stats), so the static planner falls back to sort-merge where
    // AQE's runtime size measurement converts every one of them to a
    // broadcast join. The per-exchange AQE jobs are the price of those
    // conversions and worth it.
    val wSel = Window.partitionBy(col("query_id"))
      .orderBy(col("mmr_score").desc, col("neighbor_id"))
    var all = pool
      .withColumn("mmr_score", col("rel"))
      .withColumn("_rn", row_number().over(wSel))
      .filter(col("_rn") === 1)
      .select(col("query_id"), col("neighbor_id"), col("rel"),
        col("mmr_score"), lit(1L).as("sel_round"))
    for (r <- 2 to k) {
      val selIds = all.select(col("query_id"), col("neighbor_id").as("b_id"))
      val maxSim = ps.join(selIds, Seq("query_id", "b_id"))
        .groupBy(col("query_id"), col("a_id"))
        .agg(max(col("sim")).as("_max_sim"))
        .withColumnRenamed("query_id", "_mq")
      val picked = pool
        .join(all.select(col("query_id"), col("neighbor_id"))
          .withColumn("_sel", lit(1)), Seq("query_id", "neighbor_id"), "left")
        .filter(col("_sel").isNull)
        .join(maxSim, col("query_id") === col("_mq") &&
          col("neighbor_id") === col("a_id"))
        .drop("_mq", "a_id", "_sel")
        .withColumn("mmr_score", round(
          lit(lambda) * col("rel") - lit(1.0 - lambda) * col("_max_sim"),
          roundTo))
        .withColumn("_rn", row_number().over(wSel))
        .filter(col("_rn") === 1)
        .select(col("query_id"), col("neighbor_id"), col("rel"),
          col("mmr_score"), lit(r.toLong).as("sel_round"))
      // localCheckpoint keeps the plan LINEAR in k: each round reads
      // `all` three times (exclusion join, selected-sim join, union),
      // so chaining raw plans grows the tree ~3^k — k=12 would hang
      // Catalyst analysis before any executor work. Materializing the
      // (|queries|·r)-row frame per round truncates the lineage; the
      // content is deterministic (rounded scores, id tie-breaks), so
      // checkpointing changes cost, never results.
      all = IterTrace.record("mmr_round", all.unionByName(picked))
        .localCheckpoint(false) // lazy (Bpe.encode discipline): still truncates
      // the 3^k lineage, but folds each round's materialization into the
      // caller's one action instead of one scheduled job per round
    }
    all.select(col("query_id"), col("sel_round"), col("neighbor_id"),
      col("rel"), col("mmr_score"))
  }

  /** One-bit (sign) signature of an embedding, bitpacked into a single
    * long: bit i is set iff component i is strictly positive (the v03
    * convention — `> 0` on both engines). Normalization never flips a
    * sign, so the signature of the raw vector equals the unit
    * vector's. Built with a zip against the 64 power-of-two literals —
    * no variable shifts, one codegen'd fold per row; each power is
    * added at most once, so the fold cannot overflow (bit 63 is
    * Long.MinValue by design). Supports dims ≤ 64 (this table is
    * 64-wide); wider embeddings need an array-of-longs signature. */
  def signBits(vec: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val powers = array((0 until 64).map(i => lit(1L << i)): _*)
    val packed = aggregate(
      zip_with(Vec.asDouble(vec), powers,
        (x, p) => when(x > 0, p).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
    // Enforce the dims<=64 contract loudly: zip_with pads the shorter
    // side with null, so a 65-wide vector would otherwise fold to a
    // silent NULL signature and poison every Hamming distance
    // downstream instead of failing the job.
    when(size(vec) <= 64, packed).otherwise(raise_error(concat(
      lit("signBits supports dims <= 64; got dim="), size(vec).cast("string"),
      lit(" — use an array-of-longs signature for wider embeddings"))))
  }

  /** Binary-quantization retrieval audit: for each query, the overlap
    * between the exact cosine top-k and the top-k under Hamming
    * distance on 1-bit sign signatures — the measurement that says
    * whether 64× compression (one long per vector) retains enough
    * ranking signal for a coarse first pass. Output per query:
    * (query_id, n_overlap, sum_hamming) — all integers, so the audit
    * hashes exactly across engines; Hamming ties break on neighbor_id
    * (integer metric, no float tie risk at all on the binary side).
    *
    * Scale shape: signatures reduce each vector to 8 BYTES at the
    * scan, the query side broadcasts, and the Hamming scan is one
    * xor+popcount per pair inside codegen — the corpus never
    * shuffles. The exact side reuses [[bruteForceTopK]] (the audit
    * needs ground truth by definition); production retrieval would
    * run the binary pass alone as the candidate generator. */
  def binarySignOverlap(corpus: DataFrame, queries: DataFrame,
      idCol: String, embCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      signBits(col(embCol)).as("sig_c"))
    val q = queries.select(col(idCol).as("query_id"),
      signBits(col(embCol)).as("sig_q"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming").asc, col("neighbor_id"))
    val btopk = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("hamming",
        bit_count(col("sig_q").bitwiseXOR(col("sig_c"))).cast("long"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("hamming"))
    val etopk = bruteForceTopK(corpus, queries, idCol, embCol, k)
      .select(col("query_id"), col("neighbor_id"))
    btopk.join(etopk.withColumn("_hit", lit(1)),
        Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(col("_hit")).as("n_overlap"),
        sum(col("hamming")).as("sum_hamming"))
  }

  /** Two-stage retrieval: binary-Hamming candidate generation followed
    * by an exact cosine rerank of only the surviving candidates — the
    * standard production shape (bit-sliced first pass, float second
    * pass) that [[binarySignOverlap]] audits the first stage of. Per
    * query: top-`nCandidates` corpus rows by (hamming, id) over packed
    * sign signatures, then exact rounded-cosine top-`k` within that
    * candidate set.
    *
    * Scale shape: stage 1 is the signature scan — queries broadcast,
    * corpus never shuffles, xor+popcount in codegen; its window
    * shuffles only (query_id, neighbor_id, hamming) triples, never
    * vectors. Stage 2 re-joins the narrow candidate list (|Q|·C rows,
    * broadcast) back to the corpus BY ID, so full-width vectors are
    * only read for the ~C/N fraction of the corpus that survived the
    * bit pass — that read-avoidance is the entire point of the
    * architecture. Output: (query_id, rank, neighbor_id, cosine,
    * hamming), k rows per query. */
  def rerankTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, k: Int, nCandidates: Int,
      roundTo: Int = 6): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(nCandidates >= k, s"nCandidates=$nCandidates must be >= k=$k")
    val c = corpus.select(col(idCol).as("neighbor_id"),
      signBits(col(embCol)).as("sig_c"))
    val q = queries.select(col(idCol).as("query_id"),
      signBits(col(embCol)).as("sig_q"))
    val wh = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming").asc, col("neighbor_id"))
    val cands = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("hamming",
        bit_count(col("sig_q").bitwiseXOR(col("sig_c"))).cast("long"))
      .withColumn("_crk", row_number().over(wh))
      .filter(col("_crk") <= nCandidates)
      .select(col("query_id"), col("neighbor_id"), col("hamming"))
    val cu = withUnit(corpus, embCol)
      .select(col(idCol).as("neighbor_id"), col("_unit").as("u_c"))
    val qu = withUnit(queries, embCol)
      .select(col(idCol).as("query_id"), col("_unit").as("u_q"))
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cu.join(broadcast(cands), Seq("neighbor_id"))
      .join(broadcast(qu), Seq("query_id"))
      .withColumn("cosine", round(Vec.dot(col("u_c"), col("u_q")), roundTo))
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("cosine"), col("hamming"))
  }

  /** Recall-vs-candidate-depth sweep for the two-stage binary
    * pipeline — [[ivfRecallSweep]]'s twin for [[rerankTopK]]: how deep
    * must the bit-pass candidate list be before the reranked top-k
    * recovers the exact top-k? The knob an index team turns before
    * committing a C, traded against the C/N fraction of full-width
    * vectors the rerank re-reads.
    *
    * One Hamming scan ranked to max(C), one exact rescore of that
    * candidate set, and one brute-force ground truth are shared by
    * every sweep point (OpCaches memoizes the scored frame); each
    * point adds only a filter + top-k window + narrow hit join.
    * Reported recall is the exact rational n_hits / (k·|Q|) in integer
    * ppm — no float accumulation to drift. Recall is non-decreasing in
    * C and exactly 1.0 at C = |corpus|−1 (exhaustive candidates =
    * brute force; both pinned in SimilaritySpec). */
  def rerankRecallSweep(corpus: DataFrame, queries: DataFrame,
      idCol: String, embCol: String, k: Int, nCandidates: Seq[Int],
      roundTo: Int = 6): DataFrame = {
    require(nCandidates.nonEmpty && nCandidates.forall(_ >= k),
      s"nCandidates=$nCandidates must all be >= k=$k")
    val cmax = nCandidates.max
    val truth = bruteForceTopK(corpus, queries, idCol, embCol, k, roundTo)
      .select(col("query_id"), col("neighbor_id"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      signBits(col(embCol)).as("sig_c"))
    val q = queries.select(col(idCol).as("query_id"),
      signBits(col(embCol)).as("sig_q"))
    val wh = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming").asc, col("neighbor_id"))
    val cands = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("hamming",
        bit_count(col("sig_q").bitwiseXOR(col("sig_c"))).cast("long"))
      .withColumn("_crk", row_number().over(wh))
      .filter(col("_crk") <= cmax)
      .select(col("query_id"), col("neighbor_id"), col("_crk"))
    val cu = withUnit(corpus, embCol)
      .select(col(idCol).as("neighbor_id"), col("_unit").as("u_c"))
    val qu = withUnit(queries, embCol)
      .select(col(idCol).as("query_id"), col("_unit").as("u_q"))
    val scored = OpCaches.track(
      cu.join(broadcast(cands), Seq("neighbor_id"))
        .join(broadcast(qu), Seq("query_id"))
        .withColumn("cosine",
          round(Vec.dot(col("u_c"), col("u_q")), roundTo))
        .select(col("query_id"), col("neighbor_id"), col("_crk"),
          col("cosine")))
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    val per = nCandidates.map { cN =>
      scored.filter(col("_crk") <= cN)
        .withColumn("rank", row_number().over(wr))
        .filter(col("rank") <= k)
        .join(truth.withColumn("_hit", lit(1)),
          Seq("query_id", "neighbor_id"), "left")
        .agg(count(col("_hit")).as("n_hits"),
          (countDistinct(col("query_id")) * lit(k.toLong)).as("_denom"))
        .select(lit(cN.toLong).as("n_candidates"), col("n_hits"),
          round(col("n_hits").cast("double") / col("_denom") * 1e6)
            .cast("long").as("recall_ppm"))
    }
    per.reduce(_ unionByName _)
  }

  /** IVF recall-vs-nprobe sweep: for each candidate `nprobe`, the
    * average recall@k of [[IvfIndex.ivfTopK]] against the exact
    * [[bruteForceTopK]] ground truth — the audit that picks the probe
    * knob before committing an index configuration. Deterministic end
    * to end (deterministic k-means, rounded-cosine/id tie-breaks), so
    * recall is non-decreasing in nprobe and exactly 1.0 at
    * nprobe = nlist (exhaustive probing = brute force; both pinned in
    * SimilaritySpec). The ground truth and the IVF index build once
    * (OpCaches memoizes the cell-assigned corpus across probe
    * settings); each sweep point adds only the probe join + a
    * per-query set intersection.
    *
    * `model`, when supplied, replaces the trained k-means centroids
    * (e.g. [[IvfIndex.parityModel]] for an SQL-replayable sweep — the
    * v18 gate); None keeps the trained production path. The reported
    * recall is the exact rational total_hits / (k · n_queries) — a
    * single integer division on both engines, immune to float
    * accumulation-order drift (equal to the mean of per-query recalls,
    * since ground truth has exactly k rows per query). */
  def ivfRecallSweep(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, k: Int, nlist: Int, nprobes: Seq[Int],
      roundTo: Int = 6, model: Option[IvfIndex.Model] = None): DataFrame = {
    require(nprobes.nonEmpty && nprobes.forall(p => p >= 1 && p <= nlist),
      s"nprobes=$nprobes must be within [1, nlist=$nlist]")
    val truth = bruteForceTopK(corpus, queries, idCol, embCol, k, roundTo)
      .select(col("query_id"), col("neighbor_id"))
    val m = model.getOrElse(IvfIndex.train(corpus, embCol, nlist))
    val perProbe = nprobes.map { p =>
      IvfIndex.ivfTopKWithModel(corpus, queries, idCol, embCol, k, m, p, roundTo)
        .select(col("query_id"), col("neighbor_id"))
        .join(truth.withColumn("_hit", lit(1)),
          Seq("query_id", "neighbor_id"), "left")
        .agg(round(count(col("_hit")).cast("double") /
          (countDistinct(col("query_id")) * k), roundTo).as("avg_recall"))
        .select(lit(p).as("nprobe"), col("avg_recall"))
    }
    perProbe.reduce(_ unionByName _)
  }

  /** Exact euclidean (L2) top-k — the metric twin of [[bruteForceTopK]]
    * for embeddings whose magnitude carries signal (cosine discards it).
    * Same scale shape: the query side broadcasts, the corpus never
    * shuffles, one window per query for the top-k. The distance is the
    * [[Vec.l2]] fused-loop kernel — Σ(x−y)² left-to-right then √, the
    * same association order reference implementations use, so rounded
    * outputs agree with an external oracle bit-for-bit. */
  def euclideanTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, k: Int, roundTo: Int = 6): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      Vec.asDouble(col(embCol)).as("e_c"))
    val q = queries.select(col(idCol).as("query_id"),
      Vec.asDouble(col(embCol)).as("e_q"))
    val dist = Vec.l2(col("e_c"), col("e_q"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("l2"), col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("l2", round(dist, roundTo))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("l2"))
  }

  /** Exact maximum-inner-product top-k (MIPS) — the retrieval metric of
    * recommender/two-tower models, where vector magnitude IS the signal
    * (popular items have long embeddings; cosine would erase that).
    * Same scale shape as [[bruteForceTopK]]: broadcast probes, corpus
    * never shuffles. For the approximate path, reduce MIPS to cosine
    * with [[augmentForMips]] and reuse any cosine index. */
  def mipsTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, k: Int, roundTo: Int = 6): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      Vec.asDouble(col(embCol)).as("e_c"))
    val q = queries.select(col(idCol).as("query_id"),
      Vec.asDouble(col(embCol)).as("e_q"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("ip").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("ip", round(Vec.dot(col("e_c"), col("e_q")), roundTo))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("ip"))
  }

  /** The MIPS → cosine reduction (Bachrach et al., RecSys 2014): append
    * one dimension holding √(M² − ‖x‖²) to every corpus vector (M ≥ the
    * max corpus norm) and a 0 to every query. All augmented corpus
    * vectors then share norm M, so cosine against an augmented query
    * ranks exactly by inner product — any cosine ANN structure in this
    * file ([[lshTopK]], IVF, PQ) becomes a MIPS index unchanged.
    * Map-side: one expression per row, no shuffle. Pass `isQuery=true`
    * for the probe side (appends the 0).
    *
    * The reduction's exactness guarantee REQUIRES `maxNorm` ≥ every
    * corpus norm. By default (`strict=true`) a row whose norm exceeds
    * `maxNorm` fails the job with a clear error rather than silently
    * clamping √(M²−‖x‖²) to 0 — a clamped row would still rank, just
    * subtly wrongly. Pass `strict=false` only when an approximate
    * cap is intentional (the clamp then applies, documented here). */
  def augmentForMips(df: DataFrame, embCol: String, maxNorm: Double,
      isQuery: Boolean = false, outCol: String = "_aug",
      strict: Boolean = true): DataFrame = {
    val e = Vec.asDouble(col(embCol))
    val normSq = Vec.dot(e, e)
    val slackSq = lit(maxNorm * maxNorm) - normSq
    // tolerance: maxNorm computed as sqrt(max ‖x‖²) re-squares to a
    // value a few ulps off; only a GENUINE excess should fail
    val tol = 1e-9 * math.max(maxNorm * maxNorm, 1.0)
    val extra =
      if (isQuery) lit(0.0)
      else if (strict) when(slackSq < -tol, raise_error(concat(
          lit(s"augmentForMips: corpus vector norm² = "), normSq,
          lit(s" exceeds maxNorm² = ${maxNorm * maxNorm}; the MIPS ranking " +
            "guarantee needs maxNorm ≥ max corpus norm (or pass strict=false " +
            "to clamp)")))).otherwise(sqrt(greatest(lit(0.0), slackSq)))
      else sqrt(greatest(lit(0.0), slackSq))
    df.withColumn(outCol, concat(e, array(extra)))
  }

  /** Hard cap on [[topPairs]] input size: the all-pairs join is O(N²)
    * by construction, so pointing it at an unbounded corpus is always a
    * mistake — [[lshNearDupPairs]] is the scale path. */
  val TopPairsMaxRows = 100000L

  /** Top `limit` most-similar pairs (a < b) — exact, for bounded corpora
    * or within-bucket refinement. Enforces its bounded-corpus contract
    * with an eager row-count probe (one cheap count job): an input
    * larger than `maxRows` fails fast with a pointer to the linear
    * alternative instead of launching a quadratic join. */
  def topPairs(df: DataFrame, idCol: String, embCol: String, limit: Int,
      roundTo: Int = 6, maxRows: Long = TopPairsMaxRows): DataFrame = {
    val n = df.count()
    require(n <= maxRows,
      s"topPairs is an exact all-pairs O(N²) baseline, capped at maxRows=$maxRows " +
        s"rows (got $n). For large corpora use Similarity.lshNearDupPairs " +
        "(banded LSH candidates + exact verify) instead.")
    val u = withUnit(df, embCol)
    val l = u.select(col(idCol).as("a"), col("_unit").as("u_a"))
    val r = u.select(col(idCol).as("b"), col("_unit").as("u_b"))
    l.join(r, col("a") < col("b"))
      .select(col("a"), col("b"), round(Vec.dot(col("u_a"), col("u_b")), roundTo).as("cosine"))
      .orderBy(col("cosine").desc, col("a"), col("b"))
      .limit(limit)
  }

  /** Cosine-similarity distribution over a deterministic sample of
    * vector pairs — the embedding-space health check a dataset card
    * wants (a healthy space has most random-pair mass near 0; a
    * collapsed one piles up near 1). Each side is an independent
    * md5-deviate sample (salts `:a`/`:b` decorrelate them from each
    * other and from every other md5-keyed sampler), so the pair budget
    * is |A|·|B| ≈ fracA·fracB·N² — callers pick fractions ~ √budget/N;
    * the sampled sides are bounded and the smaller broadcasts, the
    * corpus itself never shuffles. Buckets are floor(cosine·10) over
    * the 6-dp-rounded score, so the cut is engine-deterministic;
    * avg_cosine is reported at 4 dp (a mean over up to the full pair
    * budget — 6 dp would expose accumulation-order noise). */
  def cosineHistogram(df: DataFrame, idCol: String, embCol: String,
      fracA: Double, fracB: Double): DataFrame = {
    def side(salt: String, frac: Double) =
      withUnit(df.filter(graft.operators.Sampling.md5Unit(
        concat(col(idCol).cast("string"), lit(salt))) < frac), embCol)
    val a = side(":a", fracA)
      .select(col(idCol).as("_ia"), col("_unit").as("u_a"))
    val b = side(":b", fracB)
      .select(col(idCol).as("_ib"), col("_unit").as("u_b"))
    a.join(broadcast(b), col("_ia") < col("_ib"))
      .select(round(Vec.dot(col("u_a"), col("u_b")), 6).as("_c"))
      .groupBy(floor(col("_c") * 10).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        round(avg(col("_c")), 4).as("avg_cosine"))
  }

  /** All pairs (a < b) with cosine ≥ `threshold` — the linear-shuffle
    * near-dup path: banded hyperplane-LSH candidate generation + exact
    * dot-product verification.
    *
    * Each vector gets `bands` independent `bandBits`-bit signatures; a
    * pair becomes a candidate iff some band's signature matches exactly
    * (equi-join on (band, sig) — never an all-pairs join). Verification
    * re-joins unit vectors for candidates only, so the wide vectors stay
    * off the band shuffle. Output is EXACT w.r.t. the threshold on the
    * verified side; the LSH stage can only miss, with probability
    * (1 - p^bandBits)^bands per pair, p = 1 - arccos(cos)/π. Defaults
    * (12 bits × 128 bands): a pair at cosine 0.90 is missed with
    * p < 5e-10, while an unrelated pair (cosine ≈ 0) survives to
    * verification with p ≈ 3% — tune `bandBits` up (and `bands` with
    * it) to sharpen the filter for very large corpora. */
  def lshNearDupPairs(df: DataFrame, idCol: String, embCol: String,
      threshold: Double, bandBits: Int = 12, bands: Int = 128,
      seed: Long = 42L, roundTo: Int = 6): DataFrame = {
    // headOption: an empty corpus has no dimension to read and nothing
    // to pair — dim=1 keeps the (empty) plan well-formed
    val dim = df.select(size(col(embCol))).head(1).headOption
      .map(_.getInt(0)).getOrElse(1)
    val units = OpCaches.track(withUnit(df, embCol)
      .select(col(idCol).as("_id"), col("_unit")))
    // (id, band, signature) triples — three narrow columns per row; one
    // kernel computes all bands' signatures (no plane literals: the
    // bands×bits 64-double arrays made 8+ MiB task binaries)
    val sigs = units.select(col("_id"),
      posexplode(graft.functions.HashExpressions
        .banded_hyperplane_sigs(col("_unit"), bandBits, bands, dim, seed + 7000))
        .as(Seq("_band", "_sig")))
    val cand = sigs.select(col("_id").as("a"), col("_band"), col("_sig"))
      .join(sigs.select(col("_id").as("b"), col("_band"), col("_sig")), Seq("_band", "_sig"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
      .distinct() // a pair may collide in several bands
    cand
      .join(units.select(col("_id").as("a"), col("_unit").as("u_a")), "a")
      .join(units.select(col("_id").as("b"), col("_unit").as("u_b")), "b")
      .withColumn("cosine", round(Vec.dot(col("u_a"), col("u_b")), roundTo))
      .filter(col("cosine") >= threshold)
      .select(col("a"), col("b"), col("cosine"))
  }

  /** LSH-bucketed approximate top-k: `tables` independent hyperplane
    * signatures key the corpus; each query probes, per table, its own
    * bucket plus all 1-bit flips (multiprobe). Candidate volume per
    * query ≈ N · tables · (nbits+1) / 2^nbits; recall per neighbor is
    * 1-(1-p)^tables where p is the per-table probe hit rate. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, k: Int, nbits: Int = 12, tables: Int = 4,
      seed: Long = 42L, roundTo: Int = 6,
      md5Parity: Boolean = false): DataFrame = {
    val dim = corpus.select(size(col(embCol))).head(1).headOption
      .map(_.getInt(0)).getOrElse(1) // empty corpus → empty result, no crash
    // one kernel call emits every table's signature (planes derived
    // from the seed per executor — no plane literals in the plan);
    // `md5Parity` swaps Gaussian planes for md5-derived ones an
    // external SQL engine reproduces (the v03 gate; recall specs keep
    // the Gaussian production path)
    def sigs(unit: org.apache.spark.sql.Column) =
      graft.functions.HashExpressions.banded_hyperplane_sigs(
        unit, nbits, tables, dim, seed, md5Parity)
    // materialize units before the tables*nbits plane dots (else the
    // normalization expression re-evaluates inside every dot product)
    val cUnits = OpCaches.track(withUnit(corpus, embCol)
      .select(col(idCol).as("neighbor_id"), col("_unit").as("u_c")))
    // signatures only — the unit vector does not ride through the
    // bands×corpus explode (it re-joins after candidate dedup)
    val c = cUnits
      .select(col("neighbor_id"), posexplode(sigs(col("u_c"))).as(Seq("_t", "_sig")))
    // multiprobe masks: own bucket + every 1-bit neighbor bucket
    val masks = lit(0L) +: (0 until nbits).map(b => lit(1L << b))
    val qUnits = OpCaches.track(withUnit(queries, embCol)
      .select(col(idCol).as("query_id"), col("_unit").as("u_q")))
    val qBase = qUnits
      .select(col("query_id"), posexplode(sigs(col("u_q"))).as(Seq("_t", "_sigq")))
    val q = qBase.select(col("query_id"), col("_t"),
      explode(array(masks.map(m => col("_sigq").bitwiseXOR(m)): _*)).as("_sig"))
    // dedup collisions on the NARROW id pair, then re-join the vectors:
    // the distinct shuffle moves two longs per candidate, not two
    // full-dimension unit vectors
    val pairs = c.join(q, Seq("_t", "_sig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct() // a pair may collide in several tables/probes
    val scored = pairs
      .join(cUnits, "neighbor_id")
      .join(broadcast(qUnits), "query_id")
      .withColumn("cosine", round(Vec.dot(col("u_c"), col("u_q")), roundTo))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }
}
