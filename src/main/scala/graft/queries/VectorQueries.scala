package graft.queries

import graft.{GraftQuery, Tables}
import graft.operators.{IvfIndex, PqIndex, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Similarity-search query surface over the `embeddings` table
  * (array<float>, dim 64): exact brute-force cosine top-k as the
  * baseline, LSH-bucketed ANN as the scale path, near-dup detection
  * over planted perturbed vectors.
  */
object VectorQueries {

  /** SQL mirror of the parity-IVF prelude (unit corpus, smallest-id
    * centroids, cell scores, engine-tie-broken assignment and probes) —
    * shared by the v05/v08/v15/v18 oracles so the tie-break-sensitive
    * lines exist ONCE (the d03 `shingleCteSql` precedent). The engine
    * contract mirrored here: [[graft.operators.IvfIndex.parityModel]]
    * centroids are the 16 smallest ids' unit vectors; cell ranking is
    * the lexicographic (d, i) struct max/sort, where equal scores pick
    * the LARGER index → `ORDER BY d DESC, i DESC`. The cell score `d`
    * feeds that ranking UNROUNDED, so it must replay the engine's
    * float op sequence exactly: normalize each vector once
    * (x / sqrt(Σx²), the `Similarity.withUnit` sequence), then a plain
    * inner product of pre-normalized units — NOT
    * `list_cosine_similarity` over raw vectors, whose different op
    * order could flip a near-tied cell assignment on regenerated
    * testdata. `uCols` lets a caller carry extra columns (v15 needs
    * `label`); `queryPred` bounds the probe side's query set; `nprobe`
    * its cells. */
  private def parityIvfCteSql(uCols: String, queryPred: String,
      nprobe: Int): String =
    ivfCteSql(uCols, queryPred, nprobe,
      """SELECT row_number() OVER (ORDER BY vec_id) - 1 AS i, pe AS ce
        FROM (SELECT vec_id, pe FROM pun ORDER BY vec_id LIMIT 16)""")

  /** The IVF prelude with a caller-supplied centroid CTE body — shared
    * by the parity oracles (centroids rebuilt from the corpus) and the
    * TRAINED oracles (centroids interpolated as literal doubles from
    * the model the query run just trained; see [[TrainedModels]]). */
  private def ivfCteSql(uCols: String, queryPred: String,
      nprobe: Int, centSql: String): String =
    s"""u AS (
        SELECT $uCols FROM embeddings),
      pun AS (
        SELECT vec_id,
          list_transform(e, x -> x / sqrt(list_inner_product(e, e))) AS pe
        FROM u),
      cent AS (
        $centSql),
      score AS (
        SELECT v.vec_id, c.i, list_inner_product(v.pe, c.ce) AS d
        FROM pun v CROSS JOIN cent c),
      assign AS (
        SELECT vec_id, i AS cell FROM (
          SELECT vec_id, i, row_number() OVER (PARTITION BY vec_id
            ORDER BY d DESC, i DESC) AS rk FROM score)
        WHERE rk = 1),
      probe AS (
        SELECT vec_id AS query_id, i AS cell FROM (
          SELECT vec_id, i, row_number() OVER (PARTITION BY vec_id
            ORDER BY d DESC, i DESC) AS rk FROM score
          WHERE $queryPred)
        WHERE rk <= $nprobe)"""

  // --- v01: exact cosine top-k ----------------------------------------
  private val v01 = GraftQuery(
    "v01_cosine_topk",
    (s, d) => {
      val emb = Tables(s, d, "embeddings")
      Similarity.bruteForceTopK(
          emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },
    Some("""WITH u AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          round(list_cosine_similarity(q.e, c.e), 6) AS cosine
        FROM u q, u c WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id)
    SELECT query_id, rank, neighbor_id, cosine FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY cosine DESC, neighbor_id) AS rank FROM pairs)
    WHERE rank <= 5 ORDER BY query_id, rank"""),
    bench = true)

  // --- v02: globally most-similar pairs -------------------------------
  private val v02 = GraftQuery(
    "v02_similar_pairs",
    (s, d) =>
      Similarity.topPairs(Tables(s, d, "embeddings"), "vec_id", "embedding", limit = 20),
    Some("""WITH u AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
    SELECT a.vec_id AS a, b.vec_id AS b,
      round(list_cosine_similarity(a.e, b.e), 6) AS cosine
    FROM u a, u b WHERE a.vec_id < b.vec_id
    ORDER BY cosine DESC, a, b LIMIT 20"""))

  // --- v03: LSH-bucketed ANN (scale path). The gate runs md5-parity
  //     hyperplanes — plane component (t, j, i) is the centered
  //     md5-uniform of "t:j:i", which the oracle rebuilds bit-for-bit —
  //     so signature computation, the own-bucket + 1-bit-flip
  //     multiprobe, candidate dedup, and the exact re-rank all replay
  //     as SQL (the d04/v05 parity pattern); Gaussian planes stay the
  //     production path with recall pinned in SimilaritySpec. Sign
  //     bits use strict `> 0` on both engines; the plane dot's float
  //     accumulation-order drift only matters within ~1e-13 of zero —
  //     ten orders below the dot's scale.
  private val v03 = GraftQuery(
    "v03_ann_lsh",
    (s, d) => {
      val emb = Tables(s, d, "embeddings")
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5), "vec_id",
          "embedding", k = 5, nbits = 6, md5Parity = true)
        .orderBy("query_id", "rank")
    },
    Some("""WITH u0 AS (
        SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      un AS (
        SELECT vec_id,
          list_transform(e, x -> x / sqrt(list_inner_product(e, e))) AS ue
        FROM u0),
      pl AS (
        SELECT t.t, j.j, i.i,
          ('0x' || substr(md5(t.t || ':' || j.j || ':' || i.i), 1, 8))::UBIGINT
            / 4294967296.0 - 0.5 AS w
        FROM (SELECT unnest(range(0, 4)) AS t) t
        CROSS JOIN (SELECT unnest(range(0, 6)) AS j) j
        CROSS JOIN (SELECT unnest(range(0, 64)) AS i) i),
      acc AS (
        SELECT v.vec_id, p.t, p.j, sum(v.ue[p.i + 1] * p.w) AS a
        FROM un v CROSS JOIN pl p
        GROUP BY 1, 2, 3),
      sig AS (
        SELECT vec_id, t,
          sum(CASE WHEN a > 0 THEN CAST(1 AS BIGINT) << j
            ELSE CAST(0 AS BIGINT) END) AS s
        FROM acc GROUP BY 1, 2),
      probes AS (
        SELECT q.vec_id AS query_id, q.t,
          CASE WHEN m.m < 0 THEN q.s
            ELSE xor(q.s, CAST(1 AS BIGINT) << m.m) END AS ps
        FROM (SELECT * FROM sig WHERE vec_id < 5) q
        CROSS JOIN (SELECT unnest(range(-1, 6)) AS m) m),
      cand AS (
        SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id
        FROM probes p JOIN sig c ON c.t = p.t AND c.s = p.ps
        WHERE c.vec_id <> p.query_id),
      scored AS (
        SELECT c.query_id, c.neighbor_id,
          round(list_cosine_similarity(q.e, n.e), 6) AS cosine
        FROM cand c
        JOIN u0 q ON q.vec_id = c.query_id
        JOIN u0 n ON n.vec_id = c.neighbor_id)
      SELECT query_id, rank, neighbor_id, cosine FROM (
        SELECT query_id, neighbor_id, cosine, CAST(row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INTEGER)
          AS rank
        FROM scored)
      WHERE rank <= 5 ORDER BY query_id, rank"""),
    bench = true)

  // --- v04: embedding near-dup detection over planted perturbations ---
  private val v04 = GraftQuery(
    "v04_embedding_neardup",
    (s, d) => {
      val emb = Tables(s, d, "embeddings")
      val perturbed = emb.filter(col("vec_id") < 5)
        .select((col("vec_id") + 1000000).as("vec_id"),
          expr("transform(sequence(1, 64), i -> " +
            "CAST(element_at(embedding, i) AS DOUBLE) + " +
            "0.1 * CAST(element_at(embedding, 65 - i) AS DOUBLE))").as("embedding"))
      val all = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
        .unionByName(perturbed)
      // banded-LSH candidates + exact verify — same output as the
      // all-pairs oracle at this threshold (miss p < 5e-10 per true
      // pair), but a linear (band, sig) equi-join instead of O(N²)
      Similarity.lshNearDupPairs(all, "vec_id", "embedding", threshold = 0.9)
        .orderBy("a", "b")
    },
    Some("""WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000,
        list_transform(generate_series(1, 64),
          i -> CAST(embedding[i] AS DOUBLE) + 0.1 * CAST(embedding[65 - i] AS DOUBLE))
      FROM embeddings WHERE vec_id < 5)
    SELECT a.vec_id AS a, b.vec_id AS b,
      round(list_cosine_similarity(a.e, b.e), 6) AS cosine
    FROM base a, base b
    WHERE a.vec_id < b.vec_id
      AND round(list_cosine_similarity(a.e, b.e), 6) >= 0.9
    ORDER BY a, b"""))

  // --- v05: IVF-probed ANN (approximate by design; the registry gate
  //     runs parity centroids — unit vectors of the 16 smallest ids —
  //     so the oracle replays cell assignment, probing, and the
  //     candidate top-k as plain SQL; trained k-means recall is pinned
  //     in IvfWinnowSpec, the v15 split-contract pattern) -------------
  private val v05 = GraftQuery(
    "v05_ann_ivf",
    (s, d) => {
      val emb = Tables(s, d, "embeddings")
      graft.operators.IvfIndex.ivfTopKWithModel(
          emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 5,
          graft.operators.IvfIndex.parityModel(emb, "vec_id", "embedding", 16),
          nprobe = 4)
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH ${parityIvfCteSql("vec_id, embedding::DOUBLE[] AS e",
        "vec_id < 5", nprobe = 4)},
      cand AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
          round(list_cosine_similarity(q.e, n.e), 6) AS cosine
        FROM probe p
        JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
        JOIN u q ON q.vec_id = p.query_id
        JOIN u n ON n.vec_id = a.vec_id)
      SELECT query_id, rank, neighbor_id, cosine FROM (
        SELECT query_id, neighbor_id, cosine, CAST(row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INTEGER)
          AS rank
        FROM cand)
      WHERE rank <= 5 ORDER BY query_id, rank"""),
    bench = true)

  // --- v06: int8 symmetric quantization -------------------------------
  // Per-vector scale = max|x|/127; codes are round(x/scale). The scale
  // is materialized as its own projection column first, so the lambda
  // references an attribute — not a re-evaluated sub-expression — and
  // each row computes it once (the HOF-lambda re-evaluation trap).
  // Integer outputs (sum of codes, saturation count) hash exactly; the
  // only float reported is the 6-dp scale.
  private val v06 = GraftQuery(
    "v06_embedding_quantize",
    (s, d) => {
      val e = col("embedding").cast("array<double>")
      Tables(s, d, "embeddings")
        .filter(col("vec_id") < 50)
        .withColumn("_scale", array_max(transform(e, x => abs(x))) / lit(127.0))
        .withColumn("_q",
          transform(e, x => round(x / col("_scale")).cast("long")))
        .select(col("vec_id"),
          round(col("_scale"), 6).as("scale"),
          aggregate(col("_q"), lit(0L), (acc, x) => acc + x).as("sum_q"),
          size(filter(col("_q"), x => abs(x) === 127)).cast("long").as("n_sat"))
        .orderBy("vec_id")
    },
    Some("""WITH b AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id < 50),
    s AS (
      SELECT vec_id, e,
        list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
      FROM b),
    q AS (
      SELECT vec_id, scale,
        list_transform(e, x -> CAST(round(x / scale) AS BIGINT)) AS qv
      FROM s)
    SELECT vec_id, round(scale, 6) AS scale,
      CAST(list_sum(qv) AS BIGINT) AS sum_q,
      len(list_filter(qv, x -> abs(x) = 127)) AS n_sat
    FROM q ORDER BY vec_id"""))

  // --- v07: product-quantization ADC top-k. Approximate by design;
  //     the gate runs parity codebooks (sub-slices of the 16 smallest
  //     ids' unit vectors) so the oracle replays encode — the engine's
  //     argmax of 2·dot − ‖c‖² per subspace, ties to the lowest
  //     centroid — the ADC sum, the k·rerankFactor cut, and the exact
  //     re-rank as SQL; trained-codebook recall + compression stay
  //     pinned in PqSpec (the v15 split-contract pattern) -------------
  private val v07 = GraftQuery(
    "v07_ann_pq",
    (s, d) => {
      val emb = Tables(s, d, "embeddings")
      graft.operators.PqIndex.pqTopK(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 5, m = 16, nCentroids = 16,
          model0 = Some(graft.operators.PqIndex.parityModel(
            emb, "vec_id", "embedding", m = 16, k = 16)))
        .orderBy("query_id", "rank")
    },
    Some("""WITH u AS (
        SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      un AS (
        SELECT vec_id,
          list_transform(e, x -> x / sqrt(list_inner_product(e, e))) AS ue
        FROM u),
      cb AS (
        SELECT s.s, c.j, c.ue[s.s * 4 + 1 : s.s * 4 + 4] AS cs
        FROM (SELECT unnest(range(0, 16)) AS s) s
        CROSS JOIN (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, ue
          FROM (SELECT vec_id, ue FROM un ORDER BY vec_id LIMIT 16)) c),
      enc AS (
        SELECT vec_id, s, j AS code FROM (
          SELECT v.vec_id, c.s, c.j, row_number() OVER (
              PARTITION BY v.vec_id, c.s
              ORDER BY 2 * list_inner_product(v.ue[c.s * 4 + 1 : c.s * 4 + 4], c.cs)
                - list_inner_product(c.cs, c.cs) DESC, c.j) AS rk
          FROM un v CROSS JOIN cb c)
        WHERE rk = 1),
      adc AS (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
          round(sum(list_inner_product(
            q.ue[e.s * 4 + 1 : e.s * 4 + 4], c.cs)), 6) AS approx_cosine
        FROM (SELECT * FROM un WHERE vec_id < 5) q
        JOIN enc e ON e.vec_id <> q.vec_id
        JOIN cb c ON c.s = e.s AND c.j = e.code
        GROUP BY 1, 2),
      cands AS (
        SELECT query_id, neighbor_id FROM (
          SELECT query_id, neighbor_id, row_number() OVER (
            PARTITION BY query_id ORDER BY approx_cosine DESC, neighbor_id) AS ar
          FROM adc)
        WHERE ar <= 100),
      exact AS (
        SELECT c.query_id, c.neighbor_id,
          round(list_inner_product(q.ue, n.ue), 6) AS cosine
        FROM cands c
        JOIN un q ON q.vec_id = c.query_id
        JOIN un n ON n.vec_id = c.neighbor_id)
      SELECT query_id, rank, neighbor_id, cosine FROM (
        SELECT query_id, neighbor_id, cosine, CAST(row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INTEGER)
          AS rank
        FROM exact)
      WHERE rank <= 5 ORDER BY query_id, rank"""),
    bench = true)

  // --- v08: IVF-PQ two-stage ANN (coarse cells + compressed ADC +
  //     exact re-rank — the production index composition). The gate
  //     runs parity models for BOTH stages (IVF centroids = the 16
  //     smallest ids' unit vectors; PQ codebooks = their sub-slices),
  //     so the oracle replays cell assignment, probing, encode, ADC
  //     over probed candidates, the k·rerankFactor cut, and the exact
  //     re-rank; trained-path recall stays pinned in PqSpec -----------
  private val v08 = GraftQuery(
    "v08_ann_ivfpq",
    (s, d) => {
      val emb = Tables(s, d, "embeddings")
      // one parity collect: the PQ codebooks are sub-slices of the IVF
      // parity centroids (both are the 16 smallest ids' unit vectors)
      val ivfM = graft.operators.IvfIndex.parityModel(
        emb, "vec_id", "embedding", 16)
      graft.operators.PqIndex.ivfPqTopK(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 5, nlist = 16, nprobe = 8,
          m = 16, nCentroids = 16,
          ivf0 = Some(ivfM),
          pq0 = Some(graft.operators.PqIndex.parityFromUnits(ivfM.centroids, 16)))
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH ${parityIvfCteSql("vec_id, embedding::DOUBLE[] AS e",
        "vec_id < 5", nprobe = 8)},
      un AS (
        SELECT vec_id,
          list_transform(e, x -> x / sqrt(list_inner_product(e, e))) AS ue
        FROM u),
      cb AS (
        SELECT s.s, c.j, c.ue[s.s * 4 + 1 : s.s * 4 + 4] AS cs
        FROM (SELECT unnest(range(0, 16)) AS s) s
        CROSS JOIN (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, ue
          FROM (SELECT vec_id, ue FROM un ORDER BY vec_id LIMIT 16)) c),
      enc AS (
        SELECT vec_id, s, j AS code FROM (
          SELECT v.vec_id, c.s, c.j, row_number() OVER (
              PARTITION BY v.vec_id, c.s
              ORDER BY 2 * list_inner_product(v.ue[c.s * 4 + 1 : c.s * 4 + 4], c.cs)
                - list_inner_product(c.cs, c.cs) DESC, c.j) AS rk
          FROM un v CROSS JOIN cb c)
        WHERE rk = 1),
      adc AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
          round(sum(list_inner_product(
            q.ue[e.s * 4 + 1 : e.s * 4 + 4], c.cs)), 6) AS approx_cosine
        FROM probe p
        JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
        JOIN enc e ON e.vec_id = a.vec_id
        JOIN cb c ON c.s = e.s AND c.j = e.code
        JOIN un q ON q.vec_id = p.query_id
        GROUP BY 1, 2),
      cands AS (
        SELECT query_id, neighbor_id FROM (
          SELECT query_id, neighbor_id, row_number() OVER (
            PARTITION BY query_id ORDER BY approx_cosine DESC, neighbor_id) AS ar
          FROM adc)
        WHERE ar <= 100),
      exact AS (
        SELECT c.query_id, c.neighbor_id,
          round(list_inner_product(q.ue, n.ue), 6) AS cosine
        FROM cands c
        JOIN un q ON q.vec_id = c.query_id
        JOIN un n ON n.vec_id = c.neighbor_id)
      SELECT query_id, rank, neighbor_id, cosine FROM (
        SELECT query_id, neighbor_id, cosine, CAST(row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INTEGER)
          AS rank
        FROM exact)
      WHERE rank <= 5 ORDER BY query_id, rank"""),
    bench = true)

  // --- v09: exact cosine range search (radius query) ------------------
  private val v09 = GraftQuery(
    "v09_range_search",
    (s, d) => {
      val emb = Tables(s, d, "embeddings")
      Similarity.rangeSearch(
          emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding",
          minCosine = 0.3)
        .orderBy("query_id", "neighbor_id")
    },
    Some("""WITH u AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        round(list_cosine_similarity(q.e, c.e), 6) AS cosine
      FROM u q, u c
      WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
        AND round(list_cosine_similarity(q.e, c.e), 6) >= 0.3
      ORDER BY query_id, neighbor_id"""))

  // --- v10: exact euclidean (L2) top-k ---------------------------------
  // The metric twin of v01 for magnitude-bearing embeddings; ranking is
  // on distance ascending. rank cast matches v01's convention.
  private val v10 = GraftQuery(
    "v10_euclidean_topk",
    (s, d) => {
      val emb = Tables(s, d, "embeddings")
      Similarity.euclideanTopK(
          emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },
    Some("""WITH u AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          round(list_distance(q.e, c.e), 6) AS l2
        FROM u q, u c WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id)
    SELECT query_id, rank, neighbor_id, l2 FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY l2, neighbor_id) AS rank FROM pairs)
    WHERE rank <= 5 ORDER BY query_id, rank"""))

  // --- v11: exact maximum-inner-product top-k (MIPS) ------------------
  // Recommender-style retrieval where magnitude is signal; the
  // augmentation reduction to cosine (SimilaritySpec) is the ANN path.
  private val v11 = GraftQuery(
    "v11_mips_topk",
    (s, d) => {
      val emb = Tables(s, d, "embeddings")
      Similarity.mipsTopK(
          emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },
    Some("""WITH u AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          round(list_inner_product(q.e, c.e), 6) AS ip
        FROM u q, u c WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id)
    SELECT query_id, rank, neighbor_id, ip FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY ip DESC, neighbor_id) AS rank FROM pairs)
    WHERE rank <= 5 ORDER BY query_id, rank"""))

  // --- v12/v15 shared vote: majority label over a candidate top-k -----
  // The vote is a narrow (query, label, count) aggregate + one
  // per-query window, never the vectors — identical whichever
  // candidate generator (exact v12, IVF v15) feeds it.
  private def labelVote(topk: DataFrame, emb: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val votes = topk
      .join(emb.select(col("vec_id").as("neighbor_id"),
        col("label").as("nb_label")), "neighbor_id")
      .groupBy(col("query_id"), col("nb_label"))
      .agg(count(lit(1)).as("_v"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("_v").desc, col("nb_label"))
    votes.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .select(col("query_id").as("vec_id"), col("nb_label").as("pred_label"))
      .join(emb.select(col("vec_id"), col("label").as("true_label")), "vec_id")
      .select(col("vec_id"), col("true_label"), col("pred_label"),
        (col("true_label") === col("pred_label")).as("correct"))
      .orderBy("vec_id")
  }

  // --- v12: k-NN label prediction (majority vote over neighbors) ------
  // The classic embedding-quality probe: predict each vector's label
  // from its 5 nearest neighbors' labels (excluding self), majority
  // vote with smallest-label tie-break. Built from the same exact
  // top-k primitive as v01 — the whole corpus rides the broadcast
  // query side, so this exact variant is an oracle-checkable PROBE for
  // modest corpora; at corpus scale use v15, which feeds the identical
  // vote from IVF candidates and shuffles by cell instead of
  // broadcasting anything corpus-sized.
  private val v12 = GraftQuery(
    "v12_knn_label",
    (s, d) => {
      val emb = Tables(s, d, "embeddings")
      labelVote(
        Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", k = 5), emb)
    },
    Some("""WITH u AS (SELECT vec_id, embedding::DOUBLE[] AS e, label FROM embeddings),
      pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS nb_label,
          round(list_cosine_similarity(q.e, c.e), 6) AS cosine
        FROM u q, u c WHERE c.vec_id <> q.vec_id),
      topk AS (
        SELECT query_id, nb_label FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id) AS rk FROM pairs)
        WHERE rk <= 5),
      votes AS (
        SELECT query_id, nb_label, count(*) AS v FROM topk GROUP BY 1, 2),
      pred AS (
        SELECT query_id AS vec_id, nb_label AS pred_label FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY v DESC, nb_label) AS pr FROM votes)
        WHERE pr = 1)
    SELECT p.vec_id, u.label AS true_label, p.pred_label,
      u.label = p.pred_label AS correct
    FROM pred p JOIN u ON u.vec_id = p.vec_id
    ORDER BY p.vec_id"""))

  // --- v13: quantization round-trip error audit -----------------------
  // The accuracy side of v06's compression: dequantize the int8 codes
  // and report per-vector cosine(original, round-trip) and max
  // absolute element error — the audit a pipeline runs before
  // committing to a quantized index. Map-side per-row arithmetic, no
  // shuffle beyond the ORDER BY.
  private val v13 = GraftQuery(
    "v13_quantization_error",
    (s, d) => {
      val e = col("embedding").cast("array<double>")
      Tables(s, d, "embeddings")
        .filter(col("vec_id") < 50)
        .withColumn("_scale", array_max(transform(e, x => abs(x))) / lit(127.0))
        .withColumn("_dq",
          transform(e, x => round(x / col("_scale")) * col("_scale")))
        .select(col("vec_id"),
          round(graft.functions.Vec.cosine(e, col("_dq")), 6).as("cos_roundtrip"),
          round(array_max(zip_with(e, col("_dq"), (a, b) => abs(a - b))), 6)
            .as("max_abs_err"))
        .orderBy("vec_id")
    },
    Some("""WITH b AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id < 50),
    s AS (
      SELECT vec_id, e,
        list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
      FROM b),
    q AS (
      SELECT vec_id, e,
        list_transform(e, x -> round(x / scale) * scale) AS dq
      FROM s)
    SELECT vec_id,
      round(list_cosine_similarity(e, dq), 6) AS cos_roundtrip,
      round(list_max(list_transform(range(1, len(e) + 1),
        i -> abs(e[i] - dq[i]))), 6) AS max_abs_err
    FROM q ORDER BY vec_id"""))

  // --- v14: per-label centroid diagnostics ----------------------------
  // Embedding-space health check before trusting labels for retrieval
  // or kNN (v12): per label, the element-wise mean vector's norm and
  // the members' average cosine to their own centroid (cluster
  // tightness). The centroid build is a (label, dim-index) aggregate —
  // narrow fixed-width rows, map-side partial sums, never a vector
  // collect; centroids re-join as a broadcast (≤ #labels rows).
  private val v14 = GraftQuery(
    "v14_label_centroids",
    (s, d) => {
      val e = col("embedding").cast("array<double>")
      val emb = Tables(s, d, "embeddings").select(col("vec_id"), col("label"), e.as("e"))
      val byDim = emb
        .select(col("label"), posexplode(col("e")).as(Seq("_i", "_x")))
        .groupBy(col("label"), col("_i"))
        .agg(avg(col("_x")).as("_m"))
      val centroids = byDim
        .groupBy(col("label"))
        .agg(transform(
          sort_array(collect_list(struct(col("_i"), col("_m")))),
          p => p.getField("_m")).as("_c"))
      emb.join(broadcast(centroids), "label")
        .withColumn("_cos", graft.functions.Vec.cosine(col("e"), col("_c")))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vectors"),
          round(sqrt(aggregate(first(col("_c")), lit(0.0),
            (acc, x) => acc + x * x)), 6).as("centroid_norm"),
          round(avg(col("_cos")), 6).as("avg_cos_to_centroid"))
        .orderBy("label")
    },
    Some("""WITH emb AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
      bydim AS (
        SELECT label, i, avg(e[i]) AS m
        FROM (SELECT label, e, unnest(generate_series(1, len(e))) AS i
              FROM emb)
        GROUP BY label, i),
      cent AS (
        SELECT label, list(m ORDER BY i) AS c FROM bydim GROUP BY label)
      SELECT label,
        count(*) AS n_vectors,
        round(sqrt(list_sum(list_transform(any_value(c), x -> x * x))), 6)
          AS centroid_norm,
        round(avg(list_cosine_similarity(e, c)), 6) AS avg_cos_to_centroid
      FROM emb JOIN cent USING (label)
      GROUP BY label ORDER BY label"""))

  // --- v15: k-NN label prediction at corpus scale (ANN candidates) ----
  // The composition v12's doc promises: candidates come from the IVF
  // path (v05's index — cell-assigned units equi-joined to exploded
  // query probes), the vote is byte-for-byte v12's. Nothing
  // corpus-sized broadcasts and no all-pairs shape exists anywhere in
  // the plan; the candidate join shuffles on cell ids, so a 100×
  // corpus scales by raising nlist (cells stay ~constant size), not by
  // growing any single task. Approximate by construction (IVF recall
  // at nlist=16/nprobe=4 is pinned in IvfWinnowSpec) → no SQL oracle;
  // SimilaritySpec pins (a) that exhaustive probing (nprobe = nlist)
  // reproduces v12's exact output row-for-row — the vote composition
  // is provably identical, only candidate generation differs — and
  // (b) output shape + well-above-chance agreement at the ANN knobs;
  // PlanAssertionsSpec pins the no-all-pairs shape.
  /** The v15 composition with its knobs exposed (spec entry point:
    * `nprobe = nlist` probes every cell, making candidates — and
    * therefore predictions — exactly v12's). `parity = true` swaps the
    * trained k-means centroids for [[IvfIndex.parityModel]]'s
    * deterministic ones (unit vectors of the nlist smallest ids) so an
    * external SQL engine can replay cell assignment, probing, top-k,
    * and the vote end-to-end — the registry gate runs parity mode (the
    * d04 `md5Parity` pattern); production and the recall specs keep
    * the trained path. */
  def knnLabelAnn(emb: DataFrame, k: Int = 5, nlist: Int = 16,
      nprobe: Int = 4, parity: Boolean = false): DataFrame = {
    val topk =
      if (parity) IvfIndex.ivfTopKWithModel(emb, emb, "vec_id", "embedding",
        k, IvfIndex.parityModel(emb, "vec_id", "embedding", nlist), nprobe)
      else IvfIndex.ivfTopK(emb, emb, "vec_id", "embedding", k, nlist, nprobe)
    labelVote(topk, emb)
  }

  // The full IVF pipeline under parity centroids, replayed by the
  // oracle as plain SQL: centroids = the 16 smallest vec_ids' vectors;
  // cell scores rank by (cosine DESC, cell-idx DESC) — the engine's
  // lexicographic (d, i) struct max/sort, where equal scores pick the
  // larger index; candidates = probed cells' members minus self with
  // round-6 cosine; then v12's exact vote. Every tie-break the engine
  // applies (rank by cosine DESC then neighbor_id; vote by count DESC
  // then label) is mirrored, so rows/schema/hash check exactly.
  private val v15 = GraftQuery(
    "v15_knn_label_ann",
    (s, d) => knnLabelAnn(Tables(s, d, "embeddings"), parity = true),
    Some(s"""WITH ${parityIvfCteSql("vec_id, label, embedding::DOUBLE[] AS e",
        "TRUE", nprobe = 4)},
      cand AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
          round(list_cosine_similarity(q.e, n.e), 6) AS cosine
        FROM probe p
        JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
        JOIN u q ON q.vec_id = p.query_id
        JOIN u n ON n.vec_id = a.vec_id),
      topk AS (
        SELECT query_id, neighbor_id FROM (
          SELECT query_id, neighbor_id, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
          FROM cand)
        WHERE rank <= 5),
      votes AS (
        SELECT t.query_id, u.label AS nb_label, count(*) AS v
        FROM topk t JOIN u ON u.vec_id = t.neighbor_id
        GROUP BY 1, 2),
      pred AS (
        SELECT query_id AS vec_id, nb_label AS pred_label FROM (
          SELECT query_id, nb_label, row_number() OVER (
            PARTITION BY query_id ORDER BY v DESC, nb_label) AS rk
          FROM votes)
        WHERE rk = 1)
      SELECT p.vec_id, u.label AS true_label, p.pred_label,
        (u.label = p.pred_label) AS correct
      FROM pred p JOIN u ON u.vec_id = p.vec_id
      ORDER BY p.vec_id"""))

  // --- v16: matryoshka truncation audit -------------------------------
  // Before committing to a cheaper prefix width (MRL embeddings), how
  // much of the exact top-5 survives cutting 64 dims to 16? Both
  // rankings are exact and deterministically tie-broken (rounded
  // cosine DESC, neighbor_id), so the per-query overlap is fully
  // SQL-reproducible — an oracle-checked audit over an approximate
  // design decision, not an approximate result.
  private val v16 = GraftQuery(
    "v16_truncation_overlap",
    (s, d) => {
      val emb = Tables(s, d, "embeddings")
      Similarity.truncationOverlap(
          emb, emb.filter(col("vec_id") < 25), "vec_id", "embedding",
          k = 5, prefixDims = 16)
        .orderBy("query_id")
    },
    Some("""WITH u AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      fullk AS (
        SELECT query_id, neighbor_id FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            row_number() OVER (PARTITION BY q.vec_id
              ORDER BY round(list_cosine_similarity(q.e, c.e), 6) DESC,
                c.vec_id) AS rank
          FROM u q, u c WHERE q.vec_id < 25 AND c.vec_id <> q.vec_id)
        WHERE rank <= 5),
      prefk AS (
        SELECT query_id, neighbor_id FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            row_number() OVER (PARTITION BY q.vec_id
              ORDER BY round(list_cosine_similarity(q.e[1:16], c.e[1:16]), 6) DESC,
                c.vec_id) AS rank
          FROM u q, u c WHERE q.vec_id < 25 AND c.vec_id <> q.vec_id)
        WHERE rank <= 5)
      SELECT f.query_id, count(p.neighbor_id) AS n_overlap,
        round(count(p.neighbor_id)::DOUBLE / 5, 6) AS overlap_frac
      FROM fullk f LEFT JOIN prefk p
        ON f.query_id = p.query_id AND f.neighbor_id = p.neighbor_id
      GROUP BY f.query_id ORDER BY f.query_id"""),
    bench = true)

  // --- v17: between-label centroid separation matrix ------------------
  // The complement of v14's within-class tightness: pairwise cosine
  // between label centroids. Tight classes + low between-class cosine
  // = separable embedding space; the pair where separation collapses
  // names the label confusion to investigate. Same narrow (label,
  // dim-index) centroid build as v14 (never a vector collect), then a
  // ≤ |labels|² self-join of 10 tiny rows.
  private val v17 = GraftQuery(
    "v17_label_separation",
    (s, d) => {
      val e = col("embedding").cast("array<double>")
      val emb = Tables(s, d, "embeddings").select(col("label"), e.as("e"))
      val byDim = emb
        .select(col("label"), posexplode(col("e")).as(Seq("_i", "_x")))
        .groupBy(col("label"), col("_i"))
        .agg(avg(col("_x")).as("_m"))
      val cent = byDim.groupBy(col("label"))
        .agg(transform(
          sort_array(collect_list(struct(col("_i"), col("_m")))),
          p => p.getField("_m")).as("_c"))
      cent.select(col("label").as("label_a"), col("_c").as("_ca"))
        .join(cent.select(col("label").as("label_b"), col("_c").as("_cb")),
          col("label_a") < col("label_b"))
        .select(col("label_a"), col("label_b"),
          round(graft.functions.Vec.cosine(col("_ca"), col("_cb")), 6)
            .as("centroid_cosine"))
        .orderBy("label_a", "label_b")
    },
    Some("""WITH emb AS (
        SELECT label, embedding::DOUBLE[] AS e FROM embeddings),
      bydim AS (
        SELECT label, i, avg(e[i]) AS m
        FROM (SELECT label, e, unnest(generate_series(1, len(e))) AS i
              FROM emb)
        GROUP BY label, i),
      cent AS (
        SELECT label, list(m ORDER BY i) AS c FROM bydim GROUP BY label)
      SELECT a.label AS label_a, b.label AS label_b,
        round(list_cosine_similarity(a.c, b.c), 6) AS centroid_cosine
      FROM cent a, cent b WHERE a.label < b.label
      ORDER BY label_a, label_b"""))

  // --- v18: IVF recall-vs-nprobe sweep --------------------------------
  // The knob-picking audit: recall@5 against exact ground truth at each
  // probe setting, sharing one index build (OpCaches). The registry
  // gate runs parity centroids so the oracle replays the whole sweep —
  // ground truth, per-probe candidates, hit counting — as SQL (recall
  // is the exact rational hits/(k·n), a single integer division on
  // both engines); SimilaritySpec pins monotone recall and exact 1.0
  // at full probing on the trained path.
  private val v18 = GraftQuery(
    "v18_ivf_recall_sweep",
    (s, d) => {
      val emb = Tables(s, d, "embeddings")
      Similarity.ivfRecallSweep(emb, emb.filter(col("vec_id") < 25),
          "vec_id", "embedding", k = 5, nlist = 16,
          nprobes = Seq(1, 2, 4, 8, 16),
          model = Some(graft.operators.IvfIndex.parityModel(
            emb, "vec_id", "embedding", 16)))
        .orderBy("nprobe")
    },
    // the shared prelude's `probe` CTE goes unused here (the sweep
    // ranks cells per nprobe value itself via `ranked`); DuckDB
    // ignores unreferenced CTEs
    Some(s"""WITH ${parityIvfCteSql("vec_id, embedding::DOUBLE[] AS e",
        "vec_id < 25", nprobe = 16)},
      ranked AS (
        SELECT vec_id AS query_id, i AS cell, row_number() OVER (
          PARTITION BY vec_id ORDER BY d DESC, i DESC) AS prk
        FROM score WHERE vec_id < 25),
      truth AS (
        SELECT query_id, neighbor_id FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            row_number() OVER (PARTITION BY q.vec_id
              ORDER BY round(list_cosine_similarity(q.e, c.e), 6) DESC,
                c.vec_id) AS rank
          FROM u q, u c WHERE q.vec_id < 25 AND c.vec_id <> q.vec_id)
        WHERE rank <= 5),
      probes(np) AS (VALUES (1), (2), (4), (8), (16)),
      cand AS (
        SELECT pr.np, r.query_id, a.vec_id AS neighbor_id,
          round(list_cosine_similarity(q.e, n.e), 6) AS cosine
        FROM probes pr
        JOIN ranked r ON r.prk <= pr.np
        JOIN assign a ON a.cell = r.cell AND a.vec_id <> r.query_id
        JOIN u q ON q.vec_id = r.query_id
        JOIN u n ON n.vec_id = a.vec_id),
      topk AS (
        SELECT np, query_id, neighbor_id FROM (
          SELECT np, query_id, neighbor_id, row_number() OVER (
            PARTITION BY np, query_id ORDER BY cosine DESC, neighbor_id)
            AS rank
          FROM cand)
        WHERE rank <= 5)
      SELECT CAST(t.np AS INTEGER) AS nprobe,
        round(count(tr.neighbor_id)::DOUBLE /
          (count(DISTINCT t.query_id) * 5), 6) AS avg_recall
      FROM topk t LEFT JOIN truth tr
        ON tr.query_id = t.query_id AND tr.neighbor_id = t.neighbor_id
      GROUP BY t.np ORDER BY nprobe"""))

  // --- v19: sampled-pairs cosine distribution histogram ---------------
  // Embedding-space health: the cosine distribution over a
  // deterministic md5-sampled pair budget, bucketed at 0.1. Salted
  // per-side samples keep the budget explicit (fracA·fracB·N²) while
  // the corpus never shuffles — the dataset-card companion to v17's
  // label-separation matrix, label-free.
  private val v19 = GraftQuery(
    "v19_cosine_histogram",
    (s, d) =>
      Similarity.cosineHistogram(Tables(s, d, "embeddings"),
          "vec_id", "embedding", fracA = 0.3, fracB = 0.3)
        .orderBy("bucket"),
    Some("""WITH u AS (
        SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
        WHERE list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
      a AS (SELECT * FROM u WHERE
        ('0x' || substr(md5(vec_id::VARCHAR || ':a'), 1, 8))::UBIGINT
          / 4294967296.0 < 0.3),
      b AS (SELECT * FROM u WHERE
        ('0x' || substr(md5(vec_id::VARCHAR || ':b'), 1, 8))::UBIGINT
          / 4294967296.0 < 0.3),
      p AS (
        SELECT round(list_cosine_similarity(a.e, b.e), 6) AS c
        FROM a, b WHERE a.vec_id < b.vec_id)
      SELECT CAST(floor(c * 10) AS BIGINT) AS bucket, count(*) AS n_pairs,
        round(avg(c), 4) AS avg_cosine
      FROM p GROUP BY 1 ORDER BY bucket"""),
    bench = true)

  // --- v20: per-dimension distribution audit ---------------------------
  // The whitening/normalization diagnostic a dataset card runs before
  // committing an embedding space: per dimension, mean, population
  // stddev, and exact extremes. Dead dims (σ≈0), offset dims (|mean|
  // large), and clipped dims (extremes at a codec bound) all surface
  // here. posexplode → one narrow (dim) aggregate: the shuffle carries
  // (dim, partial moments) only — 64 rows out regardless of corpus
  // size; extremes are untouched source floats (hash-exact), moments
  // are round-6 like v14's centroids.
  private val v20 = GraftQuery(
    "v20_dim_stats",
    (s, d) =>
      Tables(s, d, "embeddings")
        .select(posexplode(col("embedding").cast("array<double>"))
          .as(Seq("dim", "x")))
        .groupBy(col("dim"))
        .agg(round(avg(col("x")), 6).as("mean"),
          round(stddev_pop(col("x")), 6).as("std"),
          min(col("x")).as("vmin"),
          max(col("x")).as("vmax"))
        .orderBy("dim"),
    Some("""WITH x AS (
        SELECT t.i - 1 AS dim, embedding[t.i]::DOUBLE AS x
        FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i) t)
      SELECT CAST(dim AS INTEGER) AS dim,
        round(avg(x), 6) AS mean,
        round(stddev_pop(x), 6) AS std,
        min(x) AS vmin, max(x) AS vmax
      FROM x GROUP BY dim ORDER BY dim"""))

  // --- v21: hubness audit ----------------------------------------------
  // The high-dimensional pathology check: in a healthy space, in-degree
  // over the query set's exact top-5 lists is spread thin; a "hub"
  // vector appearing in many lists (and anti-hubs in none) distorts
  // retrieval and kNN labels. Output is the in-degree histogram over
  // the whole corpus (degree 0 = anti-hubs included via the left join).
  // Exact top-k over a bounded query prefix (the v01 shape: query side
  // broadcasts, corpus never shuffles), then two narrow aggregates —
  // the degree table is ≤ k·|queries| rows and broadcasts back.
  private val v21 = GraftQuery(
    "v21_hubness",
    (s, d) => {
      val emb = Tables(s, d, "embeddings")
      val deg = Similarity.bruteForceTopK(
          emb, emb.filter(col("vec_id") < 100), "vec_id", "embedding", k = 5)
        .groupBy(col("neighbor_id"))
        .agg(count(lit(1)).as("_deg"))
      emb.select(col("vec_id"))
        .join(broadcast(deg), col("vec_id") === col("neighbor_id"), "left")
        .select(coalesce(col("_deg"), lit(0L)).as("in_degree"))
        .groupBy(col("in_degree"))
        .agg(count(lit(1)).as("n_vectors"))
        .orderBy("in_degree")
    },
    Some("""WITH u AS (
        SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      topk AS (
        SELECT query_id, neighbor_id FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            row_number() OVER (PARTITION BY q.vec_id
              ORDER BY round(list_cosine_similarity(q.e, c.e), 6) DESC,
                c.vec_id) AS rank
          FROM u q, u c WHERE q.vec_id < 100 AND c.vec_id <> q.vec_id)
        WHERE rank <= 5),
      deg AS (
        SELECT neighbor_id, count(*) AS d FROM topk GROUP BY neighbor_id)
      SELECT coalesce(d.d, 0) AS in_degree, count(*) AS n_vectors
      FROM u LEFT JOIN deg d ON d.neighbor_id = u.vec_id
      GROUP BY 1 ORDER BY in_degree"""))

  // --- v22: modality alignment audit -----------------------------------
  // The referential-integrity gate a multimodal pipeline runs before
  // training: every document should have an embedding row and vice
  // versa. Full outer join on the id — the only shape that sees BOTH
  // directions of drift (docs re-curated after embedding, embeddings
  // computed from a stale snapshot) — collapsed to one exact-integer
  // summary row. At scale this is one co-partitioned sort-merge join on
  // the narrow id columns; neither text nor vectors ride the shuffle.
  private val v22 = GraftQuery(
    "v22_modality_alignment",
    (s, d) => {
      val docs = Tables(s, d, "documents").select(col("doc_id"))
      val vecs = Tables(s, d, "embeddings").select(col("vec_id"))
      docs.join(vecs, col("doc_id") === col("vec_id"), "full_outer")
        .agg(
          count(col("doc_id")).as("n_docs"),
          count(col("vec_id")).as("n_vecs"),
          sum(when(col("doc_id").isNotNull && col("vec_id").isNotNull, 1L)
            .otherwise(0L)).as("n_aligned"),
          sum(when(col("vec_id").isNull, 1L).otherwise(0L))
            .as("docs_missing_embedding"),
          sum(when(col("doc_id").isNull, 1L).otherwise(0L))
            .as("vecs_missing_doc"))
        .select(col("n_docs"), col("n_vecs"), col("n_aligned"),
          col("docs_missing_embedding"), col("vecs_missing_doc"),
          round(col("n_aligned").cast("double") /
            greatest(col("n_docs"), col("n_vecs")) * 1e6)
            .cast("long").as("alignment_ppm"))
    },
    Some("""SELECT count(doc_id) AS n_docs, count(vec_id) AS n_vecs,
        CAST(sum(CASE WHEN doc_id IS NOT NULL AND vec_id IS NOT NULL
          THEN 1 ELSE 0 END) AS BIGINT) AS n_aligned,
        CAST(sum(CASE WHEN vec_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS docs_missing_embedding,
        CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS vecs_missing_doc,
        CAST(round(sum(CASE WHEN doc_id IS NOT NULL AND vec_id IS NOT NULL
            THEN 1 ELSE 0 END)::DOUBLE
          / greatest(count(doc_id), count(vec_id)) * 1e6) AS BIGINT)
          AS alignment_ppm
      FROM (SELECT doc_id FROM documents) d
      FULL OUTER JOIN (SELECT vec_id FROM embeddings) e
        ON d.doc_id = e.vec_id"""))

  // --- v23/v24/v25: TRAINED-model ANN bench twins ----------------------
  // v05/v07/v08's registry entries run parity models (smallest-id
  // centroids / sub-slice codebooks) so their DuckDB oracles can replay
  // every step as SQL — which means the bench was timing the gate
  // variant, not the production path. These twins run the identical
  // search pipelines with freshly TRAINED k-means models (the
  // deterministic xxhash64-ordered sample + Lloyd's, the path a real
  // deployment uses; recall pinned in IvfWinnowSpec/PqSpec).
  //
  // HASH-GATED since round 11: training itself is not SQL-expressible
  // (Lloyd's float accumulation order), but it doesn't need to be —
  // the query run captures the trained model in [[TrainedModels]],
  // and the oracle (serialized by Verify AFTER every query has run)
  // interpolates those exact centroids/codebooks as shortest-
  // round-trip DOUBLE literals, then replays assignment → probe →
  // encode/ADC → top-k with the SAME tie-breaks as the parity oracles
  // (cell ties → higher index, matching array_max over (d, i)
  // structs; encode ties → lower index; rank ties → neighbor_id).
  // Bit-stability holds for the same reason the parity gates hold:
  // both engines see bit-identical centroid doubles (Double.toString
  // round-trips exactly through DuckDB's correctly-rounded parse) and
  // run the identical float op sequence over them.
  private[queries] object TrainedModels {
    @volatile var ivf: Option[IvfIndex.Model] = None
    @volatile var pq: Option[PqIndex.Model] = None
    @volatile var ivfPq: Option[(IvfIndex.Model, PqIndex.Model)] = None

    /** Clears the captured models. [[graft.Verify]] calls this before
      * its query pass so the oracles it assembles afterwards can only
      * come from THAT run's captures — a slot left over from an
      * earlier run against a different dataset in the same JVM would
      * otherwise interpolate stale centroids into the oracle (a
      * spurious gate red that reads as an engine bug). */
    def reset(): Unit = { ivf = None; pq = None; ivfPq = None }
  }

  /** Public seam for [[graft.Verify]]: see [[TrainedModels.reset]]. */
  def resetTrainedModelCaptures(): Unit = TrainedModels.reset()

  /** Shortest-round-trip decimal literal: Java's `Double.toString`
    * emits just enough digits that a correctly-rounded parse (what
    * DuckDB's DOUBLE cast does) recovers the identical bit pattern —
    * the oracle scores the engine's centroids, not approximations. */
  private def dlit(x: Double): String = x.toString

  private def centCte(m: IvfIndex.Model): String =
    s"""SELECT i, ce FROM (VALUES
          ${m.centroids.zipWithIndex.map { case (c, i) =>
            s"($i, [${c.map(dlit).mkString(",")}]::DOUBLE[])" }
            .mkString(",\n          ")}) AS t(i, ce)"""

  private def cbCte(m: PqIndex.Model): String =
    s"""cb AS (
        SELECT s, j, cs FROM (VALUES
          ${(for { s <- 0 until m.m; j <- m.codebooks(s).indices } yield
            s"($s, $j, [${m.codebooks(s)(j).map(dlit).mkString(",")}]::DOUBLE[])")
            .mkString(",\n          ")}) AS t(s, j, cs))"""

  // v05's candidate + top-k tail, verbatim — the trained oracle differs
  // from the parity oracle ONLY in where `cent` comes from.
  private val ivfTailSql =
    """cand AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
          round(list_cosine_similarity(q.e, n.e), 6) AS cosine
        FROM probe p
        JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
        JOIN u q ON q.vec_id = p.query_id
        JOIN u n ON n.vec_id = a.vec_id)
      SELECT query_id, rank, neighbor_id, cosine FROM (
        SELECT query_id, neighbor_id, cosine, CAST(row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INTEGER)
          AS rank
        FROM cand)
      WHERE rank <= 5 ORDER BY query_id, rank"""

  // v07's encode + ADC + rerank tail, verbatim, minus its parity `cb`.
  private val pqTailSql =
    """enc AS (
        SELECT vec_id, s, j AS code FROM (
          SELECT v.vec_id, c.s, c.j, row_number() OVER (
              PARTITION BY v.vec_id, c.s
              ORDER BY 2 * list_inner_product(v.ue[c.s * 4 + 1 : c.s * 4 + 4], c.cs)
                - list_inner_product(c.cs, c.cs) DESC, c.j) AS rk
          FROM un v CROSS JOIN cb c)
        WHERE rk = 1),
      adc AS (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
          round(sum(list_inner_product(
            q.ue[e.s * 4 + 1 : e.s * 4 + 4], c.cs)), 6) AS approx_cosine
        FROM (SELECT * FROM un WHERE vec_id < 5) q
        JOIN enc e ON e.vec_id <> q.vec_id
        JOIN cb c ON c.s = e.s AND c.j = e.code
        GROUP BY 1, 2),
      cands AS (
        SELECT query_id, neighbor_id FROM (
          SELECT query_id, neighbor_id, row_number() OVER (
            PARTITION BY query_id ORDER BY approx_cosine DESC, neighbor_id) AS ar
          FROM adc)
        WHERE ar <= 100),
      exact AS (
        SELECT c.query_id, c.neighbor_id,
          round(list_inner_product(q.ue, n.ue), 6) AS cosine
        FROM cands c
        JOIN un q ON q.vec_id = c.query_id
        JOIN un n ON n.vec_id = c.neighbor_id)
      SELECT query_id, rank, neighbor_id, cosine FROM (
        SELECT query_id, neighbor_id, cosine, CAST(row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INTEGER)
          AS rank
        FROM exact)
      WHERE rank <= 5 ORDER BY query_id, rank"""

  private val unCteSql =
    """un AS (
        SELECT vec_id,
          list_transform(e, x -> x / sqrt(list_inner_product(e, e))) AS ue
        FROM u)"""

  private def v23 = GraftQuery(
    "v23_ann_ivf_trained",
    (s, d) => {
      val emb = Tables(s, d, "embeddings")
      val m = graft.operators.IvfIndex.train(emb, "embedding", nlist = 16)
      TrainedModels.ivf = Some(m)
      graft.operators.IvfIndex.ivfTopKWithModel(emb,
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5,
          m, nprobe = 4)
        .orderBy("query_id", "rank")
    },
    TrainedModels.ivf.map(m =>
      s"""WITH ${ivfCteSql("vec_id, embedding::DOUBLE[] AS e", "vec_id < 5",
          nprobe = 4, centCte(m))},
      $ivfTailSql"""),
    bench = true)

  private def v24 = GraftQuery(
    "v24_ann_pq_trained",
    (s, d) => {
      val emb = Tables(s, d, "embeddings")
      val m = graft.operators.PqIndex.train(emb, "embedding",
        m = 16, k = 16)
      TrainedModels.pq = Some(m)
      graft.operators.PqIndex.pqTopK(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 5, m = 16, nCentroids = 16,
          model0 = Some(m))
        .orderBy("query_id", "rank")
    },
    TrainedModels.pq.map(m =>
      s"""WITH u AS (
        SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      $unCteSql,
      ${cbCte(m)},
      $pqTailSql"""),
    bench = true)

  private def v25 = GraftQuery(
    "v25_ann_ivfpq_trained",
    (s, d) => {
      val emb = Tables(s, d, "embeddings")
      // replicate ivfPqTopK's internal training exactly (one shared
      // sample feeds both trainers), but keep the models for the oracle
      val sample = graft.operators.IvfIndex.sampleUnits(emb, "embedding")
      val ivfM = graft.operators.IvfIndex.train(sample, 16, iters = 10)
      val pqM = graft.operators.PqIndex.train(sample, 16, 16, iters = 8)
      TrainedModels.ivfPq = Some((ivfM, pqM))
      graft.operators.PqIndex.ivfPqTopK(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 5, nlist = 16, nprobe = 8,
          m = 16, nCentroids = 16,
          ivf0 = Some(ivfM), pq0 = Some(pqM))
        .orderBy("query_id", "rank")
    },
    TrainedModels.ivfPq.map { case (ivfM, pqM) =>
      s"""WITH ${ivfCteSql("vec_id, embedding::DOUBLE[] AS e", "vec_id < 5",
          nprobe = 8, centCte(ivfM))},
      $unCteSql,
      ${cbCte(pqM)},
      enc AS (
        SELECT vec_id, s, j AS code FROM (
          SELECT v.vec_id, c.s, c.j, row_number() OVER (
              PARTITION BY v.vec_id, c.s
              ORDER BY 2 * list_inner_product(v.ue[c.s * 4 + 1 : c.s * 4 + 4], c.cs)
                - list_inner_product(c.cs, c.cs) DESC, c.j) AS rk
          FROM un v CROSS JOIN cb c)
        WHERE rk = 1),
      adc AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
          round(sum(list_inner_product(
            q.ue[e.s * 4 + 1 : e.s * 4 + 4], c.cs)), 6) AS approx_cosine
        FROM probe p
        JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
        JOIN enc e ON e.vec_id = a.vec_id
        JOIN cb c ON c.s = e.s AND c.j = e.code
        JOIN un q ON q.vec_id = p.query_id
        GROUP BY 1, 2),
      cands AS (
        SELECT query_id, neighbor_id FROM (
          SELECT query_id, neighbor_id, row_number() OVER (
            PARTITION BY query_id ORDER BY approx_cosine DESC, neighbor_id) AS ar
          FROM adc)
        WHERE ar <= 100),
      exact AS (
        SELECT c.query_id, c.neighbor_id,
          round(list_inner_product(q.ue, n.ue), 6) AS cosine
        FROM cands c
        JOIN un q ON q.vec_id = c.query_id
        JOIN un n ON n.vec_id = c.neighbor_id)
      SELECT query_id, rank, neighbor_id, cosine FROM (
        SELECT query_id, neighbor_id, cosine, CAST(row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INTEGER)
          AS rank
        FROM exact)
      WHERE rank <= 5 ORDER BY query_id, rank"""},
    bench = true)

  // --- v26: anisotropy / embedding-collapse audit ----------------------
  // Ethayarajh (2019)-style cone diagnostic: if embeddings collapse
  // toward a shared direction, every cosine-based operator in this
  // library (dedup thresholds, ANN recall, kNN votes) silently
  // degrades. ||mean(unit)||² IS the anisotropy, and the exact average
  // pairwise cosine follows from the same per-dimension sums by the
  // identity Σᵢⱼ cos(i,j) = ||Σ u||², so the audit needs ONE narrow
  // per-dimension aggregate — never a pairwise join. At 100 TB: one
  // corpus scan into a 64-row partial-agg'd sum, then scalar math.
  private val v26 = GraftQuery(
    "v26_anisotropy",
    (s, d) => {
      val emb = Tables(s, d, "embeddings")
      // the withUnit normalization sequence, keeping the norm column
      // (withUnit drops it; the audit reports raw-norm stats too)
      val e = graft.functions.Vec.asDouble(col("embedding"))
      val base = emb.withColumn("_nrm", graft.functions.Vec.norm(e))
        .filter(col("_nrm") > 0)
        .select(col("_nrm"),
          transform(e, x => x / col("_nrm")).as("_unit"))
      val dimSums = base
        .select(posexplode(col("_unit")).as(Seq("_dim", "_x")))
        .groupBy(col("_dim")).agg(sum(col("_x")).as("_s"))
      val s2 = dimSums.agg(sum(col("_s") * col("_s")).as("_S"))
      base.agg(count(lit(1)).as("n_vecs"),
          avg(col("_nrm")).as("_mn"),
          stddev_samp(col("_nrm")).as("_sd"))
        .crossJoin(s2)
        .select(col("n_vecs"),
          round(col("_mn"), 6).as("mean_norm"),
          round(col("_sd"), 6).as("std_norm"),
          round(col("_S") / (col("n_vecs") * col("n_vecs")), 6)
            .as("anisotropy"),
          round((col("_S") - col("n_vecs")) /
            (col("n_vecs") * (col("n_vecs") - lit(1))), 6)
            .as("avg_pairwise_cosine"))
    },
    Some("""WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      n AS (
        SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e
        WHERE sqrt(list_inner_product(v, v)) > 0),
      u AS (
        SELECT vec_id, nrm, list_transform(v, x -> x / nrm) AS ue FROM n),
      d AS (
        SELECT i, sum(ue[i]) AS s
        FROM u CROSS JOIN (SELECT unnest(range(1, 65)) AS i)
        GROUP BY i),
      s2 AS (SELECT sum(s * s) AS big_s FROM d),
      st AS (SELECT count(*) AS n_vecs, avg(nrm) AS mn,
               stddev_samp(nrm) AS sd FROM u)
      SELECT n_vecs,
        round(mn, 6) AS mean_norm,
        round(sd, 6) AS std_norm,
        round(big_s / (n_vecs * n_vecs), 6) AS anisotropy,
        round((big_s - n_vecs) / (n_vecs * (n_vecs - 1)), 6)
          AS avg_pairwise_cosine
      FROM st CROSS JOIN s2"""))

  // --- v27: IVF cell-balance audit -------------------------------------
  // The index-health number that predicts IVF tail latency: per-cell
  // population and share. A skewed inverted file makes every probe of
  // the hot cell scan a disproportionate candidate list — at 100 TB
  // the imbalance factor (max cell / mean cell) IS the p99 multiplier
  // for single-probe searches, and the audit that says "retrain with
  // more/better centroids" before a slow index ships. One narrow
  // aggregate over (cell) after map-side assignment; the 16-row share
  // window is trivial. Runs the parity model so the oracle replays
  // assignment exactly (trained-model balance is exercised in
  // IvfWinnowSpec).
  private val v27 = GraftQuery(
    "v27_ivf_cell_balance",
    (s, d) => {
      val emb = Tables(s, d, "embeddings")
      val m = graft.operators.IvfIndex.parityModel(emb, "vec_id", "embedding", 16)
      val assigned = Similarity.withUnit(emb, "embedding")
        .select(col("vec_id"),
          graft.operators.IvfIndex.assignCell(col("_unit"), m).as("cell"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy()
      assigned.groupBy(col("cell"))
        .agg(count(lit(1)).as("n_vecs"))
        .withColumn("share_ppm",
          round(col("n_vecs").cast("double") /
            sum(col("n_vecs")).over(w) * 1e6).cast("long"))
        .select(col("cell").cast("long").as("cell"), col("n_vecs"),
          col("share_ppm"))
        .orderBy("cell")
    },
    Some(s"""WITH ${parityIvfCteSql("vec_id, embedding::DOUBLE[] AS e",
        "vec_id < 0", nprobe = 1)}
      SELECT CAST(cell AS BIGINT) AS cell, count(*) AS n_vecs,
        CAST(round(count(*)::DOUBLE
          / (SELECT count(*) FROM assign) * 1e6) AS BIGINT) AS share_ppm
      FROM assign GROUP BY cell ORDER BY cell"""))

  // --- v28: PQ distortion-vs-m sweep -----------------------------------
  // The compression-tuning curve an index team reads before choosing a
  // PQ configuration: per subspace count m, the reconstruction cosine
  // cos(u, decode(encode(u))) — numerator is the ADC identity score
  // Σ_s dot(u_s, c_s), denominator the reconstruction norm from the
  // per-centroid self-IP table. More subspaces → shorter sub-slices →
  // higher fidelity at more bytes/vector; the sweep quantifies the
  // trade. Parity codebooks per m so the oracle replays encode and
  // both sums exactly (trained-codebook distortion stays covered by
  // PqSpec's recall pins). Map-side except one narrow per-m aggregate.
  private def pqDistortion(s: org.apache.spark.sql.SparkSession, d: String,
      m: Int): DataFrame = {
    val emb = Tables(s, d, "embeddings")
    val model = graft.operators.PqIndex.parityModel(
      emb, "vec_id", "embedding", m, 16)
    Similarity.withUnit(emb, "embedding")
      .select(col("vec_id"), col("_unit"))
      .withColumn("_codes",
        graft.operators.PqIndex.encode(col("_unit"), model))
      .withColumn("_cos",
        graft.operators.PqIndex.adcScore(col("_unit"), col("_codes"), model) /
          sqrt(graft.operators.PqIndex.reconstructionNormSq(
            col("_codes"), model)))
      .agg(count(lit(1)).as("n_vecs"),
        round(avg(col("_cos")), 6).as("avg_recon_cosine"),
        round(min(col("_cos")), 6).as("min_recon_cosine"))
      .select(lit(m.toLong).as("m"), col("n_vecs"),
        col("avg_recon_cosine"), col("min_recon_cosine"))
  }

  /** One per-m distortion block of the v28 oracle (sub-dim `dsub` =
    * 64/m): parity codebooks, the v07 encode replay (argmax of
    * 2·dot − ‖c‖², ties lowest j), then the exact reconstruction
    * cosine per doc. */
  private def pqDistortionSql(m: Int): String = {
    val d = 64 / m
    s"""SELECT CAST($m AS BIGINT) AS m, count(*) AS n_vecs,
        round(avg(num / sqrt(den2)), 6) AS avg_recon_cosine,
        round(min(num / sqrt(den2)), 6) AS min_recon_cosine
      FROM (
        SELECT e.vec_id,
          sum(list_inner_product(
            v.ue[c.s * $d + 1 : c.s * $d + $d], c.cs)) AS num,
          sum(list_inner_product(c.cs, c.cs)) AS den2
        FROM (
          SELECT vec_id, s, j AS code FROM (
            SELECT v.vec_id, c.s, c.j, row_number() OVER (
                PARTITION BY v.vec_id, c.s
                ORDER BY 2 * list_inner_product(
                    v.ue[c.s * $d + 1 : c.s * $d + $d], c.cs)
                  - list_inner_product(c.cs, c.cs) DESC, c.j) AS rk
            FROM un v CROSS JOIN cb$m c)
          WHERE rk = 1) e
        JOIN cb$m c ON c.s = e.s AND c.j = e.code
        JOIN un v ON v.vec_id = e.vec_id
        GROUP BY e.vec_id)"""
  }

  private def pqCbSql(m: Int): String = {
    val d = 64 / m
    s"""cb$m AS (
        SELECT s.s, c.j, c.ue[s.s * $d + 1 : s.s * $d + $d] AS cs
        FROM (SELECT unnest(range(0, $m)) AS s) s
        CROSS JOIN (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, ue
          FROM (SELECT vec_id, ue FROM un ORDER BY vec_id LIMIT 16)) c)"""
  }

  private val v28 = GraftQuery(
    "v28_pq_distortion_sweep",
    (s, d) => pqDistortion(s, d, 8).unionByName(pqDistortion(s, d, 16))
      .orderBy("m"),
    Some(s"""WITH u AS (
        SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      un AS (
        SELECT vec_id,
          list_transform(e, x -> x / sqrt(list_inner_product(e, e))) AS ue
        FROM u),
      ${pqCbSql(8)},
      ${pqCbSql(16)}
      SELECT * FROM (
        ${pqDistortionSql(8)}
        UNION ALL
        ${pqDistortionSql(16)})
      ORDER BY m"""))

  // --- v29: binary (sign) quantization retrieval audit ----------------
  // The 64×-compression question: does one BIT per dimension retain
  // enough ranking signal for a coarse first pass? Per query, the
  // overlap between exact cosine top-10 and Hamming top-10 over
  // bitpacked sign signatures (one long per 64-dim vector), plus the
  // binary side's total Hamming mass. Integer metric end to end — the
  // binary ranking has NO float tie risk — and the exact side reuses
  // v01's rounded-cosine contract. Engine runs xor+popcount on packed
  // longs inside codegen; the oracle expands the same signatures
  // per-dimension (sign-disagreement count ≡ popcount of xor).
  private val v29 = GraftQuery(
    "v29_binary_hamming_audit",
    (s, d) => {
      val emb = Tables(s, d, "embeddings")
      Similarity.binarySignOverlap(emb, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 10)
        .orderBy("query_id")
    },
    Some("""WITH u AS (
        SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      q AS (SELECT vec_id, e FROM u WHERE vec_id < 10),
      dims AS (SELECT unnest(range(1, 65)) AS i),
      ham AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          sum(CASE WHEN (q.e[dims.i] > 0) <> (c.e[dims.i] > 0)
            THEN 1 ELSE 0 END) AS hamming
        FROM q CROSS JOIN u c CROSS JOIN dims
        WHERE c.vec_id <> q.vec_id
        GROUP BY 1, 2),
      btopk AS (
        SELECT query_id, neighbor_id, hamming FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY hamming, neighbor_id) AS rk FROM ham)
        WHERE rk <= 10),
      pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          round(list_cosine_similarity(q.e, c.e), 6) AS cosine
        FROM u q, u c WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
      etopk AS (
        SELECT query_id, neighbor_id FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id) AS rank FROM pairs)
        WHERE rank <= 10)
      SELECT b.query_id,
        CAST(sum(CASE WHEN e.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS n_overlap,
        CAST(sum(b.hamming) AS BIGINT) AS sum_hamming
      FROM btopk b LEFT JOIN etopk e USING (query_id, neighbor_id)
      GROUP BY 1 ORDER BY 1"""))

  // --- v30: two-stage retrieval — binary prefilter, exact rerank ------
  // The production composition v29 only audits half of: the packed
  // sign-bit pass keeps the cheapest top-50 candidates per query, the
  // float pass reranks ONLY those 50 by exact cosine, and the audit
  // reports recall@10 of the two-stage result against brute force
  // plus the winning neighbor. The candidate cut means full-width
  // vectors are read for 10% of the corpus (50 of 500) — at 100 TB
  // that read-avoidance is the architecture. Deterministic: integer
  // hamming + id tie-break picks candidates, rounded cosine + id
  // tie-break reranks.
  private val v30 = GraftQuery(
    "v30_rerank_retrieval",
    (s, d) => {
      val emb = Tables(s, d, "embeddings")
      val qs = emb.filter(col("vec_id") < 10)
      val rr = Similarity.rerankTopK(emb, qs, "vec_id", "embedding",
        k = 10, nCandidates = 50)
      val exact = Similarity
        .bruteForceTopK(emb, qs, "vec_id", "embedding", k = 10)
        .select(col("query_id"), col("neighbor_id"))
        .withColumn("_hit", lit(1))
      rr.join(exact, Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg(
          count(col("_hit")).as("n_recall_hits"),
          max(when(col("rank") === 1, col("neighbor_id")))
            .as("top_neighbor"),
          max(when(col("rank") === 1, col("cosine"))).as("top_cosine"),
          sum(col("hamming")).as("sum_hamming"))
        .orderBy("query_id")
    },
    Some("""WITH u AS (
        SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      un AS (
        SELECT vec_id,
          list_transform(e, x -> x / sqrt(list_inner_product(e, e))) AS ue
        FROM u),
      q AS (SELECT vec_id, e FROM u WHERE vec_id < 10),
      dims AS (SELECT unnest(range(1, 65)) AS i),
      ham AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          sum(CASE WHEN (q.e[dims.i] > 0) <> (c.e[dims.i] > 0)
            THEN 1 ELSE 0 END) AS hamming
        FROM q CROSS JOIN u c CROSS JOIN dims
        WHERE c.vec_id <> q.vec_id
        GROUP BY 1, 2),
      cands AS (
        SELECT query_id, neighbor_id, hamming FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY hamming, neighbor_id) AS crk FROM ham)
        WHERE crk <= 50),
      rr AS (
        SELECT query_id, neighbor_id, hamming, cosine,
          row_number() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id) AS rank
        FROM (
          SELECT cd.query_id, cd.neighbor_id, cd.hamming,
            round(list_inner_product(qu.ue, cu.ue), 6) AS cosine
          FROM cands cd
          JOIN un qu ON qu.vec_id = cd.query_id
          JOIN un cu ON cu.vec_id = cd.neighbor_id)),
      rtopk AS (SELECT * FROM rr WHERE rank <= 10),
      pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          round(list_cosine_similarity(q.e, c.e), 6) AS cosine
        FROM u q, u c WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
      etopk AS (
        SELECT query_id, neighbor_id FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id) AS rank FROM pairs)
        WHERE rank <= 10)
      SELECT r.query_id,
        CAST(sum(CASE WHEN e.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS n_recall_hits,
        max(CASE WHEN r.rank = 1 THEN r.neighbor_id END) AS top_neighbor,
        max(CASE WHEN r.rank = 1 THEN r.cosine END) AS top_cosine,
        CAST(sum(r.hamming) AS BIGINT) AS sum_hamming
      FROM rtopk r LEFT JOIN etopk e USING (query_id, neighbor_id)
      GROUP BY 1 ORDER BY 1"""),
    bench = true)

  // --- v31: rerank recall-vs-candidate-depth sweep ---------------------
  // The tuning curve for v30's C knob: recall@10 of the two-stage
  // pipeline at candidate depths {10, 25, 50}, exact-rational ppm.
  // One Hamming scan, one rescore, one ground truth shared across the
  // sweep; each depth adds a filter + top-k window. Non-decreasing in
  // C by construction (SimilaritySpec pins monotonicity and the
  // exhaustive-C = brute-force endpoint).
  private def v31BlockSql(cN: Int): String =
    s"""SELECT CAST($cN AS BIGINT) AS n_candidates,
        CAST(sum(CASE WHEN e.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS n_hits,
        CAST(round(sum(CASE WHEN e.neighbor_id IS NOT NULL
            THEN 1 ELSE 0 END)::DOUBLE
          / (10 * (SELECT count(*) FROM qs)) * 1e6) AS BIGINT)
          AS recall_ppm
      FROM (
        SELECT query_id, neighbor_id FROM (
          SELECT query_id, neighbor_id, row_number() OVER (
              PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id) AS rank
          FROM scored WHERE crk <= $cN)
        WHERE rank <= 10) r
      LEFT JOIN etopk e USING (query_id, neighbor_id)"""

  private val v31 = GraftQuery(
    "v31_rerank_recall_sweep",
    (s, d) => {
      val emb = Tables(s, d, "embeddings")
      val qs = emb.filter(col("vec_id") < 10)
      Similarity.rerankRecallSweep(emb, qs, "vec_id", "embedding",
          k = 10, nCandidates = Seq(10, 25, 50))
        .orderBy("n_candidates")
    },
    Some(s"""WITH u AS (
        SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      un AS (
        SELECT vec_id,
          list_transform(e, x -> x / sqrt(list_inner_product(e, e))) AS ue
        FROM u),
      qs AS (SELECT vec_id, e FROM u WHERE vec_id < 10),
      dims AS (SELECT unnest(range(1, 65)) AS i),
      ham AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          sum(CASE WHEN (q.e[dims.i] > 0) <> (c.e[dims.i] > 0)
            THEN 1 ELSE 0 END) AS hamming
        FROM qs q CROSS JOIN u c CROSS JOIN dims
        WHERE c.vec_id <> q.vec_id
        GROUP BY 1, 2),
      cands AS (
        SELECT query_id, neighbor_id, crk FROM (
          SELECT query_id, neighbor_id, row_number() OVER (
            PARTITION BY query_id
            ORDER BY hamming, neighbor_id) AS crk FROM ham)
        WHERE crk <= 50),
      scored AS (
        SELECT cd.query_id, cd.neighbor_id, cd.crk,
          round(list_inner_product(qu.ue, cu.ue), 6) AS cosine
        FROM cands cd
        JOIN un qu ON qu.vec_id = cd.query_id
        JOIN un cu ON cu.vec_id = cd.neighbor_id),
      pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          round(list_cosine_similarity(q.e, c.e), 6) AS cosine
        FROM u q, u c WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
      etopk AS (
        SELECT query_id, neighbor_id FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id) AS rank FROM pairs)
        WHERE rank <= 10)
      SELECT * FROM (
        ${v31BlockSql(10)}
        UNION ALL
        ${v31BlockSql(25)}
        UNION ALL
        ${v31BlockSql(50)})
      ORDER BY n_candidates"""))

  // --- v32: IVF probe cost curve ---------------------------------------
  // The cost axis v18's recall sweep doesn't report: candidate rows
  // actually scanned per nprobe, total and as the average per-query
  // corpus share (ppm). Together the two curves are the
  // recall-vs-cost trade an index team actually tunes on. Parity
  // model (smallest-id centroids) so the oracle replays cell
  // assignment and probe ranking exactly; cost at nprobe = nlist is
  // 1e6 ppm by construction (IvfIndexSpec pins it plus
  // monotonicity).
  private val v32 = GraftQuery(
    "v32_ivf_cost_curve",
    (s, d) => {
      val emb = Tables(s, d, "embeddings")
      val m = IvfIndex.parityModel(emb, "vec_id", "embedding", nlist = 16)
      IvfIndex.probeCostCurve(emb, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", nprobes = Seq(1, 2, 4, 16), model = m)
        .orderBy("nprobe")
    },
    Some("""WITH u AS (
        SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      pun AS (
        SELECT vec_id,
          list_transform(e, x -> x / sqrt(list_inner_product(e, e))) AS pe
        FROM u),
      cent AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS i, pe AS ce
        FROM (SELECT vec_id, pe FROM pun ORDER BY vec_id LIMIT 16)),
      score AS (
        SELECT v.vec_id, c.i, list_inner_product(v.pe, c.ce) AS d
        FROM pun v CROSS JOIN cent c),
      assign AS (
        SELECT vec_id, i AS cell FROM (
          SELECT vec_id, i, row_number() OVER (PARTITION BY vec_id
            ORDER BY d DESC, i DESC) AS rk FROM score)
        WHERE rk = 1),
      cellcounts AS (SELECT cell, count(*) AS n FROM assign GROUP BY 1),
      pranked AS (
        SELECT vec_id AS query_id, i AS cell, row_number() OVER (
            PARTITION BY vec_id ORDER BY d DESC, i DESC) AS rk
        FROM score WHERE vec_id < 10),
      denom AS (
        SELECT (SELECT count(*) FROM assign)::DOUBLE *
          (SELECT count(DISTINCT query_id) FROM pranked) AS dn),
      curve AS (
        SELECT p.p AS nprobe,
          CAST(sum(c.n) AS BIGINT) AS total_candidates,
          CAST(round(sum(c.n)::DOUBLE / (SELECT dn FROM denom) * 1e6)
            AS BIGINT) AS scan_share_ppm
        FROM (SELECT unnest([1, 2, 4, 16]) AS p) p
        JOIN pranked r ON r.rk <= p.p
        JOIN cellcounts c ON c.cell = r.cell
        GROUP BY 1)
      SELECT CAST(nprobe AS BIGINT) AS nprobe, total_candidates,
        scan_share_ppm
      FROM curve ORDER BY nprobe"""))

  // --- v33: the recall-vs-cost tuning table ----------------------------
  // v18 (recall per nprobe) ⋈ v32 (candidates scanned per nprobe) on
  // one parity model and ONE query set — the single table an index
  // team reads to pick nprobe: each row is a (recall, fraction of
  // corpus scanned) point on the trade curve. Both component sweeps
  // share the cell-assignment scan through OpCaches; the join is 5
  // rows. Exhaustive probing must land at recall 1.0 for exactly
  // 1e6 ppm scanned — both endpoints already spec-pinned in their
  // component operators.
  private val v33 = GraftQuery(
    "v33_recall_cost_table",
    (s, d) => {
      val emb = Tables(s, d, "embeddings")
      val qs = emb.filter(col("vec_id") < 25)
      val m = IvfIndex.parityModel(emb, "vec_id", "embedding", nlist = 16)
      val probes = Seq(1, 2, 4, 8, 16)
      val recall = Similarity.ivfRecallSweep(emb, qs, "vec_id", "embedding",
          k = 5, nlist = 16, nprobes = probes, model = Some(m))
        .select(col("nprobe").cast("long").as("nprobe"), col("avg_recall"))
      val cost = IvfIndex.probeCostCurve(emb, qs, "vec_id", "embedding",
        nprobes = probes, model = m)
      recall.join(cost, "nprobe")
        .select(col("nprobe"), col("avg_recall"),
          col("total_candidates"), col("scan_share_ppm"))
        .orderBy("nprobe")
    },
    Some(s"""WITH ${parityIvfCteSql("vec_id, embedding::DOUBLE[] AS e",
        "vec_id < 25", nprobe = 16)},
      ranked AS (
        SELECT vec_id AS query_id, i AS cell, row_number() OVER (
          PARTITION BY vec_id ORDER BY d DESC, i DESC) AS prk
        FROM score WHERE vec_id < 25),
      truth AS (
        SELECT query_id, neighbor_id FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            row_number() OVER (PARTITION BY q.vec_id
              ORDER BY round(list_cosine_similarity(q.e, c.e), 6) DESC,
                c.vec_id) AS rank
          FROM u q, u c WHERE q.vec_id < 25 AND c.vec_id <> q.vec_id)
        WHERE rank <= 5),
      probes(np) AS (VALUES (1), (2), (4), (8), (16)),
      cand AS (
        SELECT pr.np, r.query_id, a.vec_id AS neighbor_id,
          round(list_cosine_similarity(q.e, n.e), 6) AS cosine
        FROM probes pr
        JOIN ranked r ON r.prk <= pr.np
        JOIN assign a ON a.cell = r.cell AND a.vec_id <> r.query_id
        JOIN u q ON q.vec_id = r.query_id
        JOIN u n ON n.vec_id = a.vec_id),
      topk AS (
        SELECT np, query_id, neighbor_id FROM (
          SELECT np, query_id, neighbor_id, row_number() OVER (
            PARTITION BY np, query_id ORDER BY cosine DESC, neighbor_id)
            AS rank
          FROM cand)
        WHERE rank <= 5),
      rec AS (
        SELECT t.np AS nprobe,
          round(count(tr.neighbor_id)::DOUBLE /
            (count(DISTINCT t.query_id) * 5), 6) AS avg_recall
        FROM topk t LEFT JOIN truth tr
          ON tr.query_id = t.query_id AND tr.neighbor_id = t.neighbor_id
        GROUP BY t.np),
      cellcounts AS (SELECT cell, count(*) AS n FROM assign GROUP BY 1),
      denom AS (
        SELECT (SELECT count(*) FROM assign)::DOUBLE *
          (SELECT count(DISTINCT query_id) FROM ranked) AS dn),
      cost AS (
        SELECT pr.np AS nprobe,
          CAST(sum(c.n) AS BIGINT) AS total_candidates,
          CAST(round(sum(c.n)::DOUBLE / (SELECT dn FROM denom) * 1e6)
            AS BIGINT) AS scan_share_ppm
        FROM probes pr
        JOIN ranked r ON r.prk <= pr.np
        JOIN cellcounts c ON c.cell = r.cell
        GROUP BY 1)
      SELECT CAST(rec.nprobe AS BIGINT) AS nprobe, rec.avg_recall,
        cost.total_candidates, cost.scan_share_ppm
      FROM rec JOIN cost ON rec.nprobe = cost.nprobe
      ORDER BY nprobe"""))

  // --- v34: residual IVF-PQ (the FAISS IndexIVFPQ encoding proper) ----
  //     v08 PQ-encodes raw unit vectors; v34 encodes the RESIDUAL
  //     u − c(cell(u)), spending the same m×k code budget on within-
  //     cell detail — the standard accuracy-per-byte upgrade. Gate runs
  //     parity models for all three pieces: IVF centroids = 16
  //     smallest-id units, residual codebooks = residuals of the NEXT
  //     16 ids (the centroids' own residuals are identically zero), so
  //     the oracle replays assignment, residual arithmetic, encode,
  //     the decomposed ADC dot(q,c_cell) + Σ codebook lookups, the
  //     candidate cut, and the exact re-rank. Trained-path quality is
  //     pinned in PqSpec (exhaustive-probe exactness + distortion vs
  //     the raw-vector codes).
  private val v34 = GraftQuery(
    "v34_ann_residual_ivfpq",
    (s, d) => {
      val emb = Tables(s, d, "embeddings")
      // fused parity build (r16): both models read the same ORDER BY
      // vec_id prefix, so one bounded collect replaces two driver jobs
      val (ivfM, pqM) = graft.operators.PqIndex.parityIvfResidualModels(
        emb, "vec_id", "embedding", nlist = 16, m = 16, k = 16)
      graft.operators.PqIndex.residualIvfPqTopK(
          emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 5, nlist = 16, nprobe = 8,
          m = 16, nCentroids = 16,
          ivf0 = Some(ivfM), pq0 = Some(pqM))
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH ${parityIvfCteSql("vec_id, embedding::DOUBLE[] AS e",
        "vec_id < 5", nprobe = 8)},
      res AS (
        SELECT p.vec_id, a.cell,
          list_transform(generate_series(1, 64), i -> p.pe[i] - c.ce[i]) AS rv
        FROM pun p JOIN assign a ON a.vec_id = p.vec_id
        JOIN cent c ON c.i = a.cell),
      rcb AS (
        SELECT s.s, r.j, r.rv[s.s * 4 + 1 : s.s * 4 + 4] AS cs
        FROM (SELECT unnest(range(0, 16)) AS s) s
        CROSS JOIN (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, rv
          FROM (SELECT vec_id, rv FROM res
            ORDER BY vec_id LIMIT 16 OFFSET 16)) r),
      enc AS (
        SELECT vec_id, s, j AS code FROM (
          SELECT v.vec_id, b.s, b.j, row_number() OVER (
              PARTITION BY v.vec_id, b.s
              ORDER BY 2 * list_inner_product(v.rv[b.s * 4 + 1 : b.s * 4 + 4], b.cs)
                - list_inner_product(b.cs, b.cs) DESC, b.j) AS rk
          FROM res v CROSS JOIN rcb b)
        WHERE rk = 1),
      adc AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
          round(max(list_inner_product(q.pe, ct.ce)) +
            sum(list_inner_product(q.pe[e.s * 4 + 1 : e.s * 4 + 4], b.cs)), 6)
            AS approx_cosine
        FROM probe p
        JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
        JOIN cent ct ON ct.i = a.cell
        JOIN enc e ON e.vec_id = a.vec_id
        JOIN rcb b ON b.s = e.s AND b.j = e.code
        JOIN pun q ON q.vec_id = p.query_id
        GROUP BY 1, 2),
      cands AS (
        SELECT query_id, neighbor_id FROM (
          SELECT query_id, neighbor_id, row_number() OVER (
            PARTITION BY query_id ORDER BY approx_cosine DESC, neighbor_id) AS ar
          FROM adc)
        WHERE ar <= 100),
      exact AS (
        SELECT c.query_id, c.neighbor_id,
          round(list_inner_product(q.pe, n.pe), 6) AS cosine
        FROM cands c
        JOIN pun q ON q.vec_id = c.query_id
        JOIN pun n ON n.vec_id = c.neighbor_id)
      SELECT query_id, rank, neighbor_id, cosine FROM (
        SELECT query_id, neighbor_id, cosine, CAST(row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INTEGER)
          AS rank
        FROM exact)
      WHERE rank <= 5 ORDER BY query_id, rank"""),
    bench = true)

  // def, not val: v23/v24/v25 build their oracle SQL from the models
  // captured by their own query runs ([[TrainedModels]]), so the
  // GraftQuery objects must be re-constructed when the oracle map is
  // assembled (after Verify's query pass) — a val would freeze the
  // pre-run empty slots.
  // --- v35: MMR diversified top-k (RAG re-rank) -----------------------
  //     Greedy maximal marginal relevance over an exact top-10 pool:
  //     round 1 takes the most relevant candidate, rounds 2-4 maximize
  //     λ·rel − (1−λ)·max-sim-to-selected — the standard de-dup re-rank
  //     between retrieval and the context window. Both rel and
  //     candidate-pair sims are rounded before any comparison and ties
  //     break on neighbor_id, so the greedy TRAJECTORY (not just the
  //     final set) is hash-gated: the oracle unrolls the same four
  //     rounds in SQL. 1−λ is interpolated as its exact double
  //     (0.30000000000000004) — writing 0.3 would diverge in the 16th
  //     digit and flip knife-edge argmaxes. Corpus is touched twice
  //     (pool probe + member-vector fetch); all selection work is
  //     |queries|·pool²-bounded.
  private def v35 = {
    val oneMinusLambda = 1 - 0.7 // the kernel's exact double, NOT 0.3
    GraftQuery(
      "v35_mmr_diversified_topk",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        Similarity.mmrTopK(emb, emb.filter(col("vec_id") < 5),
            "vec_id", "embedding", k = 4, poolSize = 10, lambda = 0.7)
          .orderBy("query_id", "sel_round")
      },
      Some(s"""WITH u AS (
          SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            round(list_cosine_similarity(q.e, c.e), 6) AS rel
          FROM u q, u c WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id),
        pool AS (
          SELECT query_id, neighbor_id, rel FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY rel DESC, neighbor_id) AS rnk FROM scored)
          WHERE rnk <= 10),
        ps AS (
          SELECT a.query_id, a.neighbor_id AS a_id, b.neighbor_id AS b_id,
            round(list_cosine_similarity(ua.e, ub.e), 6) AS sim
          FROM pool a
          JOIN pool b ON a.query_id = b.query_id
            AND a.neighbor_id <> b.neighbor_id
          JOIN u ua ON ua.vec_id = a.neighbor_id
          JOIN u ub ON ub.vec_id = b.neighbor_id),
        sel1 AS (
          SELECT query_id, neighbor_id, rel, rel AS mmr_score,
            CAST(1 AS BIGINT) AS sel_round
          FROM (SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY rel DESC, neighbor_id) AS rn FROM pool)
          WHERE rn = 1),
        score2 AS (
          SELECT p.query_id, p.neighbor_id, p.rel,
            round(0.7 * p.rel - $oneMinusLambda * max(x.sim), 6) AS mmr_score
          FROM pool p
          LEFT JOIN sel1 d ON d.query_id = p.query_id
            AND d.neighbor_id = p.neighbor_id
          JOIN ps x ON x.query_id = p.query_id AND x.a_id = p.neighbor_id
          JOIN sel1 s ON s.query_id = x.query_id AND s.neighbor_id = x.b_id
          WHERE d.neighbor_id IS NULL
          GROUP BY 1, 2, 3),
        sel2 AS (
          SELECT query_id, neighbor_id, rel, mmr_score,
            CAST(2 AS BIGINT) AS sel_round
          FROM (SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY mmr_score DESC, neighbor_id) AS rn FROM score2)
          WHERE rn = 1),
        selu2 AS (SELECT * FROM sel1 UNION ALL SELECT * FROM sel2),
        score3 AS (
          SELECT p.query_id, p.neighbor_id, p.rel,
            round(0.7 * p.rel - $oneMinusLambda * max(x.sim), 6) AS mmr_score
          FROM pool p
          LEFT JOIN selu2 d ON d.query_id = p.query_id
            AND d.neighbor_id = p.neighbor_id
          JOIN ps x ON x.query_id = p.query_id AND x.a_id = p.neighbor_id
          JOIN selu2 s ON s.query_id = x.query_id AND s.neighbor_id = x.b_id
          WHERE d.neighbor_id IS NULL
          GROUP BY 1, 2, 3),
        sel3 AS (
          SELECT query_id, neighbor_id, rel, mmr_score,
            CAST(3 AS BIGINT) AS sel_round
          FROM (SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY mmr_score DESC, neighbor_id) AS rn FROM score3)
          WHERE rn = 1),
        selu3 AS (SELECT * FROM selu2 UNION ALL SELECT * FROM sel3),
        score4 AS (
          SELECT p.query_id, p.neighbor_id, p.rel,
            round(0.7 * p.rel - $oneMinusLambda * max(x.sim), 6) AS mmr_score
          FROM pool p
          LEFT JOIN selu3 d ON d.query_id = p.query_id
            AND d.neighbor_id = p.neighbor_id
          JOIN ps x ON x.query_id = p.query_id AND x.a_id = p.neighbor_id
          JOIN selu3 s ON s.query_id = x.query_id AND s.neighbor_id = x.b_id
          WHERE d.neighbor_id IS NULL
          GROUP BY 1, 2, 3),
        sel4 AS (
          SELECT query_id, neighbor_id, rel, mmr_score,
            CAST(4 AS BIGINT) AS sel_round
          FROM (SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY mmr_score DESC, neighbor_id) AS rn FROM score4)
          WHERE rn = 1),
        selu4 AS (SELECT * FROM selu3 UNION ALL SELECT * FROM sel4)
        SELECT query_id, sel_round, neighbor_id, rel, mmr_score
        FROM selu4 ORDER BY query_id, sel_round"""))
  }

  // --- v36: metadata-FILTERED ANN (the vector-DB predicate search) ----
  //     "Top-k among English documents": the documents table's lang
  //     predicate scopes retrieval via a LEFT SEMI join on the
  //     cell-assigned index stream BEFORE candidates form — a
  //     pre-filter, so top-k is exact over the allowed subset of the
  //     probed cells and recall within the allowed set cannot collapse
  //     at tight selectivity the way post-filtering's does (k
  //     unfiltered survivors can all be disallowed). The cached index
  //     is filter-agnostic: one index serves every predicate. Parity
  //     model ⇒ the whole pipeline (assignment, probe, filter, exact
  //     re-rank) replays in SQL next to v05's unfiltered twin.
  private val v36 = GraftQuery(
    "v36_ann_filtered",
    (s, d) => {
      val emb = Tables(s, d, "embeddings")
      val en = Tables(s, d, "documents")
        .filter(col("lang") === "en").select(col("doc_id"))
      graft.operators.IvfIndex.ivfTopKWithModel(
          emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 5,
          graft.operators.IvfIndex.parityModel(emb, "vec_id", "embedding", 16),
          nprobe = 4, allowed = Some(en))
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH ${parityIvfCteSql("vec_id, embedding::DOUBLE[] AS e",
        "vec_id < 5", nprobe = 4)},
      cand AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
          round(list_cosine_similarity(q.e, n.e), 6) AS cosine
        FROM probe p
        JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
        JOIN documents doc ON doc.doc_id = a.vec_id AND doc.lang = 'en'
        JOIN u q ON q.vec_id = p.query_id
        JOIN u n ON n.vec_id = a.vec_id)
      SELECT query_id, rank, neighbor_id, cosine FROM (
        SELECT query_id, neighbor_id, cosine, CAST(row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INTEGER)
          AS rank
        FROM cand)
      WHERE rank <= 5 ORDER BY query_id, rank"""),
    bench = true)

  // --- v37: filtered-ANN recall vs predicate selectivity ---------------
  //     Closes v36's tuning loop the way v32/v33 closed v18's: as the
  //     metadata predicate tightens (keep every 2nd/4th/8th id), what
  //     recall does pre-filtered IVF retain against filtered BRUTE
  //     FORCE ground truth at fixed nprobe? The operational answer to
  //     "do tight filters need more probes?" — pre-filtering keeps the
  //     allowed candidates of probed cells exact, so recall loss comes
  //     only from allowed neighbors living in UN-probed cells. One
  //     parity model + one query set shared across all three
  //     selectivities; recall is exact-integer ppm over brute-force
  //     rows. The oracle parameterizes the selectivity as an unnest
  //     list through the same CTE pipeline v36 replays.
  private val v37 = GraftQuery(
    "v37_filtered_recall_sweep",
    (s, d) => {
      val emb = Tables(s, d, "embeddings")
      val qs = emb.filter(col("vec_id") < 5)
      val model = graft.operators.IvfIndex.parityModel(
        emb, "vec_id", "embedding", 16)
      val per = Seq(2, 4, 8).map { m =>
        val allowed = emb.filter(col("vec_id") % m === 0).select("vec_id")
        val ivf = graft.operators.IvfIndex.ivfTopKWithModel(
            emb, qs, "vec_id", "embedding", k = 5, model, nprobe = 4,
            allowed = Some(allowed))
          .select(col("query_id"), col("neighbor_id"))
        val brute = Similarity.bruteForceTopK(
            emb.join(allowed, Seq("vec_id"), "left_semi"), qs,
            "vec_id", "embedding", k = 5)
          .select(col("query_id"), col("neighbor_id"))
        brute
          .join(ivf.withColumn("_h", lit(1)),
            Seq("query_id", "neighbor_id"), "left")
          .agg(sum(coalesce(col("_h"), lit(0))).cast("long").as("n_hit"),
            count(lit(1)).as("n_truth"))
          // an ungrouped agg always yields one row; the oracle's
          // GROUP BY m yields NONE for a selectivity with an empty
          // ground-truth set — drop the degenerate row so both sides
          // omit it identically (and recall never divides by zero)
          .filter(col("n_truth") > 0)
          .select(lit(m.toLong).as("inv_selectivity"),
            col("n_hit"), col("n_truth"),
            expr("CAST(round(n_hit * 1e6 / n_truth) AS BIGINT)")
              .as("recall_ppm"))
      }
      per.reduce(_ unionByName _).orderBy("inv_selectivity")
    },
    Some(s"""WITH ${parityIvfCteSql("vec_id, embedding::DOUBLE[] AS e",
        "vec_id < 5", nprobe = 4)},
      ms AS (SELECT unnest([2, 4, 8]) AS m),
      cand AS (
        SELECT ms.m, p.query_id, a.vec_id AS neighbor_id,
          round(list_cosine_similarity(q.e, n.e), 6) AS cosine
        FROM ms, probe p
        JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
        JOIN u q ON q.vec_id = p.query_id
        JOIN u n ON n.vec_id = a.vec_id
        WHERE a.vec_id % ms.m = 0),
      ivf AS (
        SELECT m, query_id, neighbor_id FROM (
          SELECT m, query_id, neighbor_id, row_number() OVER (
            PARTITION BY m, query_id ORDER BY cosine DESC, neighbor_id)
            AS rk
          FROM cand)
        WHERE rk <= 5),
      bpairs AS (
        SELECT ms.m, q.vec_id AS query_id, c.vec_id AS neighbor_id,
          round(list_cosine_similarity(q.e, c.e), 6) AS cosine
        FROM ms, u q, u c
        WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
          AND c.vec_id % ms.m = 0),
      brute AS (
        SELECT m, query_id, neighbor_id FROM (
          SELECT m, query_id, neighbor_id, row_number() OVER (
            PARTITION BY m, query_id ORDER BY cosine DESC, neighbor_id)
            AS rk
          FROM bpairs)
        WHERE rk <= 5),
      hits AS (
        SELECT b.m,
          CAST(sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hit,
          count(*) AS n_truth
        FROM brute b
        LEFT JOIN ivf i ON i.m = b.m AND i.query_id = b.query_id
          AND i.neighbor_id = b.neighbor_id
        GROUP BY 1)
      SELECT CAST(m AS BIGINT) AS inv_selectivity, n_hit, n_truth,
        CAST(round(n_hit * 1e6 / n_truth) AS BIGINT) AS recall_ppm
      FROM hits ORDER BY inv_selectivity"""))

  def all: Seq[GraftQuery] = Seq(v01, v02, v03, v04, v05, v06, v07, v08,
    v09, v10, v11, v12, v13, v14, v15, v16, v17, v18, v19, v20, v21, v22,
    v23, v24, v25, v26, v27, v28, v29, v30, v31, v32, v33, v34, v35, v36,
    v37)
}
