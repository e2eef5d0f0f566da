package graft.queries

import graft.{GraftQuery, Tables}
import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication query surface over the `documents` table.
  *
  * The driver corpus has no duplicates, so these queries plant
  * deterministic ones: exact copies (ids + 2,000,000) and near-dup
  * mutations with one appended token (ids + 1,000,000) for doc_id < 10.
  * The oracles plant the same rows in SQL, so exact/keep-first/Jaccard
  * results hash-match; the LSH operators (candidate generation is not
  * SQL-expressible) are covered rows-only here and exactly in
  * ScalaTest.
  */
object DedupQueries {

  /** documents ∪ near-dup mutations (+1M) ∪ exact copies (+2M). */
  private def planted(s: SparkSession, d: String): DataFrame = {
    val docs = Tables(s, d, "documents").select("doc_id", "text")
    val near = docs.filter(col("doc_id") < 10)
      .select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" graftdup")).as("text"))
    val exact = docs.filter(col("doc_id") < 10)
      .select((col("doc_id") + 2000000).as("doc_id"), col("text"))
    docs.unionByName(near).unionByName(exact)
  }

  private val plantedSql =
    """SELECT doc_id, text FROM documents
       UNION ALL SELECT doc_id + 1000000, text || ' graftdup'
         FROM documents WHERE doc_id < 10
       UNION ALL SELECT doc_id + 2000000, text
         FROM documents WHERE doc_id < 10"""

  // --- d01: exact dedup, keep-first -----------------------------------
  private val d01 = GraftQuery(
    "d01_exact_keep_first",
    (s, d) =>
      Dedup.exactKeepFirst(planted(s, d), "text", "doc_id")
        .select(col("doc_id"))
        .orderBy("doc_id"),
    Some(s"""SELECT doc_id FROM (
      SELECT doc_id, row_number() OVER (
        PARTITION BY lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))
        ORDER BY doc_id) AS rn
      FROM ($plantedSql))
    WHERE rn = 1 ORDER BY doc_id"""),
    bench = true)

  // --- d02: duplicate-group statistics --------------------------------
  private val d02 = GraftQuery(
    "d02_dup_stats",
    (s, d) => {
      val p = planted(s, d)
      p.agg(
        count(lit(1)).as("n_docs"),
        countDistinct(TextAnalysis.fingerprint(col("text"))).as("n_distinct"))
    },
    Some(s"""SELECT count(*) AS n_docs,
      count(DISTINCT lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
        AS n_distinct
      FROM ($plantedSql)"""))

  /** SQL mirror of [[TextAnalysis.wordShingles]] (k=3) as a CTE body
    * over a table `p(doc_id, text)` — shared by the d03/d05/d07
    * oracles. (Defined before first use: object vals initialize in
    * declaration order.) */
  private[queries] val shingleCteSql =
    """SELECT doc_id, list_distinct(list_transform(
        generate_series(1, greatest(1, len(string_split_regex(trim(text), '\s+')) - 2)),
        i -> CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 3
          THEN string_split_regex(trim(text), '\s+')[i] || ' ' ||
               string_split_regex(trim(text), '\s+')[i+1] || ' ' ||
               string_split_regex(trim(text), '\s+')[i+2]
          ELSE array_to_string(string_split_regex(trim(text), '\s+'), ' ') END)) AS sh
        FROM p"""

  // --- d03: MinHash-LSH near-dup pairs --------------------------------
  // Oracle-checkable even though LSH is probabilistic: candidates are
  // exact-verified against true Jaccard, and at r = 128/64 = 2 rows per
  // band a pair at the 0.5 threshold is missed with (1-0.5²)⁶⁴ < 1e-8 —
  // so the output equals the oracle's exhaustive "all pairs with
  // Jaccard ≥ 0.5" while the engine only ever equi-joins band buckets.
  private val d03 = GraftQuery(
    "d03_minhash_neardup",
    (s, d) =>
      Dedup.minhashNearDupPairs(
          planted(s, d).filter(col("doc_id") < 2000000), // exact copies excluded: near-dup op
          "doc_id", "text", numHashes = 128, bands = 64, threshold = 0.5)
        .orderBy("a", "b"),
    Some(s"""WITH p0 AS ($plantedSql),
      p AS (SELECT * FROM p0 WHERE doc_id < 2000000),
      sh AS ($shingleCteSql),
      j AS (
        SELECT a.doc_id AS a, b.doc_id AS b,
          CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
            (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jac
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      SELECT a, b, round(jac, 4) AS jaccard FROM j
      WHERE jac >= 0.5 ORDER BY a, b"""),
    bench = true)

  // --- d04: SimHash hamming near-dup pairs ----------------------------
  // Oracle-checkable end to end: the pigeonhole block join is
  // EXHAUSTIVE for hamming ≤ 3 (not probabilistic), and with
  // `md5Parity` the per-token hash is reproducible in DuckDB
  // (`('0x' || substr(md5(t), 1, 16))::UBIGINT` = md5's top 8 bytes),
  // so the oracle recomputes the signatures bit-for-bit and asserts
  // the exact verified pair set. Production keeps the xxhash64 default
  // (same operator, cheaper hash); the hamming arithmetic is mirrored
  // per-bit to stay inside DuckDB's signed-BIGINT ops.
  private val d04 = GraftQuery(
    "d04_simhash_neardup",
    (s, d) =>
      Dedup.simhashNearDupPairs(
          planted(s, d).filter(col("doc_id") < 2000000),
          "doc_id", "text", maxHamming = 3, md5Parity = true)
        .orderBy("a", "b"),
    Some(s"""WITH p0 AS ($plantedSql),
      p AS (SELECT * FROM p0 WHERE doc_id < 2000000),
      tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
        FROM p),
      th AS (
        SELECT doc_id, ('0x' || substr(md5(t), 1, 16))::UBIGINT AS h
        FROM tok),
      bits AS (
        SELECT doc_id, k,
          CASE WHEN sum(CASE WHEN ((h >> k) & 1) = 1 THEN 1 ELSE -1 END) > 0
            THEN 1 ELSE 0 END AS bit
        FROM th CROSS JOIN (SELECT unnest(range(0, 64)) AS k)
        GROUP BY doc_id, k),
      ham AS (
        SELECT x.doc_id AS a, y.doc_id AS b,
          sum(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END) AS hd
        FROM bits x JOIN bits y ON x.k = y.k AND x.doc_id < y.doc_id
        GROUP BY 1, 2)
      SELECT a, b, CAST(hd AS INTEGER) AS hamming
      FROM ham WHERE hd <= 3 ORDER BY a, b"""))

  // --- d05: exact n-gram Jaccard for the planted pairs ----------------
  private val d05 = GraftQuery(
    "d05_ngram_jaccard",
    (s, d) => {
      val p = planted(s, d)
      val pairs = p.filter(col("doc_id") < 10)
        .select(col("doc_id").as("a"), (col("doc_id") + 1000000).as("b"))
      Dedup.jaccardForPairs(pairs, p, "doc_id", "text", shingleK = 3)
        .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("a")
    },
    Some(s"""WITH p AS ($plantedSql),
      sh AS ($shingleCteSql)
      SELECT a.doc_id AS a, b.doc_id AS b,
        round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
          (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
      FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1000000
      WHERE a.doc_id < 10 ORDER BY a"""))

  // --- d06: multimodal header decode (REAL PNG/JPEG codec) ------------
  // The fixture builds spec-correct PNG/JFIF headers whose dimensions
  // and channel counts are integer functions of doc_id, then the REAL
  // pure-JVM parser (Multimodal.MediaCodec — big-endian IHDR fields,
  // SOFn segment scan) reads them back from the bytes. The oracle
  // replays the doc_id arithmetic, so any byte-order / offset /
  // channel-mapping bug in the parser hashes red — this is the gate
  // that moved d06 off the no_oracle list once the decode step became
  // real (round 11); only pixel-level work (full decode, resampling)
  // remains behind the disclosed FakeCodec, covered by MultimodalSpec.
  private val d06 = GraftQuery(
    "d06_media_features",
    (s, d) => {
      val media = graft.operators.Multimodal.syntheticImages(
        s, Tables(s, d, "documents").filter(col("doc_id") < 200))
      graft.operators.Multimodal.decodeHeaders(media)
        .orderBy("media_id")
    },
    Some("""SELECT doc_id AS media_id,
      CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
      CAST(16 + doc_id % 64 AS INT) AS width,
      CAST(16 + doc_id % 48 AS INT) AS height,
      CAST(CASE WHEN doc_id % 2 = 0 THEN
          CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END
        ELSE CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 3 END END AS INT)
        AS channels,
      CAST(CASE WHEN doc_id % 2 = 0 THEN 33
        ELSE 30 + 3 * (CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 3 END) END
        + octet_length(encode(text)) AS BIGINT) AS payload_bytes
    FROM documents WHERE doc_id < 200 ORDER BY media_id"""))

  // --- d10: multimodal frame sampling (pure-expression offsets) -------
  // Evenly spaced frame offsets per "video" payload — the plan-level
  // twin of the codec stub's sampler, fully oracle-checkable since the
  // offset arithmetic is plain integer math over the metadata column.
  private val d10 = GraftQuery(
    "d10_frame_sample",
    (s, d) => {
      val media = graft.operators.Multimodal.syntheticMedia(s, Tables(s, d, "documents"))
        .filter(col("kind") === "video" && col("media_id") < 100)
      media.select(col("media_id"), col("meta.n_frames").as("n_frames"),
          concat_ws(",", transform(
            graft.operators.Multimodal.frameSampleOffsets(col("meta.n_frames"), 4),
            x => x.cast("string"))).as("offsets"))
        .orderBy("media_id")
    },
    Some("""SELECT doc_id AS media_id,
      CAST(n_chars % 100 AS INT) AS n_frames,
      CASE WHEN n_chars % 100 <= 0 THEN ''
        ELSE array_to_string(list_transform(
          generate_series(0, least(4, CAST(n_chars % 100 AS INT)) - 1),
          i -> CAST(i * (n_chars % 100) // least(4, n_chars % 100) AS INT)), ',')
      END AS offsets
    FROM documents
    WHERE doc_id % 3 = 2 AND doc_id < 100
    ORDER BY media_id"""))

  // --- d07: dup-group clustering (near-dup edges → connected
  //     components). Edges chain id → id+1M → id+2M without the direct
  //     (id, id+2M) pair, so grouping them requires actual transitive
  //     propagation; ids 10..19 are isolated singletons. The oracle
  //     replays the same edge derivation and closes it with a recursive
  //     CTE — an exact, engine-independent check of the clustering. ---
  private val d07 = GraftQuery(
    "d07_dup_components",
    (s, d) => {
      val p = planted(s, d)
      val base = Tables(s, d, "documents").select("doc_id")
      val lo = base.filter(col("doc_id") < 10)
      val pairs = lo.select(col("doc_id").as("a"), (col("doc_id") + 1000000).as("b"))
        .unionByName(lo.select((col("doc_id") + 1000000).as("a"),
          (col("doc_id") + 2000000).as("b")))
      val edges = Dedup.jaccardForPairs(pairs, p, "doc_id", "text", shingleK = 3)
        .filter(col("jaccard") >= 0.5)
        .select("a", "b")
      val nodes = base.filter(col("doc_id") < 20).select(col("doc_id").as("node"))
        .unionByName(lo.select((col("doc_id") + 1000000).as("node")))
        .unionByName(lo.select((col("doc_id") + 2000000).as("node")))
      Dedup.connectedComponentsStar(edges, nodes)
        .groupBy(col("component"))
        .agg(count(lit(1)).as("n_docs"),
          concat_ws(",",
            transform(sort_array(collect_list(col("node"))),
              x => x.cast("string"))).as("members"))
        .orderBy("component")
    },
    Some(s"""WITH RECURSIVE p AS ($plantedSql),
      sh AS ($shingleCteSql),
      cand(a, b) AS (
        SELECT doc_id, doc_id + 1000000 FROM documents WHERE doc_id < 10
        UNION ALL
        SELECT doc_id + 1000000, doc_id + 2000000 FROM documents WHERE doc_id < 10),
      edges AS (
        SELECT c.a, c.b FROM cand c
        JOIN sh sa ON sa.doc_id = c.a
        JOIN sh sb ON sb.doc_id = c.b
        WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
          (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) >= 0.5),
      nodes AS (
        SELECT doc_id AS node FROM documents WHERE doc_id < 20
        UNION ALL SELECT doc_id + 1000000 FROM documents WHERE doc_id < 10
        UNION ALL SELECT doc_id + 2000000 FROM documents WHERE doc_id < 10),
      sym AS (SELECT a AS src, b AS dst FROM edges
        UNION ALL SELECT b, a FROM edges),
      reach(node, lbl) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.node)
      SELECT component, count(*) AS n_docs,
        string_agg(CAST(node AS VARCHAR), ',' ORDER BY node) AS members
      FROM (SELECT node, min(lbl) AS component FROM reach GROUP BY node)
      GROUP BY component ORDER BY component"""))

  // --- d08: exact dedup, keep-BEST copy (quality-ranked) ---------------
  // Same planted exact copies as d01, but survivors are chosen by
  // longest-doc-first (a stand-in quality score derivable on both
  // engines), id ascending as tiebreak. Exercises the window-order
  // variant of dedup a curation pipeline actually wants: keep the
  // best copy, not the first.
  private val d08 = GraftQuery(
    "d08_exact_keep_best",
    (s, d) => {
      // copies share text ⇒ same length; score = n_tokens + (id mod 7)
      // gives copies of one text different, deterministic "qualities"
      val scored = planted(s, d)
        .withColumn("score",
          TextAnalysis.tokenCount(col("text")).cast("long") +
            pmod(col("doc_id"), lit(7)))
      Dedup.exactKeepBest(scored, "text", col("score").desc, "doc_id")
        .select(col("doc_id"), col("score"))
        .orderBy("doc_id")
    },
    Some(s"""WITH p AS ($plantedSql),
      scored AS (
        SELECT doc_id, text,
          len(string_split_regex(trim(text), '\\s+')) + doc_id % 7 AS score
        FROM p)
      SELECT doc_id, score FROM (
        SELECT doc_id, score, row_number() OVER (
          PARTITION BY lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))
          ORDER BY score DESC, doc_id) AS rn
        FROM scored)
      WHERE rn = 1 ORDER BY doc_id"""))

  // --- d09: benchmark decontamination ----------------------------------
  // Eval set = docs 0..4; train = docs 5+ plus the near-dup mutations
  // (+1M) of docs 0..9. Only mutations 1000000..1000004 descend from
  // eval texts, so they are the leakage the 5-gram overlap must find
  // (and k=5 keeps incidental word-soup collisions out).
  /** The d09/d13 train/eval construction, shared by both
    * decontamination variants. */
  private def contaminationSides(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val docs = Tables(s, d, "documents").select("doc_id", "text")
    val eval = docs.filter(col("doc_id") < 5)
    val near = docs.filter(col("doc_id") < 10)
      .select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" graftdup")).as("text"))
    (docs.filter(col("doc_id") >= 5).unionByName(near), eval)
  }

  private val d09 = GraftQuery(
    "d09_contamination",
    (s, d) => {
      val (train, eval) = contaminationSides(s, d)
      Dedup.contaminated(train, eval, "doc_id", "text", shingleK = 5)
        .orderBy("train_id")
    },
    Some("""WITH ev AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 5),
      train AS (
        SELECT doc_id, text FROM documents WHERE doc_id >= 5
        UNION ALL
        SELECT doc_id + 1000000, text || ' graftdup'
        FROM documents WHERE doc_id < 10),
      shev AS (
        SELECT DISTINCT unnest(list_distinct(list_transform(
          generate_series(1, greatest(1, len(string_split_regex(trim(text), '\s+')) - 4)),
          i -> CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 5
            THEN string_split_regex(trim(text), '\s+')[i] || ' ' ||
                 string_split_regex(trim(text), '\s+')[i+1] || ' ' ||
                 string_split_regex(trim(text), '\s+')[i+2] || ' ' ||
                 string_split_regex(trim(text), '\s+')[i+3] || ' ' ||
                 string_split_regex(trim(text), '\s+')[i+4]
            ELSE array_to_string(string_split_regex(trim(text), '\s+'), ' ') END))) AS sh
        FROM ev),
      shtr AS (
        SELECT doc_id AS train_id, unnest(list_distinct(list_transform(
          generate_series(1, greatest(1, len(string_split_regex(trim(text), '\s+')) - 4)),
          i -> CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 5
            THEN string_split_regex(trim(text), '\s+')[i] || ' ' ||
                 string_split_regex(trim(text), '\s+')[i+1] || ' ' ||
                 string_split_regex(trim(text), '\s+')[i+2] || ' ' ||
                 string_split_regex(trim(text), '\s+')[i+3] || ' ' ||
                 string_split_regex(trim(text), '\s+')[i+4]
            ELSE array_to_string(string_split_regex(trim(text), '\s+'), ' ') END))) AS sh
        FROM train)
      SELECT train_id, count(DISTINCT sh) AS n_shared
      FROM shtr JOIN shev USING (sh)
      GROUP BY train_id ORDER BY train_id"""))

  // --- d11: passage-level overlap via winnowing fingerprints ----------
  // Planted: doc +1M keeps the original's first 30 tokens and replaces
  // the tail — whole-document digests see distinct docs, but the shared
  // passage shows up as overlapping winnow fingerprints. Oracle-checked
  // via the kernel's md5Parity mode (the Winnow twin of d04's): for
  // k = 5 over BMP text the char polynomial never wraps, so DuckDB
  // recomputes the gram hashes, replays the w-window minima with
  // list_transform/least, and intersects the fingerprint sets exactly.
  // (The replay assumes docs of ≥ k chars and ≥ w grams — true of this
  // corpus; the kernel's short-input fallbacks are spec-pinned in
  // IvfWinnowSpec.) Production keeps the xxhash64 avalanche default.
  private val d11 = GraftQuery(
    "d11_passage_overlap",
    (s, d) => {
      val base = Tables(s, d, "documents")
        .select("doc_id", "text").filter(col("doc_id") < 10)
      val shared = base.select(col("doc_id"),
        concat(
          concat_ws(" ", slice(TextAnalysis.tokens(col("text")), 1, 30)),
          lit(" totally different tail "),
          col("doc_id").cast("string")).as("text"))
      val fpA = base.select(col("doc_id").as("a"),
        TextAnalysis.winnowFingerprints(col("text"), md5Parity = true).as("fp_a"))
      val fpB = shared.select(col("doc_id").as("a"),
        TextAnalysis.winnowFingerprints(col("text"), md5Parity = true).as("fp_b"))
      fpA.join(fpB, "a")
        .select(col("a"),
          size(array_intersect(col("fp_a"), col("fp_b"))).as("shared_fps"),
          size(col("fp_a")).as("n_a"), size(col("fp_b")).as("n_b"))
        .orderBy("a")
    },
    Some("""WITH base AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 10),
      sides AS (
        SELECT 'A' AS side, doc_id, text FROM base
        UNION ALL
        SELECT 'B' AS side, doc_id,
          array_to_string((string_split_regex(trim(text), '\s+'))[1:30], ' ')
            || ' totally different tail ' || CAST(doc_id AS VARCHAR)
        FROM base),
      norm AS (
        SELECT side, doc_id,
          lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
        FROM sides),
      grams AS (
        SELECT side, doc_id,
          list_transform(range(1, len(t) - 5 + 2),
            i -> unicode(t[i]) * 4362470401 + unicode(t[i+1]) * 16974593 +
                 unicode(t[i+2]) * 66049 + unicode(t[i+3]) * 257 +
                 unicode(t[i+4])) AS ph
        FROM norm),
      fps AS (
        SELECT side, doc_id,
          list_transform(ph, h ->
            ('0x' || substr(md5(CAST(h AS VARCHAR)), 1, 15))::UBIGINT::BIGINT)
            AS gh
        FROM grams),
      mins AS (
        SELECT side, doc_id,
          list_distinct(
            list_transform(range(1, len(gh) - 4 + 2),
              i -> least(gh[i], gh[i+1], gh[i+2], gh[i+3]))) AS fp
        FROM fps)
      SELECT a.doc_id AS a,
        CAST(len(list_intersect(a.fp, b.fp)) AS INTEGER) AS shared_fps,
        CAST(len(a.fp) AS INTEGER) AS n_a,
        CAST(len(b.fp) AS INTEGER) AS n_b
      FROM mins a JOIN mins b ON a.doc_id = b.doc_id
      WHERE a.side = 'A' AND b.side = 'B'
      ORDER BY a"""))

  // --- d12: end-to-end embedding dedup groups -------------------------
  // The composition a curation pipeline actually runs: banded-LSH
  // near-dup pair generation over embeddings (v04's corpus with planted
  // perturbed twins) → connected components → one summary row per dup
  // group. Every stage is the scale path (equi-join candidates,
  // large-star/small-star contraction); the oracle replays it
  // exhaustively: all-pairs cosine ≥ 0.9 closed with a recursive CTE.
  private val d12 = GraftQuery(
    "d12_embedding_dedup_groups",
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
      val edges = graft.operators.Similarity
        .lshNearDupPairs(all, "vec_id", "embedding", threshold = 0.9)
        .select(col("a"), col("b"))
      val nodes = all.select(col("vec_id").as("node"))
      Dedup.connectedComponentsStar(edges, nodes)
        .groupBy(col("component"))
        .agg(count(lit(1)).as("n_members"),
          concat_ws(",",
            transform(sort_array(collect_list(col("node"))),
              x => x.cast("string"))).as("members"))
        .filter(col("n_members") >= 2)
        .orderBy("component")
    },
    Some("""WITH RECURSIVE base AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000,
        list_transform(generate_series(1, 64),
          i -> CAST(embedding[i] AS DOUBLE) + 0.1 * CAST(embedding[65 - i] AS DOUBLE))
      FROM embeddings WHERE vec_id < 5),
    edges AS (
      SELECT a.vec_id AS a, b.vec_id AS b FROM base a, base b
      WHERE a.vec_id < b.vec_id
        AND round(list_cosine_similarity(a.e, b.e), 6) >= 0.9),
    sym AS (SELECT a AS src, b AS dst FROM edges
      UNION ALL SELECT b, a FROM edges),
    reach(node, lbl) AS (
      SELECT vec_id, vec_id FROM base
      UNION
      SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.node)
    SELECT component, count(*) AS n_members,
      string_agg(CAST(node AS VARCHAR), ',' ORDER BY node) AS members
    FROM (SELECT node, min(lbl) AS component FROM reach GROUP BY node)
    GROUP BY component HAVING count(*) >= 2 ORDER BY component"""))

  // --- d13: decontamination via broadcast Bloom prefilter -------------
  // Same output as d09 (the exact join kills Bloom false positives), so
  // it shares d09's oracle verbatim — what changes is the plan: the
  // train corpus is filtered map-side by BloomFilterMightContain and
  // never shuffled in full. The scale variant a 100 TB sweep would run.
  private val d13 = GraftQuery(
    "d13_contamination_bloom",
    (s, d) => {
      val (train, eval) = contaminationSides(s, d)
      Dedup.contaminatedBloom(train, eval, "doc_id", "text", shingleK = 5)
        .orderBy("train_id")
    },
    d09.oracle)

  // --- d14: corpus-level line dedup (C4-style boilerplate pass) -------
  // The driver corpus is single-line, so the query plants multi-line
  // docs: a unique header line, a boilerplate line and a footer line
  // shared by all 50 docs, and the doc's own text snippet. Line dedup
  // must keep the shared lines only in doc 0 and every unique line
  // where it stands — exactly reproducible in SQL, so fully
  // hash-checked.
  private val d14 = GraftQuery(
    "d14_line_dedup",
    (s, d) => {
      val docs = Tables(s, d, "documents")
        .filter(col("doc_id") < 50)
        .select(col("doc_id"),
          concat_ws("\n",
            concat(lit("header "), col("doc_id")),
            lit("subscribe to our newsletter"),
            substring(col("text"), 1, 80),
            lit("(c) example corp all rights reserved")).as("text"))
      Dedup.lineDedup(docs, "doc_id", "text")
        .orderBy("doc_id")
    },
    Some("""WITH docs AS (
        SELECT doc_id,
          'header ' || doc_id || chr(10) ||
          'subscribe to our newsletter' || chr(10) ||
          substr(text, 1, 80) || chr(10) ||
          '(c) example corp all rights reserved' AS text
        FROM documents WHERE doc_id < 50),
      lines AS (
        SELECT doc_id,
          unnest(string_split(text, chr(10))) AS line,
          unnest(generate_series(1, len(string_split(text, chr(10))))) AS pos
        FROM docs),
      kept AS (
        SELECT doc_id, pos, line,
          row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
        FROM lines)
      SELECT doc_id, count(*) AS n_kept,
        string_agg(line, chr(10) ORDER BY pos) AS clean_text
      FROM kept WHERE rn = 1
      GROUP BY doc_id ORDER BY doc_id"""))

  // --- d15: end-to-end near-dup curation (the full pipeline) ----------
  // What a curation run actually executes, as ONE query: MinHash-LSH
  // near-dup pair generation (exact-verified Jaccard ≥ 0.5, so exact
  // copies AND mutations edge together) → large-star/small-star
  // clustering → keep-BEST survivor per cluster by quality score
  // (d08's deterministic stand-in). Every stage is the 100 TB shape:
  // banded equi-join candidates, fixed-width edge contraction, one
  // window per cluster. The oracle replays it exhaustively — all-pairs
  // Jaccard, recursive-CTE closure, the same quality rank.
  private val d15 = GraftQuery(
    "d15_neardup_keep_best",
    (s, d) => {
      val p = planted(s, d)
      val edges = Dedup.minhashNearDupPairs(p, "doc_id", "text",
          numHashes = 128, bands = 64, threshold = 0.5)
        .select(col("a"), col("b"))
      val nodes = p.select(col("doc_id").as("node"))
      val comp = Dedup.connectedComponentsStar(edges, nodes)
      val scored = p.select(col("doc_id").as("node"),
        (TextAnalysis.tokenCount(col("text")).cast("long") +
          pmod(col("doc_id"), lit(7))).as("score"))
      val w = Window.partitionBy(col("component"))
        .orderBy(col("score").desc, col("node"))
      comp.join(scored, "node")
        .withColumn("n_members", count(lit(1)).over(Window.partitionBy(col("component"))))
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .select(col("component"), col("node").as("keeper"),
          col("score"), col("n_members"))
        .orderBy("component")
    },
    Some(s"""WITH RECURSIVE p AS ($plantedSql),
      sh AS ($shingleCteSql),
      edges AS (
        SELECT a.doc_id AS a, b.doc_id AS b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
          (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
      sym AS (SELECT a AS src, b AS dst FROM edges
        UNION ALL SELECT b, a FROM edges),
      reach(node, lbl) AS (
        SELECT doc_id, doc_id FROM p
        UNION
        SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.node),
      comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node),
      scored AS (SELECT doc_id,
          len(string_split_regex(trim(text), '\\s+')) + doc_id % 7 AS score
        FROM p),
      ranked AS (
        SELECT c.component, c.node AS keeper, s.score,
          count(*) OVER (PARTITION BY c.component) AS n_members,
          row_number() OVER (
            PARTITION BY c.component ORDER BY s.score DESC, c.node) AS rn
        FROM comp c JOIN scored s ON s.doc_id = c.node)
      SELECT component, keeper, score, n_members
      FROM ranked WHERE rn = 1 ORDER BY component"""))

  // --- d16: SemDeDup — k-means clusters + within-cluster pruning ------
  // Same planted near-dups as d12; the engine restricts pair
  // generation to k-means cells (the SemDeDup trade), the oracle
  // replays the EXACT closure — all-pairs cosine ≥ 0.9 + recursive
  // CTE — so a hash match certifies the cluster restriction lost no
  // pair on this corpus (a perturbed copy lands in its original's
  // cell). DedupSpec pins the same property on hand-built clusters.
  private val d16 = GraftQuery(
    "d16_semdedup",
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
      Dedup.semDedup(all, "vec_id", "embedding", threshold = 0.9, nlist = 8)
        .select(col("vec_id"), col("component"),
          col("kept").cast("int").as("kept"))
        .orderBy("vec_id")
    },
    Some("""WITH RECURSIVE base AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000,
        list_transform(generate_series(1, 64),
          i -> CAST(embedding[i] AS DOUBLE) + 0.1 * CAST(embedding[65 - i] AS DOUBLE))
      FROM embeddings WHERE vec_id < 5),
    edges AS (
      SELECT a.vec_id AS a, b.vec_id AS b FROM base a, base b
      WHERE a.vec_id < b.vec_id
        AND round(list_cosine_similarity(a.e, b.e), 6) >= 0.9),
    sym AS (SELECT a AS src, b AS dst FROM edges
      UNION ALL SELECT b, a FROM edges),
    reach(node, lbl) AS (
      SELECT vec_id, vec_id FROM base
      UNION
      SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.node)
    SELECT node AS vec_id, component,
      CAST(node = component AS INT) AS kept
    FROM (SELECT node, min(lbl) AS component FROM reach GROUP BY node)
    ORDER BY vec_id"""))

  // --- d17: duplicated-substring spans (Lee et al. 2022) --------------
  // The corpus naturally repeats 5-gram windows (synthetic vocab is
  // small), so no planting is needed: every window occurring more than
  // once corpus-wide yields removal spans for all but its first
  // occurrence, merged per doc. The oracle replays the exact
  // semantics — window enumeration, corpus-first keep, gaps-and-islands
  // merge — over the raw window strings (the engine groups on a
  // 128-bit window hash only to keep shuffle keys fixed-width).
  private val d17 = GraftQuery(
    "d17_substring_spans",
    (s, d) =>
      Dedup.substringSpans(Tables(s, d, "documents"), "doc_id", "text", k = 5)
        .orderBy("doc_id", "span_start"),
    Some("""WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents),
      wins AS (
        SELECT doc_id, unnest(generate_series(1, len(t) - 4)) AS i, t
        FROM toks WHERE len(t) >= 5),
      occ AS (
        SELECT doc_id, i - 1 AS pos,
          array_to_string(list_slice(t, i, i + 4), ' ') AS w
        FROM wins),
      marked AS (
        SELECT doc_id, pos,
          row_number() OVER (PARTITION BY w ORDER BY doc_id, pos) AS rn
        FROM occ),
      rem AS (
        SELECT doc_id, pos AS s, pos + 5 AS e FROM marked WHERE rn > 1),
      runs AS (
        SELECT doc_id, s, e,
          max(e) OVER (PARTITION BY doc_id ORDER BY s
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_max
        FROM rem),
      isl AS (
        SELECT doc_id, s, e,
          sum(CASE WHEN coalesce(prior_max, -1) >= s THEN 0 ELSE 1 END)
            OVER (PARTITION BY doc_id ORDER BY s
              ROWS UNBOUNDED PRECEDING) AS island
        FROM runs)
      SELECT doc_id, min(s) AS span_start, max(e) AS span_end
      FROM isl GROUP BY doc_id, island
      ORDER BY doc_id, span_start"""),
    bench = true)

  // --- d18: incremental dedup of a new batch against history ----------
  // History = docs 0-299 (already curated); the new batch = docs
  // 300+ plus replayed copies of historical docs (+3M) and one
  // in-batch duplicate pair (+4M copying doc 300). Survivors must
  // drop every replayed copy (fingerprint already in history) and
  // keep-first within the batch.
  private val d18 = GraftQuery(
    "d18_incremental_dedup",
    (s, d) => {
      val docs = Tables(s, d, "documents").select("doc_id", "text")
      val history = docs.filter(col("doc_id") < 300)
      val batch = docs.filter(col("doc_id") >= 300)
        .unionByName(docs.filter(col("doc_id") < 10)
          .select((col("doc_id") + 3000000).as("doc_id"), col("text")))
        .unionByName(docs.filter(col("doc_id") === 300)
          .select((col("doc_id") + 4000000).as("doc_id"), col("text")))
      Dedup.incrementalDedup(batch, history, "doc_id", "text")
        .select("doc_id")
        .orderBy("doc_id")
    },
    Some("""WITH batch AS (
        SELECT doc_id, text FROM documents WHERE doc_id >= 300
        UNION ALL SELECT doc_id + 3000000, text
          FROM documents WHERE doc_id < 10
        UNION ALL SELECT doc_id + 4000000, text
          FROM documents WHERE doc_id = 300),
      norm AS (
        SELECT doc_id,
          lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
        FROM batch),
      hist AS (
        SELECT DISTINCT lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
        FROM documents WHERE doc_id < 300),
      kept AS (
        SELECT doc_id, fp,
          row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM norm)
      SELECT doc_id FROM kept
      WHERE rn = 1 AND NOT EXISTS (SELECT 1 FROM hist WHERE hist.fp = kept.fp)
      ORDER BY doc_id"""))

  // --- d19: corpus snapshot diff (added / removed / changed) ----------
  // Dataset-versioning primitive: two snapshot views of the corpus
  // (v2 drops ids < 100, extends past 400, and edits every 7th doc)
  // are compared by content fingerprint with one full-outer join on
  // the id. Only (id, 128-bit fp) pairs ever shuffle — document text
  // stays at the scan — so the diff costs one narrow join at any
  // corpus size, and the fingerprint makes "changed" a content
  // judgment, not a timestamp guess.
  private val d19 = GraftQuery(
    "d19_snapshot_diff",
    (s, d) => {
      val docs = Tables(s, d, "documents").select("doc_id", "text")
      val v1 = docs.filter(col("doc_id") < 400)
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp1"))
      val v2 = docs.filter(col("doc_id") >= 100)
        .select(col("doc_id"),
          TextAnalysis.fingerprint(
            when(pmod(col("doc_id"), lit(7)) === 0,
              concat(col("text"), lit(" edited")))
              .otherwise(col("text"))).as("fp2"))
      v1.join(v2, Seq("doc_id"), "full_outer")
        .withColumn("status",
          when(col("fp1").isNull, "added")
            .when(col("fp2").isNull, "removed")
            .when(col("fp1") =!= col("fp2"), "changed")
            .otherwise("unchanged"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n"))
        .orderBy("status")
    },
    Some("""WITH v1 AS (
        SELECT doc_id,
          md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp1
        FROM documents WHERE doc_id < 400),
      v2 AS (
        SELECT doc_id,
          md5(lower(trim(regexp_replace(
            CASE WHEN doc_id % 7 = 0 THEN text || ' edited' ELSE text END,
            '\s+', ' ', 'g')))) AS fp2
        FROM documents WHERE doc_id >= 100)
      SELECT CASE WHEN fp1 IS NULL THEN 'added'
                  WHEN fp2 IS NULL THEN 'removed'
                  WHEN fp1 <> fp2 THEN 'changed'
                  ELSE 'unchanged' END AS status,
        count(*) AS n
      FROM v1 FULL OUTER JOIN v2 USING (doc_id)
      GROUP BY 1 ORDER BY status"""))

  // --- d20: duplicate-multiplicity histogram ---------------------------
  // The dedup REPORT a curation run starts from: how much of the corpus
  // exists in 1, 2, 3… copies. Plants double copies of docs 0-9 and a
  // third copy of docs 0-4, then histograms fingerprint-group sizes.
  // Two narrow aggregations (fingerprint → size, size → histogram);
  // text never shuffles.
  private val d20 = GraftQuery(
    "d20_dup_histogram",
    (s, d) => {
      val docs = Tables(s, d, "documents").select("doc_id", "text")
      val copy1 = docs.filter(col("doc_id") < 10)
        .select((col("doc_id") + 2000000).as("doc_id"), col("text"))
      val copy2 = docs.filter(col("doc_id") < 5)
        .select((col("doc_id") + 3000000).as("doc_id"), col("text"))
      val sizes = docs.unionByName(copy1).unionByName(copy2)
        .groupBy(TextAnalysis.fingerprint(col("text")).as("_fp"))
        .agg(count(lit(1)).as("n_copies"))
      sizes.groupBy(col("n_copies"))
        .agg(count(lit(1)).as("n_groups"),
          sum(col("n_copies")).as("n_docs"))
        .orderBy("n_copies")
    },
    Some("""WITH p AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 2000000, text FROM documents WHERE doc_id < 10
        UNION ALL
        SELECT doc_id + 3000000, text FROM documents WHERE doc_id < 5),
      sizes AS (
        SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
          count(*) AS n_copies
        FROM p GROUP BY 1)
      SELECT n_copies, count(*) AS n_groups,
        CAST(sum(n_copies) AS BIGINT) AS n_docs
      FROM sizes GROUP BY n_copies ORDER BY n_copies"""))

  // --- d21: media manifest (integrity + payload dedup accounting) -----
  // The ingest-side manifest a multimodal pipeline keeps per media
  // kind: object counts, distinct-content counts (md5 over the binary
  // payload — the same content-hash dedup d01 does for text), and byte
  // totals. Payloads never shuffle: every aggregate flows through the
  // 128-bit digest or an integer length, so the shuffle is a few rows
  // per kind regardless of payload size.
  private val d21 = GraftQuery(
    "d21_media_manifest",
    (s, d) => {
      val media = graft.operators.Multimodal
        .syntheticMedia(s, Tables(s, d, "documents"))
      media.groupBy(col("kind"))
        .agg(
          count(lit(1)).as("n_media"),
          countDistinct(md5(col("payload"))).as("distinct_payloads"),
          sum(length(col("payload"))).cast("long").as("total_bytes"),
          max(length(col("payload"))).cast("long").as("max_bytes"))
        .orderBy("kind")
    },
    Some("""WITH m AS (
        SELECT doc_id,
          CASE WHEN doc_id % 3 = 0 THEN 'image'
               WHEN doc_id % 3 = 1 THEN 'audio'
               ELSE 'video' END AS kind,
          -- payload is the UTF-8 encoding of text, so md5 over the
          -- VARCHAR hashes the same bytes (duckdb 1.0 md5 is VARCHAR-only)
          text AS content,
          encode(text) AS payload
        FROM documents)
      SELECT kind, count(*) AS n_media,
        count(DISTINCT md5(content)) AS distinct_payloads,
        CAST(sum(octet_length(payload)) AS BIGINT) AS total_bytes,
        CAST(max(octet_length(payload)) AS BIGINT) AS max_bytes
      FROM m GROUP BY kind ORDER BY kind"""))

  // --- d22: apply the d17 spans — rewrite the corpus ------------------
  // The curation step d17 reports: cut every duplicated-substring span
  // from its document. The oracle replays d17's window semantics, then
  // drops every token position covered by any removal window and
  // reassembles the text in order (coverage by UNMERGED windows equals
  // coverage by merged spans, so the islands pass isn't re-replayed).
  private val d22 = GraftQuery(
    "d22_span_removed_text",
    (s, d) =>
      Dedup.applySubstringDedup(Tables(s, d, "documents"), "doc_id", "text", k = 5)
        .orderBy("doc_id"),
    Some("""WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents),
      wins AS (
        SELECT doc_id, unnest(generate_series(1, len(t) - 4)) AS i, t
        FROM toks WHERE len(t) >= 5),
      occ AS (
        SELECT doc_id, i - 1 AS pos,
          array_to_string(list_slice(t, i, i + 4), ' ') AS w
        FROM wins),
      marked AS (
        SELECT doc_id, pos,
          row_number() OVER (PARTITION BY w ORDER BY doc_id, pos) AS rn
        FROM occ),
      rem AS (
        SELECT doc_id, pos AS s, pos + 5 AS e FROM marked WHERE rn > 1),
      tokpos AS (
        SELECT doc_id, g AS pos1, t[g] AS w
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS g
              FROM toks)),
      removedpos AS (
        SELECT DISTINCT tp.doc_id, tp.pos1
        FROM tokpos tp JOIN rem ON tp.doc_id = rem.doc_id
        WHERE tp.pos1 - 1 >= rem.s AND tp.pos1 - 1 < rem.e),
      keptagg AS (
        SELECT tp.doc_id,
          count(*) AS n_kept,
          string_agg(tp.w, ' ' ORDER BY tp.pos1) AS seq
        FROM tokpos tp LEFT JOIN removedpos r
          ON tp.doc_id = r.doc_id AND tp.pos1 = r.pos1
        WHERE r.doc_id IS NULL
        GROUP BY tp.doc_id)
      SELECT t.doc_id,
        CAST(len(t.t) AS BIGINT) AS n_tokens,
        CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
        md5(coalesce(k.seq, '')) AS clean_md5
      FROM toks t LEFT JOIN keptagg k ON t.doc_id = k.doc_id
      ORDER BY t.doc_id"""))

  // --- d23: fuzzy decontamination (cross-corpus near-dup) -------------
  // d09/d13 catch exact 5-gram leakage; this catches the EDITED leak:
  // the eval set holds lightly-perturbed train docs (a token appended,
  // ids +5M) plus token-reversed controls (+6M — reversal preserves
  // unigrams but destroys 3-shingles, so they must NOT report). The
  // d03 argument makes the LSH output oracle-checkable: at r=2/64
  // bands a true pair above the threshold is missed with probability
  // < 1e-8, so the engine's banded equi-join equals the oracle's
  // exhaustive cross-join.
  private val d23 = GraftQuery(
    "d23_fuzzy_contamination",
    (s, d) => {
      val docs = Tables(s, d, "documents").select("doc_id", "text")
      val evalSet = docs.filter(col("doc_id") < 10)
        .select((col("doc_id") + 5000000).as("doc_id"),
          concat(col("text"), lit(" zq leak")).as("text"))
        .unionByName(docs
          .filter(col("doc_id") >= 490 &&
            size(split(trim(col("text")), "\\s+")) >= 8)
          .select((col("doc_id") + 6000000).as("doc_id"),
            array_join(reverse(split(trim(col("text")), "\\s+")), " ").as("text")))
      Dedup.minhashCrossNearDupPairs(evalSet, docs, "doc_id", "text",
          numHashes = 128, bands = 64, threshold = 0.5)
        .orderBy("a", "b")
    },
    Some(s"""WITH p AS (SELECT doc_id, text FROM documents),
      e0 AS (
        SELECT doc_id + 5000000 AS doc_id, text || ' zq leak' AS text
        FROM documents WHERE doc_id < 10
        UNION ALL
        SELECT doc_id + 6000000,
          array_to_string(list_reverse(string_split_regex(trim(text), '\\s+')), ' ')
        FROM documents
        WHERE doc_id >= 490 AND len(string_split_regex(trim(text), '\\s+')) >= 8),
      sh_t AS ($shingleCteSql),
      sh_e AS (${shingleCteSql.replace("FROM p", "FROM e0")}),
      j AS (
        SELECT e.doc_id AS a, t.doc_id AS b,
          CAST(len(list_intersect(e.sh, t.sh)) AS DOUBLE) /
            (len(e.sh) + len(t.sh) - len(list_intersect(e.sh, t.sh))) AS jac
        FROM sh_e e CROSS JOIN sh_t t)
      SELECT a, b, round(jac, 4) AS jaccard FROM j
      WHERE jac >= 0.5 ORDER BY a, b"""),
    bench = true)

  // --- d24: media resize accounting (stubbed codec, real plumbing) ----
  // The resize pass every image pipeline runs, with the codec stubbed
  // (no image libs in this container — see Multimodal.resizeStub): the
  // verifiable surface is the byte accounting and metadata rewrite,
  // which the oracle reproduces arithmetically (stub truncation =
  // least(bytes, budget)). Map-side only; payloads never shuffle.
  private val d24 = GraftQuery(
    "d24_media_resize",
    (s, d) => {
      val media = graft.operators.Multimodal
        .syntheticMedia(s, Tables(s, d, "documents"))
      // the before-size column rides THROUGH the resize (which only
      // rewrites payload/meta), so the audit is one scan, no self-join
      val resized = graft.operators.Multimodal.resizeStub(
        media.withColumn("_b", length(col("payload")).cast("long")), 32, 32)
      resized
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n_media"),
          sum(col("_b")).cast("long").as("bytes_before"),
          sum(length(col("payload"))).cast("long").as("bytes_after"),
          max(col("meta.width")).as("width_after"),
          max(col("meta.height")).as("height_after"))
        .orderBy("kind")
    },
    Some("""WITH m AS (
        SELECT doc_id,
          CASE WHEN doc_id % 3 = 0 THEN 'image'
               WHEN doc_id % 3 = 1 THEN 'audio'
               ELSE 'video' END AS kind,
          octet_length(encode(text)) AS b
        FROM documents)
      SELECT kind, count(*) AS n_media,
        CAST(sum(b) AS BIGINT) AS bytes_before,
        CAST(sum(least(b, 1024)) AS BIGINT) AS bytes_after,
        32 AS width_after, 32 AS height_after
      FROM m GROUP BY kind ORDER BY kind"""))

  // --- d25: boilerplate-line scrub (frequency twin of d14) ------------
  // Same planted multi-line corpus idea as d14, plus a line shared by
  // exactly TWO docs (below the minDocs=3 bar, so it must survive in
  // both). The two all-doc lines are boilerplate and vanish everywhere
  // — including their first occurrences, which d14's keep-first would
  // have preserved. Fully SQL-reproducible, so hash-checked.
  private val d25 = GraftQuery(
    "d25_boilerplate_lines",
    (s, d) => {
      val docs = Tables(s, d, "documents")
        .filter(col("doc_id") < 60)
        .select(col("doc_id"),
          concat_ws("\n",
            concat(lit("header "), col("doc_id")),
            lit("subscribe to our newsletter"),
            substring(col("text"), 1, 80),
            concat(lit("rare footer "), col("doc_id") % 30),
            lit("(c) example corp all rights reserved")).as("text"))
      Dedup.stripBoilerplateLines(docs, "doc_id", "text", minDocs = 3)
        .orderBy("doc_id")
    },
    Some("""WITH docs AS (
        SELECT doc_id,
          'header ' || doc_id || chr(10) ||
          'subscribe to our newsletter' || chr(10) ||
          substr(text, 1, 80) || chr(10) ||
          'rare footer ' || (doc_id % 30) || chr(10) ||
          '(c) example corp all rights reserved' AS text
        FROM documents WHERE doc_id < 60),
      lines AS (
        SELECT doc_id,
          unnest(string_split(text, chr(10))) AS line,
          unnest(generate_series(1, len(string_split(text, chr(10))))) AS pos
        FROM docs),
      boiler AS (
        SELECT line FROM lines
        GROUP BY line HAVING count(DISTINCT doc_id) >= 3)
      SELECT doc_id, count(*) AS n_kept,
        string_agg(line, chr(10) ORDER BY pos) AS clean_text
      FROM lines WHERE line NOT IN (SELECT line FROM boiler)
      GROUP BY doc_id ORDER BY doc_id"""))

  // --- d26: cross-source duplicate overlap matrix ---------------------
  // The corpus has one copy of each doc, so a 'mirror' source is
  // planted from every third document — each real source then shares
  // exactly its doc_id%3==0 slice with the mirror, giving a multi-pair
  // matrix whose counts and shares the oracle reproduces exactly.
  private val d26 = GraftQuery(
    "d26_source_overlap",
    (s, d) => {
      val docs = Tables(s, d, "documents").select("doc_id", "text", "source")
      val mirror = docs.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 3000000).as("doc_id"), col("text"),
          lit("mirror").as("source"))
      Dedup.sourceOverlapMatrix(docs.unionByName(mirror), "text", "source")
        .orderBy("source_a", "source_b")
    },
    Some("""WITH p AS (
        SELECT text, source FROM documents
        UNION ALL
        SELECT text, 'mirror' FROM documents WHERE doc_id % 3 = 0),
      fp AS (
        SELECT DISTINCT lower(trim(regexp_replace(text, '\s+', ' ', 'g')))
          AS f, source AS src
        FROM p),
      cnt AS (SELECT src, count(*) AS n FROM fp GROUP BY src),
      ov AS (
        SELECT a.src AS source_a, b.src AS source_b, count(*) AS shared_docs
        FROM fp a JOIN fp b ON a.f = b.f AND a.src < b.src
        GROUP BY 1, 2)
      SELECT source_a, source_b, shared_docs,
        round(shared_docs * 1.0 / ca.n, 6) AS share_of_a,
        round(shared_docs * 1.0 / cb.n, 6) AS share_of_b
      FROM ov
      JOIN cnt ca ON ca.src = source_a
      JOIN cnt cb ON cb.src = source_b
      ORDER BY source_a, source_b"""),
    bench = true)

  // --- d27: block-level payload dedup audit ---------------------------
  // Storage-style dedup at fixed 128-unit block granularity: slice each
  // payload into blocks, digest each block, and report how much of the
  // corpus's content mass is redundant below whole-payload granularity.
  // Catches what whole-payload digests (d21) cannot: the planted
  // near-copies (suffix-edited) share every block except their last, so
  // block accounting shows most of their content as duplicated while
  // file-level dedup sees them as unique. Blocks here are 128
  // CHARACTERS of the decoded payload — both engines slice the same
  // code points and md5 the same UTF-8 bytes for ANY text, where a raw
  // byte slice could not be oracle-checked (the harness DuckDB's md5 is
  // VARCHAR-only); a real media build swaps in byte slicing with
  // identical plumbing. Zero-length payloads contribute zero blocks
  // (guarded on both sides — Spark's sequence(0,-1) would otherwise
  // DESCEND and emit two phantom rows). Payloads never shuffle — the
  // explode and slicing are map-side; only (16-byte digest, block
  // length) pairs reach the two narrow aggregates. All outputs are
  // exact integers, including the ppm ratio.
  private val d27 = GraftQuery(
    "d27_block_dedup",
    (s, d) => Dedup.blockDedupStats(planted(s, d), "doc_id", "text"),
    // the block index range is a generous constant (512 blocks = 64k
    // chars, two orders above the corpus max) because DuckDB 1.0 cannot
    // lateral-join generate_series on a column; the i*128 < len filter
    // keeps only real blocks, and a doc that ever exceeds the constant
    // would change n_blocks -> caught by the gate, not silently capped
    Some(s"""WITH p AS ($plantedSql),
      b AS (
        SELECT doc_id AS media_id,
          md5(substr(text, t.i * 128 + 1, 128)) AS bfp,
          CAST(len(substr(text, t.i * 128 + 1, 128)) AS BIGINT) AS blen
        FROM p CROSS JOIN (SELECT unnest(range(0, 512)) AS i) t
        WHERE t.i * 128 < len(text)),
      s AS (
        SELECT count(DISTINCT media_id) AS n_media, count(*) AS n_blocks,
          count(DISTINCT bfp) AS distinct_blocks,
          CAST(sum(blen) AS BIGINT) AS chars_total
        FROM b),
      u AS (
        SELECT CAST(sum(ul) AS BIGINT) AS chars_dedup
        FROM (SELECT bfp, min(blen) AS ul FROM b GROUP BY bfp))
      SELECT n_media, n_blocks, distinct_blocks,
        n_blocks - distinct_blocks AS dup_blocks,
        chars_total, chars_dedup, chars_total - chars_dedup AS chars_saved,
        CAST(round(chars_dedup::DOUBLE / chars_total * 1e6) AS BIGINT) AS dedup_ppm
      FROM s CROSS JOIN u"""))

  // --- d28: asymmetric containment near-dup ----------------------------
  // The inclusion detector Jaccard misses: a snippet wholly embedded in
  // a longer doc has tiny Jaccard (|∩|/|∪| shrinks with the big doc)
  // but containment |∩|/min(|A|,|B|) = 1.0. The query plants one
  // 8-token prefix snippet per small doc (+3M ids) and runs
  // [[Dedup.containmentPairs]] over documents ∪ snippets; every planted
  // snippet must surface against its source doc, plus any natural
  // full-containment pairs. Oracle replays shingling, md5 fingerprints,
  // the doc-frequency cap, and the rounded-score threshold as SQL.
  private val d28 = GraftQuery(
    "d28_containment_neardup",
    (s, d) => {
      val docs = Tables(s, d, "documents").select("doc_id", "text")
      val snippets = docs.filter(col("doc_id") < 10)
        .select((col("doc_id") + 3000000).as("doc_id"),
          array_join(slice(split(trim(col("text")), "\\s+"), 1, 8), " ")
            .as("text"))
      Dedup.containmentPairs(docs.unionByName(snippets), "doc_id", "text",
          shingleK = 3, threshold = 0.9, maxShingleDocFreq = 10000)
        .orderBy("a", "b")
    },
    Some(s"""WITH p AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 3000000,
          array_to_string(string_split_regex(trim(text), '\\s+')[1:8], ' ')
        FROM documents WHERE doc_id < 10),
      shl AS ($shingleCteSql),
      sfp AS (
        SELECT doc_id, md5(s) AS fp
        FROM (SELECT doc_id, unnest(sh) AS s FROM shl)),
      rare AS (SELECT fp FROM sfp GROUP BY fp HAVING count(*) <= 10000),
      cand AS (SELECT sfp.doc_id, sfp.fp FROM sfp JOIN rare USING (fp)),
      sizes AS (SELECT doc_id, count(*) AS n FROM sfp GROUP BY doc_id),
      shared AS (
        SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS ns
        FROM cand x JOIN cand y ON x.fp = y.fp AND x.doc_id < y.doc_id
        GROUP BY 1, 2),
      scored AS (
        SELECT a, b, round(ns::DOUBLE / least(na.n, nb.n), 6) AS containment
        FROM shared
        JOIN sizes na ON na.doc_id = a
        JOIN sizes nb ON nb.doc_id = b)
      SELECT a, b, containment FROM scored
      WHERE containment >= 0.9 ORDER BY a, b"""),
    bench = true)

  // --- d29: structural template mining ---------------------------------
  // Form-letter / machine-generated boilerplate detection: cluster by
  // punctuation skeleton (alnum runs → 'w', case folded) so documents
  // that are all DISTINCT under content dedup — unique fillings of one
  // form — surface as one group with n_distinct_texts ≈ n_docs. The
  // plant writes 15 log-line-shaped docs (+4M ids) with distinct ids
  // and payloads but one shared "[sys] entry#N: status=ok; code=K;"
  // skeleton; the gate's top-20 report must contain that cluster plus
  // whatever natural shape groups the corpus has. Text leaves the plan
  // at two map-side md5s; one skeleton-keyed aggregate; top-k heap cut.
  private val d29 = GraftQuery(
    "d29_template_skeletons",
    (s, d) => {
      val docs = Tables(s, d, "documents").select("doc_id", "text")
      val templated = docs.filter(col("doc_id") < 15)
        .select((col("doc_id") + 4000000).as("doc_id"),
          concat(lit("[sys] entry#"), col("doc_id").cast("string"),
            lit(": status=ok; code="), (col("doc_id") % 7).cast("string"),
            lit(";")).as("text"))
      Dedup.templateSkeletons(docs.unionByName(templated),
          "doc_id", "text", minDocs = 2, topK = 20)
        .orderBy(col("n_docs").desc, col("skeleton_fp"))
    },
    Some("""WITH p AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 4000000,
          '[sys] entry#' || CAST(doc_id AS VARCHAR) ||
          ': status=ok; code=' || CAST(doc_id % 7 AS VARCHAR) || ';'
        FROM documents WHERE doc_id < 15),
      sk AS (
        SELECT doc_id,
          md5(regexp_replace(lower(trim(text)), '[a-z0-9]+', 'w', 'g'))
            AS skeleton_fp,
          md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS cfp
        FROM p),
      g AS (
        SELECT skeleton_fp, count(*) AS n_docs,
          count(DISTINCT cfp) AS n_distinct_texts,
          min(doc_id) AS example_id
        FROM sk GROUP BY 1 HAVING count(*) >= 2)
      SELECT skeleton_fp, n_docs, n_distinct_texts, example_id
      FROM g ORDER BY n_docs DESC, skeleton_fp LIMIT 20"""))

  // --- d30: near-dup threshold savings sweep ---------------------------
  // The "what does each threshold buy" table read before committing a
  // near-dup cutoff: one LSH candidate pass at the LOOSEST threshold
  // (0.5 — pairs are exact-verified Jaccard, so tighter thresholds are
  // plain filters over the same pair table), then per threshold the
  // pair count and the distinct docs touched. Sweeping costs no extra
  // candidate generation — exactly how a production calibration run
  // avoids re-shingling the corpus per candidate cutoff. The plant
  // grades mutation strength so the sweep differentiates: an appended
  // token (Jaccard ≈ 0.97, survives 0.9), a 4/5 prefix (≈ 0.8, survives 0.7),
  // a 3/5 prefix (≈ 0.6, survives only 0.5), and a 2/5 prefix (< 0.5, never a pair with
  // its source — only with the longer prefix). Thresholds compare
  // against the 4-dp rounded Jaccard on both engines.
  private val d30 = GraftQuery(
    "d30_threshold_savings",
    (s, d) => {
      val base = Tables(s, d, "documents").select("doc_id", "text")
      val ts = split(trim(col("text")), "\\s+")
      def prefix(num: Int, den: Int) = array_join(
        slice(ts, lit(1), greatest(lit(3),
          floor(size(ts) * num / den).cast("int"))), " ")
      def mutate(offset: Long, text: org.apache.spark.sql.Column) =
        base.filter(col("doc_id") < 10)
          .select((col("doc_id") + offset).as("doc_id"), text.as("text"))
      val corpus = base
        .unionByName(mutate(5000000L, concat(col("text"), lit(" graftdup"))))
        .unionByName(mutate(5200000L, prefix(3, 5)))
        .unionByName(mutate(5300000L, prefix(4, 5)))
        .unionByName(mutate(5400000L, prefix(2, 5)))
      val pairs = Dedup.minhashNearDupPairs(corpus,
        "doc_id", "text", numHashes = 128, bands = 64, threshold = 0.5)
      val exploded = pairs.select(col("jaccard"),
        explode(array(col("a"), col("b"))).as("d"))
      val per = Seq(0.5, 0.7, 0.9).map { t =>
        exploded.filter(col("jaccard") >= t)
          .agg((count(lit(1)) / 2).cast("long").as("n_pairs"),
            countDistinct(col("d")).as("n_docs_affected"))
          .select(lit((t * 1e6).round).as("threshold_ppm"),
            col("n_pairs"), col("n_docs_affected"))
      }
      per.reduce(_ unionByName _).orderBy("threshold_ppm")
    },
    Some(s"""WITH ts AS (
        SELECT doc_id, text,
          string_split_regex(trim(text), '\\s+') AS tk
        FROM documents),
      p AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 5000000, text || ' graftdup'
        FROM documents WHERE doc_id < 10
        UNION ALL
        SELECT doc_id + 5200000,
          array_to_string(tk[1 : greatest(3,
            CAST(floor(len(tk) * 3 / 5) AS INT))], ' ')
        FROM ts WHERE doc_id < 10
        UNION ALL
        SELECT doc_id + 5300000,
          array_to_string(tk[1 : greatest(3,
            CAST(floor(len(tk) * 4 / 5) AS INT))], ' ')
        FROM ts WHERE doc_id < 10
        UNION ALL
        SELECT doc_id + 5400000,
          array_to_string(tk[1 : greatest(3,
            CAST(floor(len(tk) * 2 / 5) AS INT))], ' ')
        FROM ts WHERE doc_id < 10),
      sh AS ($shingleCteSql),
      j AS (
        SELECT a.doc_id AS a, b.doc_id AS b,
          round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
            (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4)
            AS jac
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
      e AS (
        SELECT jac, a AS d FROM j WHERE jac >= 0.5
        UNION ALL
        SELECT jac, b FROM j WHERE jac >= 0.5),
      t AS (SELECT unnest([500000, 700000, 900000]) AS threshold_ppm)
      SELECT CAST(t.threshold_ppm AS BIGINT) AS threshold_ppm,
        -- count(e.jac), not count(*): an empty threshold keeps its
        -- null-extended LEFT JOIN row, which must tally as 0 pairs
        CAST(count(e.jac) / 2 AS BIGINT) AS n_pairs,
        CAST(count(DISTINCT e.d) AS BIGINT) AS n_docs_affected
      FROM t LEFT JOIN e ON e.jac >= t.threshold_ppm / 1e6
      GROUP BY 1 ORDER BY 1"""))

  // --- d31: containment path probe (the d28 auto-tuner's input) --------
  // The df-mass discriminator measured on the corpus: sum_df2 is the
  // exhaustive self-join's exact candidate-pair count, fanout = Σdf²/Σdf
  // is the statistic containmentPairs' flip guidance is written in
  // (≈10 → self-join, ≳100 → prefix; the 160× crossover is README-
  // pinned on the ZipfCorpus fixture). containmentPairsAuto runs THIS
  // probe then dispatches; gating the probe itself makes the auto
  // decision driver-verified, not just spec-claimed. One fingerprint
  // aggregate; text never shuffles; one output row.
  private val d31 = GraftQuery(
    "d31_containment_path_probe",
    (s, d) =>
      Dedup.containmentPathProbe(Tables(s, d, "documents")
        .select("doc_id", "text"), "doc_id", "text",
        shingleK = 3, maxShingleDocFreq = 10000),
    Some(s"""WITH p AS (SELECT doc_id, text FROM documents),
      shl AS ($shingleCteSql),
      sfp AS (
        SELECT doc_id, md5(s) AS fp
        FROM (SELECT doc_id, unnest(sh) AS s FROM shl)),
      dfs AS (
        SELECT fp, count(*) AS df FROM sfp
        GROUP BY fp HAVING count(*) <= 10000)
      SELECT CAST(sum(df) AS BIGINT) AS sum_df,
        CAST(sum(df * df) AS BIGINT) AS sum_df2,
        round(CASE WHEN sum(df) > 0
          THEN CAST(sum(df * df) AS DOUBLE) / CAST(sum(df) AS DOUBLE)
          ELSE 0.0 END, 4) AS fanout
      FROM dfs"""))

  // --- d32: mergeable source-sketch Jaccard census ---------------------
  // d26 answers "how much do sources share" with a content-level join;
  // d32 answers it from 128-slot MinHash sketches that are one GROUP BY
  // away from any shard — mergeable by elementwise min, so a 100 TB
  // multi-crawl census unions per-shard sketches instead of revisiting
  // content. The estimate sits NEXT TO the exact Jaccard and the
  // absolute error, so the gate verifies the sketch VALUES (md5-parity
  // permutations, replayed bit-for-bit in SQL), not just plumbing. Same
  // mirror plant as d26 → known-overlap pairs exist; the 1/128 slot
  // quantization makes est exact rationals.
  private val d32 = GraftQuery(
    "d32_source_sketch_jaccard",
    (s, d) => {
      val docs = Tables(s, d, "documents").select("doc_id", "text", "source")
      val mirror = docs.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 3000000).as("doc_id"), col("text"),
          lit("mirror").as("source"))
      Dedup.sourceSketchJaccard(docs.unionByName(mirror), "text", "source",
          numHashes = 128)
        .orderBy("source_a", "source_b")
    },
    Some("""WITH p AS (
        SELECT text, source FROM documents
        UNION ALL
        SELECT text, 'mirror' FROM documents WHERE doc_id % 3 = 0),
      fp AS (
        SELECT DISTINCT
          md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS f,
          source AS src
        FROM p),
      perm AS (SELECT unnest(range(0, 128)) AS t),
      h AS (
        SELECT src, perm.t AS t,
          CAST(('0x' || substr(md5(perm.t || ':' || f), 1, 8))::UBIGINT
            AS BIGINT) AS hv
        FROM fp CROSS JOIN perm),
      sk AS (SELECT src, t, min(hv) AS mh FROM h GROUP BY 1, 2),
      est AS (
        SELECT a.src AS source_a, b.src AS source_b,
          round(sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) / 128.0, 6)
            AS est_jaccard
        FROM sk a JOIN sk b ON a.t = b.t AND a.src < b.src
        GROUP BY 1, 2),
      cnt AS (SELECT src, count(*) AS n FROM fp GROUP BY 1),
      ov AS (
        SELECT a.src AS source_a, b.src AS source_b, count(*) AS shared
        FROM fp a JOIN fp b ON a.f = b.f AND a.src < b.src
        GROUP BY 1, 2)
      SELECT e.source_a, e.source_b, e.est_jaccard,
        round(coalesce(ov.shared, 0) * 1.0
          / (ca.n + cb.n - coalesce(ov.shared, 0)), 6) AS jaccard,
        round(abs(e.est_jaccard - round(coalesce(ov.shared, 0) * 1.0
          / (ca.n + cb.n - coalesce(ov.shared, 0)), 6)), 6) AS abs_err
      FROM est e
      LEFT JOIN ov ON ov.source_a = e.source_a AND ov.source_b = e.source_b
      JOIN cnt ca ON ca.src = e.source_a
      JOIN cnt cb ON cb.src = e.source_b
      ORDER BY e.source_a, e.source_b"""))

  // --- d33: REAL PNG pixel decode + resize, hash-gated -----------------
  // The full codec round trip, not a header peek: the fixture encodes
  // complete valid PNGs (zlib IDAT, per-row filter type rotating
  // through all five PNG filters) whose pixel values are doc_id
  // arithmetic; the query inflates + unfilters every image, computes
  // value and position-weighted sums, then RESIZES to 6x6
  // (decode → nearest-neighbor resample → re-encode → decode again)
  // and sums the resized pixels. The oracle replays every pixel and
  // every resample source index in SQL — a bug anywhere in the zlib
  // framing, filter math, channel interleave, or resample arithmetic
  // hashes red. Payloads never shuffle; decode is map-side per
  // partition (Multimodal.PixelCodec).
  private val d33 = GraftQuery(
    "d33_pixel_decode_resize",
    (s, d) => {
      val imgs = graft.operators.Multimodal.syntheticPixelImages(
        s, Tables(s, d, "documents").filter(col("doc_id") < 200))
      val dec = graft.operators.Multimodal.decodePixelStats(imgs)
      val rez = graft.operators.Multimodal.decodePixelStats(
          graft.operators.Multimodal.resizePng(imgs, 6, 6))
        .select(col("media_id"), col("sum_val").as("r_sum_val"),
          col("wsum").as("r_wsum"))
      dec.join(rez, "media_id").orderBy("media_id")
    },
    Some("""WITH p AS (
        SELECT doc_id, CAST(8 + doc_id % 9 AS INT) AS w,
          CAST(8 + doc_id % 7 AS INT) AS h,
          CAST(CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS INT)
            AS ch
        FROM documents WHERE doc_id < 200),
      px AS (
        SELECT doc_id,
          CAST(sum((doc_id + 7*c.c + 3*x.x + 5*y.y) % 251) AS BIGINT)
            AS sum_val,
          CAST(sum(((doc_id + 7*c.c + 3*x.x + 5*y.y) % 251)
            * (1 + (x.x + 3*y.y + 11*c.c) % 7)) AS BIGINT) AS wsum
        FROM p,
        LATERAL (SELECT unnest(generate_series(0, w - 1)) AS x) x,
        LATERAL (SELECT unnest(generate_series(0, h - 1)) AS y) y,
        LATERAL (SELECT unnest(generate_series(0, ch - 1)) AS c) c
        GROUP BY doc_id),
      rz AS (
        SELECT doc_id,
          CAST(sum((doc_id + 7*c.c + 3*((x.x * w) // 6)
            + 5*((y.y * h) // 6)) % 251) AS BIGINT) AS r_sum_val,
          CAST(sum(((doc_id + 7*c.c + 3*((x.x * w) // 6)
            + 5*((y.y * h) // 6)) % 251)
            * (1 + (x.x + 3*y.y + 11*c.c) % 7)) AS BIGINT) AS r_wsum
        FROM p,
        LATERAL (SELECT unnest(generate_series(0, 5)) AS x) x,
        LATERAL (SELECT unnest(generate_series(0, 5)) AS y) y,
        LATERAL (SELECT unnest(generate_series(0, ch - 1)) AS c) c
        GROUP BY doc_id)
      SELECT p.doc_id AS media_id, p.w AS width, p.h AS height,
        p.ch AS channels, px.sum_val, px.wsum, rz.r_sum_val, rz.r_wsum
      FROM p JOIN px ON p.doc_id = px.doc_id JOIN rz ON p.doc_id = rz.doc_id
      ORDER BY media_id"""),
    bench = true)

  // --- d34: near-dup pair forensics -------------------------------------
  // The review table behind a dedup decision: for every flagged
  // containment pair, both shingle-set sizes, the shared count,
  // containment NEXT TO Jaccard, and the inclusion direction. The
  // point is the contrast column — the planted snippets score
  // containment ≈ 1.0 with Jaccard ≈ 0.05 (6 shared shingles vs a
  // ~120-shingle document), which is exactly the evidence a reviewer
  // needs to see that Jaccard-only dedup would have missed the pair.
  // Same candidate work as d28; the extra columns ride the kept rows.
  private val d34 = GraftQuery(
    "d34_pair_forensics",
    (s, d) => {
      val docs = Tables(s, d, "documents").select("doc_id", "text")
      val snippets = docs.filter(col("doc_id") < 10)
        .select((col("doc_id") + 3000000).as("doc_id"),
          array_join(slice(split(trim(col("text")), "\\s+"), 1, 8), " ")
            .as("text"))
      Dedup.containmentPairs(docs.unionByName(snippets), "doc_id", "text",
          shingleK = 3, threshold = 0.9, maxShingleDocFreq = 10000,
          detailed = true)
        .orderBy("a", "b")
    },
    Some(s"""WITH p AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 3000000,
          array_to_string(string_split_regex(trim(text), '\\s+')[1:8], ' ')
        FROM documents WHERE doc_id < 10),
      shl AS ($shingleCteSql),
      sfp AS (
        SELECT doc_id, md5(s) AS fp
        FROM (SELECT doc_id, unnest(sh) AS s FROM shl)),
      rare AS (SELECT fp FROM sfp GROUP BY fp HAVING count(*) <= 10000),
      cand AS (SELECT sfp.doc_id, sfp.fp FROM sfp JOIN rare USING (fp)),
      sizes AS (SELECT doc_id, count(*) AS n FROM sfp GROUP BY doc_id),
      shared AS (
        SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS ns
        FROM cand x JOIN cand y ON x.fp = y.fp AND x.doc_id < y.doc_id
        GROUP BY 1, 2),
      scored AS (
        SELECT a, b, na.n AS n_a, nb.n AS n_b, ns AS n_shared,
          round(ns::DOUBLE / least(na.n, nb.n), 6) AS containment,
          round(ns::DOUBLE / (na.n + nb.n - ns), 6) AS jaccard,
          CASE WHEN na.n < nb.n THEN 'a_in_b'
            WHEN nb.n < na.n THEN 'b_in_a'
            ELSE 'equal_size' END AS direction
        FROM shared
        JOIN sizes na ON na.doc_id = a
        JOIN sizes nb ON nb.doc_id = b)
      SELECT a, b, n_a, n_b, n_shared, containment, jaccard, direction
      FROM scored WHERE containment >= 0.9 ORDER BY a, b"""),
    bench = true)

  // --- d35: REAL WAV/PCM audio decode + resample, hash-gated -----------
  // The audio twin of d33, closing the modality gap the FakeCodec
  // boundary never justified for PCM: RIFF header walk + little-endian
  // 16-bit samples need no entropy codec, so decode → stats (duration,
  // RMS, peak, clipping ppm) → resample to 12 kHz → re-encode →
  // re-decode is a genuine codec round trip whose every sample the
  // oracle replays in SQL (fixture samples are doc_id closed forms
  // sweeping the full int16 range — clipping extremes occur naturally).
  // A bug anywhere in the chunk walk, sign extension, channel
  // interleave, frame accounting, or the integer resample index math
  // hashes red. Payloads never shuffle; decode is map-side per
  // partition (Multimodal.WavCodec).
  private val d35 = GraftQuery(
    "d35_wav_decode_resample",
    (s, d) => {
      val wavs = graft.operators.Multimodal.syntheticWavs(
        s, Tables(s, d, "documents").filter(col("doc_id") < 200))
      val dec = graft.operators.Multimodal.decodeWavStats(wavs)
        .withColumn("rms", round(col("rms"), 6))
      val rez = graft.operators.Multimodal.decodeWavStats(
          graft.operators.Multimodal.resampleWav(wavs, 12000))
        .select(col("media_id"), col("n_frames").as("r_n_frames"),
          col("sum_val").as("r_sum_val"), col("wsum").as("r_wsum"))
      dec.join(rez, "media_id").orderBy("media_id")
    },
    Some("""WITH p AS (
        SELECT doc_id,
          CAST(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
            ELSE 44100 END AS INT) AS sr,
          CAST(1 + doc_id % 2 AS INT) AS ch,
          CAST(40 + doc_id % 50 AS INT) AS nf
        FROM documents WHERE doc_id < 200),
      sm AS (
        SELECT doc_id,
          CAST(sum(((doc_id*7 + f.f*31 + c.c*17) % 65536) - 32768)
            AS BIGINT) AS sum_val,
          CAST(sum(abs(((doc_id*7 + f.f*31 + c.c*17) % 65536) - 32768))
            AS BIGINT) AS sum_abs,
          CAST(sum((((doc_id*7 + f.f*31 + c.c*17) % 65536) - 32768)
            * (((doc_id*7 + f.f*31 + c.c*17) % 65536) - 32768))
            AS BIGINT) AS sum_sq,
          CAST(max(abs(((doc_id*7 + f.f*31 + c.c*17) % 65536) - 32768))
            AS INT) AS peak_abs,
          CAST(sum(CASE WHEN ((doc_id*7 + f.f*31 + c.c*17) % 65536) = 0
              OR ((doc_id*7 + f.f*31 + c.c*17) % 65536) = 65535
            THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
          count(*) AS total,
          CAST(sum((((doc_id*7 + f.f*31 + c.c*17) % 65536) - 32768)
            * (1 + (f.f + 11*c.c) % 7)) AS BIGINT) AS wsum
        FROM p,
        LATERAL (SELECT unnest(generate_series(0, nf - 1)) AS f) f,
        LATERAL (SELECT unnest(generate_series(0, ch - 1)) AS c) c
        GROUP BY doc_id),
      rz AS (
        SELECT doc_id,
          CAST(sum(((doc_id*7 + ((i.i * sr) // 12000)*31 + c.c*17)
            % 65536) - 32768) AS BIGINT) AS r_sum_val,
          CAST(sum((((doc_id*7 + ((i.i * sr) // 12000)*31 + c.c*17)
            % 65536) - 32768) * (1 + (i.i + 11*c.c) % 7)) AS BIGINT)
            AS r_wsum
        FROM p,
        LATERAL (SELECT unnest(generate_series(0, (nf * 12000) // sr - 1))
          AS i) i,
        LATERAL (SELECT unnest(generate_series(0, ch - 1)) AS c) c
        GROUP BY doc_id)
      SELECT p.doc_id AS media_id, p.sr AS sample_rate, p.ch AS channels,
        p.nf AS n_frames,
        CAST(p.nf * 1000000 // p.sr AS BIGINT) AS duration_us,
        sm.sum_val, sm.sum_abs, sm.sum_sq, sm.peak_abs,
        CAST(sm.n_clipped * 1000000 // sm.total AS BIGINT) AS clipping_ppm,
        round(sqrt(sm.sum_sq::DOUBLE / sm.total), 6) AS rms,
        sm.wsum,
        CAST((p.nf * 12000) // p.sr AS INT) AS r_n_frames,
        rz.r_sum_val, rz.r_wsum
      FROM p JOIN sm ON p.doc_id = sm.doc_id JOIN rz ON p.doc_id = rz.doc_id
      ORDER BY media_id"""),
    bench = true)

  // --- d36: G.711 µ-law decode + transcode to PCM16, hash-gated --------
  // The telephony-audio shape: format-7 RIFF payloads whose µ-law bytes
  // are doc_id closed forms sweeping all 256 code points; the decoder
  // expands each byte through the standard CCITT integer formula
  // (WavCodec.ulawToLinear — no table, so the oracle replays the
  // expansion itself in SQL), and the r_* columns re-decode a
  // transcoded copy (µ-law in → 8 kHz resample → 16-bit PCM re-encode
  // → re-decode), pinning the pipeline-realistic transcode direction.
  // A bug in the complement, segment shift, bias, or sign branch
  // hashes red on specific code points.
  private val d36 = GraftQuery(
    "d36_mulaw_transcode",
    (s, d) => {
      val wavs = graft.operators.Multimodal.syntheticMulawWavs(
        s, Tables(s, d, "documents").filter(col("doc_id") < 200))
      val dec = graft.operators.Multimodal.decodeWavStats(wavs)
        .withColumn("rms", round(col("rms"), 6))
      val rez = graft.operators.Multimodal.decodeWavStats(
          graft.operators.Multimodal.resampleWav(wavs, 8000))
        .select(col("media_id"), col("n_frames").as("r_n_frames"),
          col("sum_val").as("r_sum_val"), col("wsum").as("r_wsum"))
      dec.join(rez, "media_id").orderBy("media_id")
    },
    Some("""WITH p AS (
        SELECT doc_id,
          CAST(CASE WHEN doc_id % 2 = 0 THEN 8000 ELSE 16000 END AS INT)
            AS sr,
          CAST(1 + doc_id % 2 AS INT) AS ch,
          CAST(30 + doc_id % 40 AS INT) AS nf
        FROM documents WHERE doc_id < 200),
      raw AS (
        SELECT doc_id, f.f AS f, c.c AS c,
          255 - CAST((doc_id*11 + f.f*13 + c.c*29) % 256 AS INT) AS u
        FROM p,
        LATERAL (SELECT unnest(generate_series(0, nf - 1)) AS f) f,
        LATERAL (SELECT unnest(generate_series(0, ch - 1)) AS c) c),
      vals AS (
        SELECT doc_id, f, c,
          CASE WHEN u >= 128 THEN 132 - t ELSE t - 132 END AS v
        FROM (SELECT doc_id, f, c, u,
          ((u % 16) * 8 + 132) * (1 << ((u // 16) % 8)) AS t FROM raw)),
      sm AS (
        SELECT doc_id,
          CAST(sum(v) AS BIGINT) AS sum_val,
          CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
          CAST(sum(v*v) AS BIGINT) AS sum_sq,
          CAST(max(abs(v)) AS INT) AS peak_abs,
          CAST(sum(CASE WHEN v = 32767 OR v = -32768 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clipped,
          count(*) AS total,
          CAST(sum(v * (1 + (f + 11*c) % 7)) AS BIGINT) AS wsum
        FROM vals GROUP BY doc_id),
      rraw AS (
        SELECT doc_id, i.i AS i, c.c AS c,
          255 - CAST((doc_id*11 + ((i.i * sr) // 8000)*13 + c.c*29) % 256
            AS INT) AS u
        FROM p,
        LATERAL (SELECT unnest(generate_series(0, (nf * 8000) // sr - 1))
          AS i) i,
        LATERAL (SELECT unnest(generate_series(0, ch - 1)) AS c) c),
      rvals AS (
        SELECT doc_id, i, c,
          CASE WHEN u >= 128 THEN 132 - t ELSE t - 132 END AS v
        FROM (SELECT doc_id, i, c, u,
          ((u % 16) * 8 + 132) * (1 << ((u // 16) % 8)) AS t FROM rraw)),
      rz AS (
        SELECT doc_id, CAST(sum(v) AS BIGINT) AS r_sum_val,
          CAST(sum(v * (1 + (i + 11*c) % 7)) AS BIGINT) AS r_wsum
        FROM rvals GROUP BY doc_id)
      SELECT p.doc_id AS media_id, p.sr AS sample_rate, p.ch AS channels,
        p.nf AS n_frames,
        CAST(p.nf * 1000000 // p.sr AS BIGINT) AS duration_us,
        sm.sum_val, sm.sum_abs, sm.sum_sq, sm.peak_abs,
        CAST(sm.n_clipped * 1000000 // sm.total AS BIGINT) AS clipping_ppm,
        round(sqrt(sm.sum_sq::DOUBLE / sm.total), 6) AS rms,
        sm.wsum,
        CAST((p.nf * 8000) // p.sr AS INT) AS r_n_frames,
        rz.r_sum_val, rz.r_wsum
      FROM p JOIN sm ON p.doc_id = sm.doc_id JOIN rz ON p.doc_id = rz.doc_id
      ORDER BY media_id"""))

  // --- d37: G.711 A-law decode + transcode, hash-gated ------------------
  // Completes the G.711 telephony pair next to d36: format-6 payloads
  // whose A-law bytes sweep all 256 code points; the expansion (XOR 85,
  // segment shift, +8 / +264 bias split, sign on bit 7 — a DIFFERENT
  // integer path than µ-law's complement+132 bias) is replayed in SQL,
  // and the r_* columns pin the transcode direction (A-law in → 8 kHz
  // resample → PCM16 re-encode → re-decode).
  private val d37 = GraftQuery(
    "d37_alaw_transcode",
    (s, d) => {
      val wavs = graft.operators.Multimodal.syntheticAlawWavs(
        s, Tables(s, d, "documents").filter(col("doc_id") < 200))
      val dec = graft.operators.Multimodal.decodeWavStats(wavs)
        .withColumn("rms", round(col("rms"), 6))
      val rez = graft.operators.Multimodal.decodeWavStats(
          graft.operators.Multimodal.resampleWav(wavs, 8000))
        .select(col("media_id"), col("n_frames").as("r_n_frames"),
          col("sum_val").as("r_sum_val"), col("wsum").as("r_wsum"))
      dec.join(rez, "media_id").orderBy("media_id")
    },
    Some("""WITH p AS (
        SELECT doc_id,
          CAST(CASE WHEN doc_id % 2 = 0 THEN 16000 ELSE 8000 END AS INT)
            AS sr,
          CAST(1 + (doc_id + 1) % 2 AS INT) AS ch,
          CAST(25 + doc_id % 45 AS INT) AS nf
        FROM documents WHERE doc_id < 200),
      raw AS (
        SELECT doc_id, f.f AS f, c.c AS c,
          xor(CAST((doc_id*19 + f.f*23 + c.c*31) % 256 AS INT), 85) AS u
        FROM p,
        LATERAL (SELECT unnest(generate_series(0, nf - 1)) AS f) f,
        LATERAL (SELECT unnest(generate_series(0, ch - 1)) AS c) c),
      vals AS (
        SELECT doc_id, f, c,
          CASE WHEN u >= 128 THEN t ELSE -t END AS v
        FROM (SELECT doc_id, f, c, u,
          CASE WHEN (u // 16) % 8 = 0 THEN (u % 16) * 16 + 8
            ELSE ((u % 16) * 16 + 264) * (1 << ((u // 16) % 8 - 1))
          END AS t FROM raw)),
      sm AS (
        SELECT doc_id,
          CAST(sum(v) AS BIGINT) AS sum_val,
          CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
          CAST(sum(v*v) AS BIGINT) AS sum_sq,
          CAST(max(abs(v)) AS INT) AS peak_abs,
          CAST(sum(CASE WHEN v = 32767 OR v = -32768 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clipped,
          count(*) AS total,
          CAST(sum(v * (1 + (f + 11*c) % 7)) AS BIGINT) AS wsum
        FROM vals GROUP BY doc_id),
      rraw AS (
        SELECT doc_id, i.i AS i, c.c AS c,
          xor(CAST((doc_id*19 + ((i.i * sr) // 8000)*23 + c.c*31) % 256
            AS INT), 85) AS u
        FROM p,
        LATERAL (SELECT unnest(generate_series(0, (nf * 8000) // sr - 1))
          AS i) i,
        LATERAL (SELECT unnest(generate_series(0, ch - 1)) AS c) c),
      rvals AS (
        SELECT doc_id, i, c,
          CASE WHEN u >= 128 THEN t ELSE -t END AS v
        FROM (SELECT doc_id, i, c, u,
          CASE WHEN (u // 16) % 8 = 0 THEN (u % 16) * 16 + 8
            ELSE ((u % 16) * 16 + 264) * (1 << ((u // 16) % 8 - 1))
          END AS t FROM rraw)),
      rz AS (
        SELECT doc_id, CAST(sum(v) AS BIGINT) AS r_sum_val,
          CAST(sum(v * (1 + (i + 11*c) % 7)) AS BIGINT) AS r_wsum
        FROM rvals GROUP BY doc_id)
      SELECT p.doc_id AS media_id, p.sr AS sample_rate, p.ch AS channels,
        p.nf AS n_frames,
        CAST(p.nf * 1000000 // p.sr AS BIGINT) AS duration_us,
        sm.sum_val, sm.sum_abs, sm.sum_sq, sm.peak_abs,
        CAST(sm.n_clipped * 1000000 // sm.total AS BIGINT) AS clipping_ppm,
        round(sqrt(sm.sum_sq::DOUBLE / sm.total), 6) AS rms,
        sm.wsum,
        CAST((p.nf * 8000) // p.sr AS INT) AS r_n_frames,
        rz.r_sum_val, rz.r_wsum
      FROM p JOIN sm ON p.doc_id = sm.doc_id JOIN rz ON p.doc_id = rz.doc_id
      ORDER BY media_id"""))

  // --- d38: REAL GIF decode (own LZW) → re-encode → re-decode ---------
  // The d33 round-trip shape over the second compressed image format:
  // complete GIF89a files whose LZW streams this engine both writes
  // and reads (operators/Gif.scala — the dictionary coder itself is
  // implemented there, not delegated). The oracle replays every index
  // from the closed form, so a bug in code widths, LSB bit packing,
  // dictionary growth/reset, sub-block framing, or palette handling
  // diverges. sum_red == sum_idx only because the fixture palette is
  // the identity gray ramp — a decoder that ignored the color table
  // could not know that. GifCodecSpec additionally cross-validates
  // the codec against the JDK's independent ImageIO implementation.
  private val d38 = GraftQuery(
    "d38_gif_decode_roundtrip",
    (s, d) => {
      val gifs = graft.operators.GifCodec.syntheticGifs(
        s, Tables(s, d, "documents").filter(col("doc_id") < 200))
      val dec = graft.operators.GifCodec.decodeGifStats(gifs)
      val rez = graft.operators.GifCodec.decodeGifStats(
          graft.operators.GifCodec.reencodeGif(gifs))
        .select(col("media_id"), col("sum_idx").as("r_sum_idx"),
          col("wsum_idx").as("r_wsum_idx"))
      dec.join(rez, "media_id").orderBy("media_id")
    },
    Some("""WITH p AS (
        SELECT doc_id, CAST(8 + doc_id % 9 AS INT) AS w,
          CAST(8 + doc_id % 7 AS INT) AS h
        FROM documents WHERE doc_id < 200),
      px AS (
        SELECT doc_id,
          CAST(sum((doc_id + 3*x.x + 5*y.y) % 256) AS BIGINT) AS sum_idx,
          CAST(sum(((doc_id + 3*x.x + 5*y.y) % 256)
            * (1 + (x.x + 3*y.y) % 7)) AS BIGINT) AS wsum_idx
        FROM p,
        LATERAL (SELECT unnest(generate_series(0, w - 1)) AS x) x,
        LATERAL (SELECT unnest(generate_series(0, h - 1)) AS y) y
        GROUP BY doc_id)
      SELECT p.doc_id AS media_id, p.w AS width, p.h AS height,
        256 AS pal_size, px.sum_idx, px.wsum_idx,
        px.sum_idx AS sum_red,
        px.sum_idx AS r_sum_idx, px.wsum_idx AS r_wsum_idx
      FROM p JOIN px ON p.doc_id = px.doc_id
      ORDER BY media_id"""),
    bench = true)

  // --- d39: REAL JPEG pixel decode (JDK DCT) with banded gate ---------
  // The last still-image FakeCodec stand-in replaced: actual baseline
  // JFIF encode/decode through the JDK's libjpeg-lineage plugin
  // (operators/Jpeg.scala). JPEG is lossy, so unlike d33/d38 the pixel
  // plane cannot be SQL-replayed bit-exact; the gate pins what IS
  // exact (dimensions, pixel count — closed forms) and carries the
  // lossy-plane claims as 0/1 columns the oracle pins to literal 1
  // (q27's pattern): decoded mean within ±3/px of the closed-form
  // ramp, no pixel astray by > 32. JpegCodecSpec measures the actual
  // worst case (≲ 6 on the ramp) and asserts half the gate headroom.
  private val d39 = GraftQuery(
    "d39_jpeg_decode",
    (s, d) => {
      val jpgs = graft.operators.JpegCodec.syntheticJpegs(
        s, Tables(s, d, "documents").filter(col("doc_id") < 200))
      graft.operators.JpegCodec.decodeJpegGate(jpgs).orderBy("media_id")
    },
    Some("""SELECT doc_id AS media_id,
        CAST(8 + doc_id % 9 AS INT) AS width,
        CAST(8 + doc_id % 7 AS INT) AS height,
        CAST((8 + doc_id % 9) * (8 + doc_id % 7) AS BIGINT) AS n_px,
        1 AS mean_ok, 1 AS maxerr_ok
      FROM documents WHERE doc_id < 200
      ORDER BY media_id"""))

  // --- d40: REAL frame sampling over ANIMATED GIFs --------------------
  // d10's frame-offset arithmetic made genuine: multi-frame GIF89a
  // clips (graphic-control + netscape blocks, per-frame LZW streams)
  // are decoded in full and sampled at the same evenly-spaced offsets
  // (i·nF / min(4, nF)), emitting per-sampled-frame pixel statistics
  // the oracle replays from the closed form — the video-shaped half of
  // the FakeCodec boundary now has a real multi-frame container
  // behind it. One row per (clip, sampled frame).
  private val d40 = GraftQuery(
    "d40_gif_frame_sample",
    (s, d) => {
      val clips = graft.operators.GifCodec.syntheticAnimatedGifs(
        s, Tables(s, d, "documents").filter(col("doc_id") < 150))
      graft.operators.GifCodec.sampleGifFrameStats(clips, 4)
        .orderBy("media_id", "frame_idx")
    },
    Some("""WITH p AS (
        SELECT doc_id, CAST(6 + doc_id % 7 AS INT) AS w,
          CAST(6 + doc_id % 5 AS INT) AS h,
          CAST(3 + doc_id % 5 AS INT) AS nf
        FROM documents WHERE doc_id < 150),
      s AS (
        SELECT doc_id, w, h, nf,
          CAST((i.i * nf) // least(4, nf) AS INT) AS f
        FROM p,
        LATERAL (SELECT unnest(generate_series(0, least(4, nf) - 1)) AS i) i),
      px AS (
        SELECT doc_id, nf, f,
          CAST(sum((doc_id + 7*f + 3*x.x + 5*y.y) % 256) AS BIGINT)
            AS sum_idx,
          CAST(sum(((doc_id + 7*f + 3*x.x + 5*y.y) % 256)
            * (1 + (x.x + 3*y.y) % 7)) AS BIGINT) AS wsum_idx
        FROM s,
        LATERAL (SELECT unnest(generate_series(0, w - 1)) AS x) x,
        LATERAL (SELECT unnest(generate_series(0, h - 1)) AS y) y
        GROUP BY doc_id, nf, f)
      SELECT doc_id AS media_id, nf AS n_frames, f AS frame_idx,
        sum_idx, wsum_idx
      FROM px
      ORDER BY media_id, frame_idx"""))

  // --- d41: REAL BMP decode, bit-exact like d33/d38 -------------------
  // The uncompressed DIB format (operators/Bmp.scala): BGR byte order,
  // bottom-up rows, 4-byte padding — all integer plumbing, so the
  // oracle replays every channel exactly. The fixture's widths cover
  // every padding remainder, so a stride bug cannot hide. BmpCodecSpec
  // cross-validates both directions against ImageIO's BMP plugin.
  private val d41 = GraftQuery(
    "d41_bmp_decode",
    (s, d) => {
      val bmps = graft.operators.BmpCodec.syntheticBmps(
        s, Tables(s, d, "documents").filter(col("doc_id") < 200))
      graft.operators.BmpCodec.decodeBmpStats(bmps).orderBy("media_id")
    },
    Some("""WITH p AS (
        SELECT doc_id, CAST(5 + doc_id % 9 AS INT) AS w,
          CAST(5 + doc_id % 7 AS INT) AS h
        FROM documents WHERE doc_id < 200),
      px AS (
        SELECT doc_id,
          CAST(sum((doc_id + 7*c.c + 3*x.x + 5*y.y) % 253) AS BIGINT)
            AS sum_val,
          CAST(sum(((doc_id + 7*c.c + 3*x.x + 5*y.y) % 253)
            * (1 + (x.x + 3*y.y + 11*c.c) % 7)) AS BIGINT) AS wsum
        FROM p,
        LATERAL (SELECT unnest(generate_series(0, w - 1)) AS x) x,
        LATERAL (SELECT unnest(generate_series(0, h - 1)) AS y) y,
        LATERAL (SELECT unnest(generate_series(0, 2)) AS c) c
        GROUP BY doc_id)
      SELECT p.doc_id AS media_id, p.w AS width, p.h AS height,
        px.sum_val, px.wsum
      FROM p JOIN px ON p.doc_id = px.doc_id
      ORDER BY media_id"""))

  // --- d42: URL canonicalization + URL-level dedup --------------------
  // The crawl-side dedup that runs BEFORE content dedup: scheme/host
  // case, explicit :80, trailing slashes, utm_* tracking params, and
  // fragments all collapse ([[graft.operators.UrlOps]], pure native
  // column expressions — fully codegen'd, no UDF). The fixture builds
  // every messy variant from doc_id closed forms; the oracle computes
  // each URL's canonical form DIRECTLY from the same closed forms —
  // ground truth, not a regex replay — so a wrong rewrite in any
  // canonicalization step diverges. Scale shape: raw URLs never
  // shuffle; only the canonical key + counters enter the aggregate.
  /** The d42/c01 shared URL fixture: a messy raw URL from a doc id's
    * closed form (pure modular arithmetic, so it applies to ANY id —
    * the c01 pipeline feeds planted +1M/+2M ids through it too). */
  private[queries] def syntheticUrl(id: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
      // id % 11 == 7 rows are PATH-LESS (`http://host?q`, `http://
      // host:80`, `http://host/`): the authority then ends at `?` or
      // end-of-string, exercising the `:80?` collapse and the
      // query-case preservation that a always-has-a-path fixture can
      // never catch (11 is coprime to every other modulus here, so the
      // path-less rows still sweep all case/port/query/frag variants).
      // Query values carry an uppercase `V` so a lowercasing leak into
      // the query string diverges from the closed form.
      val raw = concat(
        when(id % 2 === 0, "http").otherwise("HTTP"), lit("://ex"),
        (id % 50).cast("string"),
        when(id % 3 === 0, ".COM").otherwise(".com"),
        when(id % 3 === 0, ":80").otherwise(""),
        when(id % 11 === 7, "")
          .otherwise(concat(lit("/p/"), (id % 20).cast("string"))),
        when(id % 4 === 0, "/").otherwise(""),
        when(id % 5 === 0, concat(lit("?utm_source=x&a=V"), (id % 7).cast("string")))
          .when(id % 5 === 1, concat(lit("?a=V"), (id % 7).cast("string")))
          .when(id % 5 === 2, concat(lit("?a=V"), (id % 7).cast("string"),
            lit("&utm_campaign=y")))
          .when(id % 5 === 4, "?utm_medium=z")
          .otherwise(""),
        when(id % 6 === 0, "#sec").otherwise(""))
      raw
  }

  /** SQL closed form of the canonical URL for [[syntheticUrl]] over a
    * column named `doc_id` — ground truth, NOT a regex replay:
    * path-less rows keep only the lone root slash (when %4 planted
    * one); pathed rows lose their trailing slash; queries keep their
    * uppercase V. Shared by the d42 and c01 oracles. */
  private[queries] val canonicalUrlClosedFormSql: String =
    """'http://ex' || CAST(doc_id % 50 AS VARCHAR) || '.com'
            || (CASE WHEN doc_id % 11 = 7 THEN
                  (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
                ELSE '/p/' || CAST(doc_id % 20 AS VARCHAR) END)
            || (CASE WHEN doc_id % 5 IN (0, 1, 2)
                THEN '?a=V' || CAST(doc_id % 7 AS VARCHAR) ELSE '' END)"""

  private val d42 = GraftQuery(
    "d42_url_canonical_dedup",
    (s, d) => {
      graft.operators.UrlOps.urlDedup(
          Tables(s, d, "documents")
            .select(col("doc_id"), syntheticUrl(col("doc_id")).as("url")),
          "url", "doc_id")
        .orderBy("canonical_url")
    },
    Some(s"""WITH u AS (
        SELECT doc_id,
          (CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'HTTP' END)
            || '://ex' || CAST(doc_id % 50 AS VARCHAR)
            || (CASE WHEN doc_id % 3 = 0 THEN '.COM' ELSE '.com' END)
            || (CASE WHEN doc_id % 3 = 0 THEN ':80' ELSE '' END)
            || (CASE WHEN doc_id % 11 = 7 THEN ''
                ELSE '/p/' || CAST(doc_id % 20 AS VARCHAR) END)
            || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
            || (CASE doc_id % 5
                 WHEN 0 THEN '?utm_source=x&a=V' || CAST(doc_id % 7 AS VARCHAR)
                 WHEN 1 THEN '?a=V' || CAST(doc_id % 7 AS VARCHAR)
                 WHEN 2 THEN '?a=V' || CAST(doc_id % 7 AS VARCHAR) || '&utm_campaign=y'
                 WHEN 4 THEN '?utm_medium=z'
                 ELSE '' END)
            || (CASE WHEN doc_id % 6 = 0 THEN '#sec' ELSE '' END) AS url,
          $canonicalUrlClosedFormSql
            AS canonical_url
        FROM documents)
      SELECT canonical_url, count(*) AS n_urls,
        count(DISTINCT url) AS n_raw_variants,
        min(doc_id) AS keeper_id
      FROM u GROUP BY canonical_url
      ORDER BY canonical_url"""))

  // --- d43: REAL AVI video container — decode, frame-sample, round trip
  // The video-container half of the FakeCodec boundary made real:
  // RIFF('AVI ') with an uncompressed 24-bit DIB stream is pure
  // integer plumbing (operators/Avi.scala — the WAV/BMP argument:
  // chunk walk + pixel array, NO entropy codec), so the gate replays
  // the FULL chain — decode → sample frames at the d10 offsets →
  // per-frame stats from the re-encode→re-decode planes — plus the
  // bit-exact round-trip flag and the container's closed-form encoded
  // LENGTH (232 + nF·(24 + stride·h)), which pins every header size
  // in the layout. Frame payloads are byte-identical to d41's BMP
  // pixel arrays (AviCodecSpec chains them through BmpCodec/ImageIO).
  // After d43 only entropy-coded essence (H.264-class video, MP3/AAC
  // audio) remains behind the disclosed FakeCodec.
  private val d43 = GraftQuery(
    "d43_avi_frame_sample",
    (s, d) => {
      val clips = graft.operators.AviCodec.syntheticAvis(
        s, Tables(s, d, "documents").filter(col("doc_id") < 150))
      graft.operators.AviCodec.sampleAviFrameStats(clips, 4)
        .orderBy("media_id", "frame_idx")
    },
    Some("""WITH p AS (
        SELECT doc_id, CAST(4 + doc_id % 6 AS INT) AS w,
          CAST(3 + doc_id % 4 AS INT) AS h,
          CAST(2 + doc_id % 4 AS INT) AS nf,
          CAST(10 + doc_id % 5 AS INT) AS fps
        FROM documents WHERE doc_id < 150),
      s AS (
        SELECT doc_id, w, h, nf, fps,
          CAST((i.i * nf) // least(4, nf) AS INT) AS f
        FROM p,
        LATERAL (SELECT unnest(generate_series(0, least(4, nf) - 1)) AS i) i),
      px AS (
        SELECT doc_id, f,
          CAST(sum((doc_id + 11*f + 7*c.c + 3*x.x + 5*y.y) % 249) AS BIGINT)
            AS sum_val,
          CAST(sum(((doc_id + 11*f + 7*c.c + 3*x.x + 5*y.y) % 249)
            * (1 + (x.x + 3*y.y + 11*c.c) % 7)) AS BIGINT) AS wsum
        FROM s,
        LATERAL (SELECT unnest(generate_series(0, w - 1)) AS x) x,
        LATERAL (SELECT unnest(generate_series(0, h - 1)) AS y) y,
        LATERAL (SELECT unnest(generate_series(0, 2)) AS c) c
        GROUP BY doc_id, f)
      SELECT s.doc_id AS media_id, s.w AS width, s.h AS height, s.fps,
        s.nf AS n_frames,
        CAST(232 + s.nf * (24 + ((s.w*3 + 3)//4)*4 * s.h) AS BIGINT)
          AS enc_len,
        1 AS bytes_eq, s.f AS frame_idx, px.sum_val, px.wsum
      FROM s JOIN px ON px.doc_id = s.doc_id AND px.f = s.f
      ORDER BY media_id, frame_idx"""),
    bench = true)

  // --- d44: REAL IMA ADPCM — compressed audio decoded for real --------
  // WAV format 0x11: 4-bit differential coding through two fixed
  // integer tables — COMPRESSED audio that is NOT entropy-coded, so
  // unlike MP3/AAC the decode recurrence is exactly SQL-replayable:
  // the oracle walks all 48 nibbles per clip with a RECURSIVE CTE
  // (state = (predictor, step-index), the 89-entry step table as a
  // literal list) and aggregates the identical sample statistics,
  // half-rate resample picks, and the PCM16 transcode flag. Fixture
  // header/nibbles are doc_id closed forms (Multimodal.ImaAdpcmCodec.
  // syntheticImaWavs). After d44 the FakeCodec boundary is pure
  // entropy codecs: H.264-class video, MP3/AAC audio.
  private val d44 = GraftQuery(
    "d44_ima_adpcm_decode",
    (s, d) => {
      val clips = graft.operators.Multimodal.ImaAdpcmCodec.syntheticImaWavs(
        s, Tables(s, d, "documents").filter(col("doc_id") < 150))
      graft.operators.Multimodal.ImaAdpcmCodec.decodeImaStats(clips)
        .orderBy("media_id")
    },
    Some("""WITH RECURSIVE st AS (
        SELECT doc_id, 0 AS k,
          CAST(((doc_id*7919 + 123) % 65536) - 32768 AS INT) AS pred,
          CAST(doc_id % 89 AS INT) AS idx
        FROM documents WHERE doc_id < 150
        UNION ALL
        SELECT doc_id, k + 1,
          CAST(greatest(-32768, least(32767,
            pred + CASE WHEN nib >= 8 THEN -diff ELSE diff END)) AS INT),
          CAST(greatest(0, least(88, idx +
            CASE WHEN nib % 8 < 4 THEN -1 ELSE (nib % 8 - 3) * 2 END)) AS INT)
        FROM (
          SELECT doc_id, k, pred, idx, nib,
            (step // 8)
              + CASE WHEN nib % 2 = 1 THEN step // 4 ELSE 0 END
              + CASE WHEN (nib // 2) % 2 = 1 THEN step // 2 ELSE 0 END
              + CASE WHEN (nib // 4) % 2 = 1 THEN step ELSE 0 END AS diff
          FROM (
            SELECT doc_id, k, pred, idx,
              CASE WHEN k % 2 = 0
                THEN ((doc_id*13 + 29*(k//2)) % 256) % 16
                ELSE ((doc_id*13 + 29*(k//2)) % 256) // 16 END AS nib,
              [7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,31,34,
               37,41,45,50,55,60,66,73,80,88,97,107,118,130,143,
               157,173,190,209,230,253,279,307,337,371,408,449,494,
               544,598,658,724,796,876,963,1060,1166,1282,1411,1552,
               1707,1878,2066,2272,2499,2749,3024,3327,3660,4026,4428,
               4871,5358,5894,6484,7132,7845,8630,9493,10442,11487,
               12635,13899,15289,16818,18500,20350,22385,24623,27086,
               29794,32767][idx + 1] AS step
            FROM st WHERE k < 48) a) b),
      agg AS (
        SELECT doc_id,
          CAST(count(*) AS INT) AS n_samples,
          CAST(sum(pred) AS BIGINT) AS sum_val,
          CAST(min(pred) AS INT) AS min_val,
          CAST(max(pred) AS INT) AS max_val,
          CAST(sum(pred * (1 + k % 7)) AS BIGINT) AS wsum,
          CAST(sum(CASE WHEN k % 2 = 0 AND k < 48 THEN pred ELSE 0 END)
            AS BIGINT) AS half_sum
        FROM st GROUP BY doc_id)
      SELECT doc_id AS media_id,
        CAST(8000 + (doc_id % 4) * 2000 AS INT) AS sr,
        n_samples, sum_val, min_val, max_val, wsum, half_sum,
        1 AS pcm_ok
      FROM agg ORDER BY media_id"""),
    bench = true)

  val all: Seq[GraftQuery] =
    Seq(d01, d02, d03, d04, d05, d06, d07, d08, d09, d10,
      d11, d12, d13, d14, d15, d16, d17, d18, d19, d20, d21, d22, d23,
      d24, d25, d26, d27, d28, d29, d30, d31, d32, d33, d34, d35, d36,
      d37, d38, d39, d40, d41, d42, d43, d44)
}
