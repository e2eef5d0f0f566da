package graft.queries

import graft.{GraftQuery, Tables}
import graft.operators.Sampling
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / split queries — content-hash driven, so the
  * DuckDB oracle reproduces them exactly via the same md5 prefixes.
  */
object SamplingQueries {

  // --- s01: ~10% deterministic uniform sample -------------------------
  private val s01 = GraftQuery(
    "s01_deterministic_sample",
    (s, d) =>
      Sampling.deterministicSample(
          Tables(s, d, "documents"), col("doc_id"), 0.1)
        .select(col("doc_id"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id FROM documents
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
      ORDER BY doc_id"""))

  // --- s02: 80/10/10 train/val/test split counts ----------------------
  private val s02 = GraftQuery(
    "s02_split_assignment",
    (s, d) =>
      Tables(s, d, "documents")
        .withColumn("split", Sampling.assignSplit(col("doc_id")))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"))
        .orderBy("split"),
    Some("""SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                 ELSE 'test' END AS split, count(*) AS n
      FROM documents GROUP BY 1 ORDER BY split"""))

  // --- s03: stratified downsample of the dominant language ------------
  private val s03 = GraftQuery(
    "s03_stratified_sample",
    (s, d) =>
      Sampling.stratifiedSample(Tables(s, d, "documents"),
          col("lang"), col("doc_id"), Map("en" -> 0.25))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy("lang"),
    Some("""SELECT lang, count(*) AS n FROM documents
      WHERE CASE WHEN lang = 'en'
                 THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '40'
                 ELSE TRUE END
      GROUP BY lang ORDER BY lang"""))

  // --- s04: deterministic k-subset (hash-ordered take) ----------------
  private val s04 = GraftQuery(
    "s04_deterministic_take",
    (s, d) =>
      Sampling.deterministicTakeK(Tables(s, d, "documents"), col("doc_id"), 25)
        .select(col("doc_id"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id FROM (
      SELECT doc_id FROM documents
      ORDER BY md5(CAST(doc_id AS VARCHAR)) LIMIT 25)
      ORDER BY doc_id"""))

  // --- s05: language-balanced resampling ------------------------------
  // Every language capped at the size of the smallest one; kept rows
  // are the md5-first `cap` per language. The ids_fp digest pins the
  // exact kept set, not just its size.
  private val s05 = GraftQuery(
    "s05_language_balanced",
    (s, d) =>
      Sampling.balancedByStratum(
          Tables(s, d, "documents"), col("lang"), col("doc_id"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"),
          md5(concat_ws(",",
            transform(sort_array(collect_list(col("doc_id"))),
              x => x.cast("string")))).as("ids_fp"))
        .orderBy("lang"),
    Some("""WITH ranked AS (
      SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents),
    kept AS (
      SELECT lang, doc_id FROM ranked
      WHERE rn <= (SELECT min(n) FROM
        (SELECT count(*) AS n FROM documents GROUP BY lang)))
    SELECT lang, count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id,
      md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)) AS ids_fp
    FROM kept GROUP BY lang ORDER BY lang"""))

  // --- p13 (registered here with the sampling/batching family):
  // token-budget sequence packing, sharded by source --------------------
  private val s06 = GraftQuery(
    "s06_pack_sequences",
    (s, d) => {
      val docs = Tables(s, d, "documents")
        .select(col("source"), col("doc_id"),
          graft.operators.TextAnalysis.tokenCount(col("text"))
            .cast("long").as("tok"))
      graft.operators.Packing
        .packByBudget(docs, col("source"), col("doc_id"), col("tok"), budget = 512)
        .groupBy(col("source"), col("_pack").as("pack"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("sum_tokens"))
        .orderBy("source", "pack")
    },
    Some("""WITH t AS (
      SELECT source, doc_id,
        len(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents),
    c AS (
      SELECT source, doc_id, tok,
        coalesce(sum(tok) OVER (PARTITION BY source ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
      FROM t)
    SELECT source, CAST(floor(before / 512.0) AS BIGINT) AS pack,
      count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS sum_tokens
    FROM c GROUP BY 1, 2 ORDER BY source, pack"""))

  // --- s07: sliding-window chunking (64-token chunks, stride 48) ------
  private val s07 = GraftQuery(
    "s07_chunk_windows",
    (s, d) =>
      graft.operators.TextAnalysis.chunk(
          Tables(s, d, "documents").filter(col("doc_id") < 20),
          "doc_id", "text", chunkSize = 64, stride = 48)
        .select(col("doc_id"), col("chunk_idx"),
          size(col("chunk_tokens")).cast("long").as("n_tok"),
          element_at(col("chunk_tokens"), 1).as("first_tok"))
        .orderBy("doc_id", "chunk_idx"),
    Some("""WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts
      FROM documents WHERE doc_id < 20),
    c AS (
      SELECT doc_id, ts,
        unnest(generate_series(0, greatest(len(ts) - 1, 0), 48)) AS start
      FROM t)
    SELECT doc_id, start // 48 AS chunk_idx,
      len(ts[start + 1 : least(start + 64, len(ts))]) AS n_tok,
      ts[start + 1] AS first_tok
    FROM c ORDER BY doc_id, chunk_idx"""))

  // --- s08: temperature source mixture (temp = 0.5 → sqrt fractions) --
  // Downsamples big sources toward the smallest by (n_min/n_s)^0.5; the
  // oracle recomputes the same thresholds — sqrt is IEEE exact-rounded,
  // so 256·frac rounds identically on both engines.
  private val s08 = GraftQuery(
    "s08_source_mixture",
    (s, d) =>
      Sampling.temperatureMixture(
          Tables(s, d, "documents"), col("source"), col("doc_id"), temp = 0.5)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_after"),
          md5(concat_ws(",",
            transform(sort_array(collect_list(col("doc_id"))),
              x => x.cast("string")))).as("ids_fp"))
        .orderBy("source"),
    Some("""WITH counts AS (
      SELECT source, count(*) AS n FROM documents GROUP BY source),
    lim AS (
      SELECT source,
        greatest(CAST(round(
          sqrt(CAST((SELECT min(n) FROM counts) AS DOUBLE) / n) * 256)
          AS INT), 1) AS lim
      FROM counts),
    kept AS (
      -- 2-char lowercase hex compares like the numeric bucket; lim=256
      -- (the smallest source keeps everything) needs the explicit guard
      SELECT d.source, d.doc_id
      FROM documents d JOIN lim USING (source)
      WHERE lim.lim >= 256
         OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < printf('%02x', lim.lim))
    SELECT source, count(*) AS n_after,
      md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)) AS ids_fp
    FROM kept GROUP BY source ORDER BY source"""))

  // --- s09: per-source quality cap ------------------------------------
  // At most 20 docs per source, longest first — the per-domain limit
  // of a web-corpus pipeline. WindowGroupLimit keeps the shuffle at
  // ≤ 20 rows per source per map task.
  private val s09 = GraftQuery(
    "s09_source_cap",
    (s, d) =>
      Sampling.perGroupCap(Tables(s, d, "documents"), col("source"), 20,
        col("n_chars").desc, col("doc_id"))
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy("source", "doc_id"),
    Some("""SELECT doc_id, source, n_chars FROM documents
      QUALIFY row_number() OVER (
        PARTITION BY source ORDER BY n_chars DESC, doc_id) <= 20
      ORDER BY source, doc_id"""))

  // --- s10: quality-weighted deterministic sample ---------------------
  // Keep probability proportional to document length (n_chars/400,
  // capped at 1): longer docs survive preferentially, the same verdict
  // on every run/cluster. The oracle reproduces the md5-prefix deviate
  // bit-for-bit ('0x'||hex → UBIGINT over 2^32).
  private val s10 = GraftQuery(
    "s10_weighted_sample",
    (s, d) =>
      Sampling.weightedSample(Tables(s, d, "documents"),
          col("doc_id"), col("n_chars") / lit(400.0))
        .select(col("doc_id"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id FROM documents
      WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
              / 4294967296.0
            < least(1.0, greatest(0.0, n_chars / 400.0))
      ORDER BY doc_id"""))

  // --- s11: deterministic corpus shuffle + shard assignment -----------
  // The pre-materialization "global shuffle" of a pretraining pipeline:
  // shard = 32 md5 hash bits mod nShards, pos = rank of the md5 hash
  // within the shard. Pure functions of the key — adding new docs
  // never reorders old ones relative to each other — and no global
  // sort: one exchange on shard, per-shard ranking.
  private val s11 = GraftQuery(
    "s11_corpus_shard",
    (s, d) =>
      Sampling.shardAssignment(Tables(s, d, "documents"), col("doc_id"), 8)
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy("shard", "pos"),
    Some("""SELECT doc_id,
        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 8
          AS INT) AS shard,
        CAST(row_number() OVER (
          PARTITION BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 8
          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS pos
      FROM documents
      ORDER BY shard, pos"""),
    bench = true)

  // --- s12: epoch-salted reshuffle ------------------------------------
  // Multi-epoch training wants a DIFFERENT deterministic order each
  // epoch: salting the permutation key with the epoch label re-keys the
  // whole md5 order, still RNG-free and replayable. The query emits two
  // epochs' assignments for the same docs; the driver hash pins that
  // both permutations are exactly reproducible.
  private val s12 = GraftQuery(
    "s12_epoch_shuffle",
    (s, d) => {
      val docs = Tables(s, d, "documents").filter(col("doc_id") < 40)
      def epoch(e: Int) =
        Sampling.shardAssignment(docs, col("doc_id"), 4, salt = s"epoch$e")
          .select(lit(e).as("epoch"), col("doc_id"), col("shard"), col("pos"))
      epoch(0).unionByName(epoch(1)).orderBy("epoch", "shard", "pos")
    },
    Some("""WITH base AS (SELECT doc_id FROM documents WHERE doc_id < 40),
      epochs AS (
        SELECT e.epoch, doc_id,
          md5(CAST(doc_id AS VARCHAR) || ':epoch' || CAST(e.epoch AS VARCHAR)) AS h
        FROM base CROSS JOIN (SELECT unnest([0, 1]) AS epoch) e)
      SELECT epoch, doc_id,
        CAST(('0x' || substr(h, 1, 8))::UBIGINT % 4 AS INT) AS shard,
        CAST(row_number() OVER (
          PARTITION BY epoch, ('0x' || substr(h, 1, 8))::UBIGINT % 4
          ORDER BY h, doc_id) AS BIGINT) AS pos
      FROM epochs ORDER BY epoch, shard, pos"""))

  // --- s13: contiguous global ids without a global sort ----------------
  // Per-shard ranks + driver-collected shard offsets reproduce exactly
  // the row_number() a global ORDER BY (shard, md5, key) would assign —
  // the oracle IS that global window, so the hash check proves the
  // offset arithmetic equals the single-sort semantics.
  private val s13 = GraftQuery(
    "s13_global_ids",
    (s, d) =>
      Sampling.globalIds(Tables(s, d, "documents"), col("doc_id"), nShards = 8)
        .select(col("doc_id"), col("gid"))
        .orderBy("gid"),
    Some("""SELECT doc_id,
        CAST(row_number() OVER (ORDER BY
            ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 8,
            md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS BIGINT) AS gid
      FROM documents ORDER BY gid"""))

  // --- s14: deterministic round-robin source interleave ----------------
  // Training-order materialization for multi-source corpora: rank rows
  // within each source by their hash (the source-local shuffle), then
  // order globally by (rank, source) — consecutive training rows cycle
  // through the sources instead of consuming one corpus at a time, with
  // no RNG and no global sort needed to DEFINE the order (the final
  // ORDER BY here is the oracle-determinism requirement; a pipeline
  // would hand (rank, source) to CorpusWriter as the shard/pos keys).
  //
  // train_pos itself needs NO global window (the r11 window lint's
  // point — a corpus-wide row_number serializes the corpus through one
  // task): (rank_in_source, source) is unique per row, so a row's
  // global position is a closed form over the tiny per-source count
  // table, which rides a 1-row broadcast:
  //   pos = Σ_s' min(cnt_s', r−1)          rows whose rank < r
  //       + |{s' < s : cnt_s' ≥ r}| + 1    rank = r, earlier source
  private val s14 = GraftQuery(
    "s14_source_interleave",
    (s, d) => {
      val docs = Tables(s, d, "documents").filter(col("doc_id") < 60)
      val h = md5(col("doc_id").cast("string"))
      val wSrc = Window.partitionBy(col("source")).orderBy(h, col("doc_id"))
      val ranked = docs
        .withColumn("rank_in_source", row_number().over(wSrc).cast("long"))
      val cnts = ranked.groupBy(col("source"))
        .agg(max(col("rank_in_source")).as("cnt"))
        .agg(sort_array(collect_list(struct(col("source"), col("cnt"))))
          .as("_cnts"))
      val r = col("rank_in_source")
      ranked.crossJoin(broadcast(cnts))
        .withColumn("train_pos",
          aggregate(col("_cnts"), lit(0L),
            (acc, x) => acc + least(x.getField("cnt"), r - lit(1L))) +
          size(filter(col("_cnts"), x =>
            x.getField("cnt") >= r && x.getField("source") < col("source")))
            .cast("long") + lit(1L))
        .select(col("train_pos"), col("doc_id"), col("source"),
          col("rank_in_source"))
        .orderBy("train_pos")
    },
    Some("""WITH r AS (
        SELECT doc_id, source,
          CAST(row_number() OVER (PARTITION BY source
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
            AS rank_in_source
        FROM documents WHERE doc_id < 60)
      SELECT CAST(row_number() OVER (
          ORDER BY rank_in_source, source, doc_id) AS BIGINT) AS train_pos,
        doc_id, source, rank_in_source
      FROM r ORDER BY train_pos"""))

  // --- s15: curriculum stages (difficulty-ordered equal-count cuts) ---
  // Length-ordered curriculum (the classic short-to-long baseline; any
  // difficulty proxy — perplexity t11, quality t17 — drops in the same
  // slot): rank by (n_chars, doc_id), cut into 4 equal-count stages
  // with exact ntile semantics. The operator computes the global rank
  // from range-partitioned per-range windows + a bounded offsets
  // aggregate — no single-partition ntile window (see
  // Sampling.curriculumStages), which is what the DuckDB oracle uses
  // and what a naive Spark port would have copied.
  private val s15 = GraftQuery(
    "s15_curriculum_stages",
    (s, d) => {
      val staged = Sampling.curriculumStages(
        Tables(s, d, "documents"),
        Seq(col("n_chars"), col("doc_id")), stages = 4)
      staged.groupBy(col("stage"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .orderBy("stage")
    },
    Some("""WITH st AS (
        SELECT n_chars,
          CAST(ntile(4) OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS stage
        FROM documents)
      SELECT stage, count(*) AS n_docs,
        min(n_chars) AS min_chars, max(n_chars) AS max_chars
      FROM st GROUP BY stage ORDER BY stage"""))

  // --- s16: per-source token-budget sampling --------------------------
  // Mixture construction under a token budget (how real pretraining
  // mixes are specified): within each source, walk documents in the
  // deterministic md5 order and keep them while the running token
  // total stays inside the per-source budget. One window shuffle
  // keyed on source (sources fill in parallel); the budget check is a
  // running sum over narrow (source, doc, n_tokens) rows — text never
  // shuffles. Summary output: what each source contributed.
  private val s16 = GraftQuery(
    "s16_token_budget_sample",
    (s, d) => {
      val budget = 20000L
      val docs = Tables(s, d, "documents")
        .select(col("doc_id"), col("source"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
      val h = md5(col("doc_id").cast("string"))
      val w = Window.partitionBy(col("source")).orderBy(h, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs
        .withColumn("_cum", sum(col("n_tokens")).over(w))
        .filter(col("_cum") <= budget)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("tokens_kept"),
          max(col("_cum")).as("budget_used"))
        .orderBy("source")
    },
    Some("""WITH docs AS (
        SELECT doc_id, source,
          CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
          md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents),
      cum AS (
        SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY source
          ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
        FROM docs)
      SELECT source, count(*) AS n_docs,
        CAST(sum(n_tokens) AS BIGINT) AS tokens_kept,
        max(c) AS budget_used
      FROM cum WHERE c <= 20000 GROUP BY source ORDER BY source"""))

  // --- s17: materialize packed training sequences ---------------------
  // The step after s06's pack ASSIGNMENT: per (source, pack), join the
  // member documents in order with an EOS separator into the actual
  // training sequence. The per-group collect is bounded by the pack
  // budget itself (a pack holds ~512 tokens by construction), so
  // sort_array(collect_list(...)) is bounded-memory per group — this
  // is the one place collect_list is safe BY CONSTRUCTION, and the
  // comparison surface is the sequence's md5 + length, not megabytes
  // of text.
  private val s17 = GraftQuery(
    "s17_pack_texts",
    (s, d) => {
      val docs = Tables(s, d, "documents")
        .select(col("source"), col("doc_id"), col("text"),
          graft.operators.TextAnalysis.tokenCount(col("text"))
            .cast("long").as("tok"))
      val packed = graft.operators.Packing
        .packByBudget(docs, col("source"), col("doc_id"), col("tok"), budget = 512)
      packed.groupBy(col("source"), col("_pack").as("pack"))
        .agg(count(lit(1)).as("n_docs"),
          array_join(
            transform(
              sort_array(collect_list(struct(col("doc_id"), col("text")))),
              e => e.getField("text")),
            "<|eos|>").as("_seq"))
        .select(col("source"), col("pack"), col("n_docs"),
          length(col("_seq")).cast("long").as("seq_chars"),
          md5(col("_seq")).as("seq_md5"))
        .orderBy("source", "pack")
    },
    Some("""WITH t AS (
        SELECT source, doc_id, text,
          len(string_split_regex(trim(text), '\s+')) AS tok
        FROM documents),
      c AS (
        SELECT *, coalesce(sum(tok) OVER (PARTITION BY source
          ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
          0) AS before
        FROM t),
      p AS (
        SELECT source, CAST(floor(before / 512.0) AS BIGINT) AS pack,
          doc_id, text
        FROM c)
      SELECT source, pack, count(*) AS n_docs,
        CAST(length(string_agg(text, '<|eos|>' ORDER BY doc_id)) AS BIGINT)
          AS seq_chars,
        md5(string_agg(text, '<|eos|>' ORDER BY doc_id)) AS seq_md5
      FROM p GROUP BY source, pack ORDER BY source, pack"""),
    bench = true)

  // --- s18: deterministic negative sampling (contrastive pairs) -------
  // Contrastive training wants k negatives per anchor, uniform-ish,
  // reproducible, and never the anchor itself. Anchors map to s13's
  // contiguous gid space; negative j is gid + (1 + md5(gid:j) mod
  // (N-1)) mod N — a nonzero offset, so self-pairing is impossible by
  // construction and every negative is resolved by an equi-join on
  // gid (map-side hash compute, one join; no RNG state anywhere).
  private val s18 = GraftQuery(
    "s18_negative_samples",
    (s, d) => {
      val k = 3
      val docs = Tables(s, d, "documents").select("doc_id")
      val n = docs.count()
      // pmod(h, n-1) with n=1 is pmod-by-zero → null, which would
      // silently drop every negative instead of failing
      require(n >= 2, s"negative sampling needs at least two documents, corpus has $n")
      val ids = Sampling.globalIds(docs, col("doc_id"), nShards = 8)
        .select(col("doc_id"), col("gid"))
      val anchors = ids.filter(col("doc_id") < 50)
        .select(col("doc_id").as("anchor_id"), col("gid"))
        .withColumn("j", explode(array((1 to k).map(lit): _*)))
        .withColumn("_step",
          pmod(conv(substring(md5(concat(col("gid").cast("string"), lit(":"),
            col("j").cast("string"))), 1, 8), 16, 10).cast("long"),
            lit(n - 1)) + 1)
        .withColumn("neg_gid", pmod(col("gid") + col("_step"), lit(n)))
      anchors
        .join(ids.select(col("gid").as("neg_gid"), col("doc_id").as("neg_id")),
          "neg_gid")
        .select(col("anchor_id"), col("j").cast("long").as("j"), col("neg_id"))
        .orderBy("anchor_id", "j")
    },
    Some("""WITH g AS (
        SELECT doc_id,
          CAST(row_number() OVER (ORDER BY
              ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 8,
              md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS BIGINT) AS gid
        FROM documents),
      nn AS (SELECT count(*) AS n FROM documents),
      a AS (
        SELECT doc_id AS anchor_id, gid FROM g WHERE doc_id < 50),
      x AS (
        SELECT anchor_id, gid, j
        FROM a CROSS JOIN (SELECT unnest([1, 2, 3]) AS j)),
      p AS (
        SELECT anchor_id, j,
          (gid + 1 + CAST(('0x' || substr(md5(CAST(gid AS VARCHAR) || ':' ||
            CAST(j AS VARCHAR)), 1, 8))::UBIGINT % (n - 1) AS BIGINT)) % n
            AS neg_gid
        FROM x CROSS JOIN nn)
      SELECT anchor_id, CAST(j AS BIGINT) AS j, g.doc_id AS neg_id
      FROM p JOIN g ON g.gid = p.neg_gid
      ORDER BY anchor_id, j"""))

  // --- s19: split-leakage audit (near-dups straddling train/test) -----
  // The hygiene check every eval split needs: content-hash splits keep
  // EXACT copies together only if the split key is the content; keyed
  // on doc_id (the common real-world case), a near-duplicate pair can
  // straddle the boundary and leak eval signal into training. Plants
  // perturbed copies (+7M, one token appended), splits everything by
  // s02's md5 rule, and reports every near-dup pair with one side in
  // train and the other in val/test — the cross-corpus LSH operator
  // (d23) does the pair generation, so the audit scales like any
  // banded near-dup pass.
  private val s19 = GraftQuery(
    "s19_split_leakage",
    (s, d) => {
      val docs = Tables(s, d, "documents").select("doc_id", "text")
      val planted = docs.filter(col("doc_id") < 40)
        .select((col("doc_id") + 7000000).as("doc_id"),
          concat(col("text"), lit(" zq leak")).as("text"))
      val corpus = docs.unionByName(planted)
        .withColumn("split", Sampling.assignSplit(col("doc_id")))
      val train = corpus.filter(col("split") === "train")
      val heldOut = corpus.filter(col("split") =!= "train")
      graft.operators.Dedup.minhashCrossNearDupPairs(heldOut, train, "doc_id", "text",
          numHashes = 128, bands = 64, threshold = 0.5)
        .select(col("a").as("held_out_id"), col("b").as("train_id"),
          col("jaccard"))
        .orderBy("held_out_id", "train_id")
    },
    Some(s"""WITH p AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 7000000, text || ' zq leak'
        FROM documents WHERE doc_id < 40),
      sp AS (
        SELECT doc_id, text,
          CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
            THEN 'train' ELSE 'held' END AS split
        FROM p),
      sh AS (${shSql("p")}),
      tr AS (SELECT s1.doc_id, sh.sh FROM sp s1 JOIN sh ON s1.doc_id = sh.doc_id
             WHERE s1.split = 'train'),
      ho AS (SELECT s1.doc_id, sh.sh FROM sp s1 JOIN sh ON s1.doc_id = sh.doc_id
             WHERE s1.split = 'held'),
      -- EXACT candidate restriction (r14, for the 10x sf1 sweep):
      -- J(h,t) >= 0.5 > 0 requires a shared shingle, so the pair join
      -- runs over the shingle inverted index instead of |ho| x |tr| —
      -- same result set at any positive threshold, linear-ish work
      cand AS MATERIALIZED (
        SELECT DISTINCT eh.doc_id AS hid, et.doc_id AS tid
        FROM (SELECT doc_id, unnest(sh) AS s FROM ho) eh
        JOIN (SELECT doc_id, unnest(sh) AS s FROM tr) et ON eh.s = et.s),
      j AS (
        SELECT h.doc_id AS held_out_id, t.doc_id AS train_id,
          CAST(len(list_intersect(h.sh, t.sh)) AS DOUBLE) /
            (len(h.sh) + len(t.sh) - len(list_intersect(h.sh, t.sh))) AS jac
        FROM cand c JOIN ho h ON h.doc_id = c.hid
                    JOIN tr t ON t.doc_id = c.tid)
      SELECT held_out_id, train_id, round(jac, 4) AS jaccard FROM j
      WHERE jac >= 0.5 ORDER BY held_out_id, train_id"""))

  // --- s20: DSIR importance weights (target = English docs) -----------
  // Data Selection via Importance Resampling (Xie et al. 2023): weight
  // every doc by how much its hashed-bigram distribution looks like
  // the target domain (here lang='en') versus the raw corpus. One
  // tokenize+hash scan feeds the raw distribution, the target
  // distribution, and the per-doc scoring through a reused exchange;
  // the 65536-bucket log-ratio table broadcasts. The oracle recomputes
  // the same smoothed log-likelihood ratios — ln on identical doubles
  // and round(...,6) absorb engine-side sum ordering (t11 precedent).
  private val s20 = GraftQuery(
    "s20_dsir_weights",
    (s, d) =>
      Sampling.dsirWeights(Tables(s, d, "documents"), "doc_id", "text",
          isTarget = col("lang") === "en")
        .orderBy("doc_id"),
    Some("""WITH toks AS (
        SELECT doc_id, lang = 'en' AS tgt,
          string_split_regex(trim(lower(text)), '\s+') AS t
        FROM documents),
      bg AS (
        SELECT doc_id, tgt,
          CAST(('0x' || substr(md5(t[g] || ' ' || t[g+1]), 1, 8))::UBIGINT
            % 65536 AS BIGINT) AS b
        FROM (SELECT doc_id, tgt, t,
                unnest(generate_series(1, len(t) - 1)) AS g
              FROM toks)),
      db AS (
        SELECT doc_id, tgt, b, count(*) AS c FROM bg GROUP BY 1, 2, 3),
      rawd AS (SELECT b, sum(c) AS craw FROM db GROUP BY 1),
      tgtd AS (SELECT b, sum(c) AS ctgt FROM db WHERE tgt GROUP BY 1),
      dist AS (
        SELECT rawd.b, craw, coalesce(ctgt, 0) AS ctgt
        FROM rawd LEFT JOIN tgtd ON rawd.b = tgtd.b),
      tot AS (SELECT sum(craw) AS traw, sum(ctgt) AS ttgt FROM dist),
      lr AS (
        SELECT b,
          ln((ctgt + 0.5) / (ttgt + 32768.0)) -
          ln((craw + 0.5) / (traw + 32768.0)) AS lr
        FROM dist CROSS JOIN tot)
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
        round(sum(c * lr) + 0, 6) AS dsir_logratio
      FROM db JOIN lr USING (b)
      GROUP BY doc_id ORDER BY doc_id"""))

  /** The d03-family 3-shingle CTE body over an arbitrary source table. */
  private def shSql(table: String): String =
    s"""SELECT doc_id, list_distinct(list_transform(
        generate_series(1, greatest(1, len(string_split_regex(trim(text), '\\s+')) - 2)),
        i -> CASE WHEN len(string_split_regex(trim(text), '\\s+')) >= 3
          THEN string_split_regex(trim(text), '\\s+')[i] || ' ' ||
               string_split_regex(trim(text), '\\s+')[i+1] || ' ' ||
               string_split_regex(trim(text), '\\s+')[i+2]
          ELSE array_to_string(string_split_regex(trim(text), '\\s+'), ' ') END)) AS sh
        FROM $table"""

  // --- s21: weighted token-budget mixture -----------------------------
  // The training-mix step with explicit target WEIGHTS: a global token
  // budget × per-source weights → deterministic per-source keep ratios
  // (expected kept tokens = weight × budget), md5-deviate acceptance,
  // per-source accounting; off-mix sources drop. Complements s16,
  // which fills every source to the SAME fixed budget by a running-sum
  // walk (exact cutoff, order-biased toward md5-early docs) — s21 is
  // the unbiased proportional thinning a weighted pretraining mix
  // specifies. Two narrow aggregates + a broadcast ratio table + a
  // map-side filter — nothing corpus-sized shuffles.
  // The gate column is the keep ratio scaled to an integer ppm
  // (round(round(ratio,6)·10⁶), the operator's rounded double re-scaled
  // with the identical op sequence in the oracle): an integer hash is
  // immune to any harness engine's float FORMATTING drift, which a
  // round-6 double is not. The double stays available on the operator
  // API (Sampling.tokenBudgetMix, property-tested); only the driver
  // gate uses the ppm form.
  private val s21 = GraftQuery(
    "s21_token_budget_mix",
    (s, d) =>
      Sampling.tokenBudgetMix(Tables(s, d, "documents"), "doc_id", "text",
          "source",
          weights = Map("src0" -> 0.4, "src1" -> 0.25, "src2" -> 0.15,
            "src3" -> 0.2),
          budgetTokens = 3000)
        .select(col("source"), col("n_docs_kept"), col("n_tokens_kept"),
          round(col("keep_ratio") * 1e6).cast("long").as("keep_ratio_ppm"))
        .orderBy("source"),
    Some("""WITH base AS (
        SELECT doc_id, source,
          CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS tok
        FROM documents),
      r AS (
        SELECT source,
          least(1.0,
            CASE source WHEN 'src0' THEN 0.4 WHEN 'src1' THEN 0.25
              WHEN 'src2' THEN 0.15 WHEN 'src3' THEN 0.2 ELSE 0.0 END
            * 3000.0 / sum(tok)) AS ratio
        FROM base GROUP BY source),
      kept AS (
        SELECT b.source, b.tok, r.ratio
        FROM base b JOIN r USING (source)
        WHERE ('0x' || substr(md5(CAST(b.doc_id AS VARCHAR)), 1, 8))::UBIGINT
          / 4294967296.0 < r.ratio)
      SELECT source, count(*) AS n_docs_kept,
        CAST(sum(tok) AS BIGINT) AS n_tokens_kept,
        CAST(round(round(any_value(ratio), 6) * 1e6) AS BIGINT) AS keep_ratio_ppm
      FROM kept GROUP BY source ORDER BY source"""))

  // --- s22: length-bucket padding audit -------------------------------
  // Choosing sequence-length buckets before batching: each doc lands
  // in the smallest power-of-two cap that holds it (over-cap docs are
  // truncated to the top), and the audit reports what each rung costs
  // in padding and truncation. Pure integer arithmetic end to end —
  // the when-ladder assignment and the waste sums hash-match exactly.
  private val s22 = GraftQuery(
    "s22_length_buckets",
    (s, d) =>
      Sampling.lengthBucketAudit(
          Tables(s, d, "documents").select(
            graft.operators.TextAnalysis.tokenCount(col("text"))
              .cast("long").as("tok")),
          col("tok"))
        .orderBy("bucket_cap"),
    Some("""WITH t AS (
        SELECT CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS tok
        FROM documents),
      b AS (
        SELECT tok,
          CAST(CASE WHEN tok <= 32 THEN 32 WHEN tok <= 64 THEN 64
               WHEN tok <= 128 THEN 128 WHEN tok <= 256 THEN 256
               ELSE 512 END AS BIGINT) AS bucket_cap,
          least(tok, 512) AS kept
        FROM t)
      SELECT bucket_cap, count(*) AS n_docs,
        CAST(sum(kept) AS BIGINT) AS kept_tokens,
        CAST(sum(bucket_cap - kept) AS BIGINT) AS pad_tokens,
        CAST(sum(greatest(tok - 512, 0)) AS BIGINT) AS truncated_tokens,
        round(sum(bucket_cap - kept)::DOUBLE / (count(*) * bucket_cap), 6)
          AS pad_frac
      FROM b GROUP BY bucket_cap ORDER BY bucket_cap"""),
    bench = true)

  // --- s23: deterministic k-fold cross-validation split ---------------
  // Fold membership is a pure salted-hash function of doc_id (see
  // Sampling.kfoldAssignment), so folds are leakage-free by
  // construction and stable under corpus growth. The query reports the
  // per-fold balance audit a CV user checks first: doc count, token
  // mass, and source coverage — one map-side projection plus a k-row
  // aggregate.
  private val s23 = GraftQuery(
    "s23_kfold_split",
    (s, d) =>
      Sampling.kfoldAssignment(Tables(s, d, "documents"), col("doc_id"), 5)
        .groupBy("fold")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("n_chars"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy("fold"),
    Some("""SELECT
        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':fold'), 1, 8))
          ::UBIGINT % 5 AS INT) AS fold,
        count(*) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS n_chars,
        count(DISTINCT source) AS n_sources
      FROM documents GROUP BY fold ORDER BY fold"""),
    bench = true)

  // --- s24: temperature-scaled source mixture -------------------------
  // The multilingual-pretraining reweight: sampling share ∝ token
  // mass^(1/T), so T=1 keeps natural proportions and higher T flattens
  // toward uniform, upsampling low-resource sources. Complements s21
  // (explicit target weights) with the derived-share form every
  // multilingual recipe quotes. Same shapes as s21: two narrow
  // aggregates, a broadcast share table, one map-side md5 filter; the
  // audit ships integer-ppm shares so the hash is float-format-proof.
  // pow() is the one cross-engine float op; its ≤1-ulp drift sits 10
  // orders below the ppm rounding grain.
  private val s24 = GraftQuery(
    "s24_temperature_mix",
    (s, d) =>
      Sampling.temperatureBudgetMix(Tables(s, d, "documents"), "doc_id", "text",
          "source", temperature = 0.7, budgetTokens = 5000)
        .orderBy("source"),
    Some("""WITH base AS (
        SELECT doc_id, source,
          CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS tok
        FROM documents),
      m AS (
        SELECT source, sum(tok) AS total,
          pow(sum(tok)::DOUBLE, 1.0 / 0.7) AS pw
        FROM base GROUP BY source),
      r AS (
        SELECT source, total, pw / (SELECT sum(pw) FROM m) AS p,
          least(1.0, pw / (SELECT sum(pw) FROM m) * 5000.0 / total) AS ratio
        FROM m),
      kept AS (
        SELECT b.source, b.tok, r.p, r.ratio
        FROM base b JOIN r USING (source)
        WHERE ('0x' || substr(md5(CAST(b.doc_id AS VARCHAR)), 1, 8))::UBIGINT
          / 4294967296.0 < r.ratio)
      SELECT source, count(*) AS n_docs_kept,
        CAST(sum(tok) AS BIGINT) AS n_tokens_kept,
        CAST(round(any_value(p) * 1e6) AS BIGINT) AS target_share_ppm,
        CAST(round(any_value(ratio) * 1e6) AS BIGINT) AS keep_ratio_ppm
      FROM kept GROUP BY source ORDER BY source"""))

  // --- s25: sample representativeness audit ---------------------------
  // Before trusting an eval/dev sample, check it covers every
  // (lang, source) cell near its corpus share: per cell, corpus count,
  // the s01 deterministic 10% sample's count, and the coverage in ppm.
  // One pass computes both sides — the sample membership is the same
  // map-side md5 predicate s01 uses, aggregated as a conditional count
  // (no join of two scans, no second read of the corpus).
  // the membership predicate is DERIVED from the same threshold
  // deterministicSample computes (not a re-hardcoded constant), so the
  // audit can never silently diverge from the sample it claims to
  // measure; the oracle interpolates the same cutoff as 2-digit hex
  private val s25Cut = Sampling.bucketThreshold256(0.1)
  private val s25 = GraftQuery(
    "s25_sample_coverage",
    (s, d) =>
      Tables(s, d, "documents")
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_corpus"),
          sum(when(Sampling.md5Bucket256(col("doc_id")) < s25Cut, 1L)
            .otherwise(0L)).as("n_sample"))
        .select(col("lang"), col("source"), col("n_corpus"), col("n_sample"),
          round(col("n_sample").cast("double") / col("n_corpus") * 1e6)
            .cast("long").as("coverage_ppm"))
        .orderBy("lang", "source"),
    Some(f"""SELECT lang, source, count(*) AS n_corpus,
        CAST(sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '$s25Cut%02x'
          THEN 1 ELSE 0 END) AS BIGINT) AS n_sample,
        CAST(round(sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '$s25Cut%02x'
          THEN 1 ELSE 0 END)::DOUBLE / count(*) * 1e6) AS BIGINT) AS coverage_ppm
      FROM documents GROUP BY lang, source ORDER BY lang, source"""))

  // --- s26: waterfilled mixture allocation -----------------------------
  // The cap-aware budget solver (Σ min(m_j, w_j·λ) = B): proportional
  // targets over-ask small sources and evaporate the surplus; the
  // water level λ redistributes it. Weights cover six sources sized so
  // the fixture exercises BOTH regimes — three cap (fully taken) and
  // three scale at λ — plus the excluded-source path (14 unweighted
  // sources drop). The oracle replays the sort, the prefix/suffix
  // window cap test, λ, and the allocations with identical float
  // association.
  private val s26 = GraftQuery(
    "s26_waterfill_mix",
    (s, d) =>
      Sampling.waterfillBudgetMix(Tables(s, d, "documents"),
          "doc_id", "text", "source",
          weights = Map("src0" -> 0.35, "src1" -> 0.25, "src2" -> 0.20,
            "src3" -> 0.10, "src4" -> 0.06, "src5" -> 0.04),
          budgetTokens = 6000)
        .orderBy("source"),
    Some("""WITH base AS (
        SELECT source,
          CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS tok
        FROM documents),
      w(src, w) AS (VALUES ('src0', 0.35), ('src1', 0.25), ('src2', 0.20),
        ('src3', 0.10), ('src4', 0.06), ('src5', 0.04)),
      m AS (
        SELECT source, CAST(sum(tok) AS BIGINT) AS m, any_value(w.w) AS w
        FROM base JOIN w ON w.src = source
        GROUP BY source),
      m2 AS (SELECT source, m, w, m::DOUBLE / w AS ratio FROM m),
      r AS (
        SELECT *,
          sum(m) OVER (ORDER BY ratio, source
            ROWS UNBOUNDED PRECEDING) AS prefixM,
          coalesce(sum(w) OVER (ORDER BY ratio, source
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) AS sufW
        FROM m2),
      c AS (
        SELECT *, (prefixM::DOUBLE + ratio * sufW) <= 6000.0 AS capped
        FROM r),
      l AS (
        SELECT (6000.0 - sum(CASE WHEN capped THEN m ELSE 0 END)::DOUBLE)
            / sum(CASE WHEN capped THEN 0 ELSE w END) AS lambda
        FROM c)
      SELECT source, m AS n_tokens,
        CASE WHEN capped THEN m
          ELSE CAST(round(w * lambda) AS BIGINT) END AS alloc_tokens,
        CAST(capped AS INTEGER) AS capped,
        CASE WHEN capped THEN CAST(1000000 AS BIGINT)
          ELSE CAST(round(w * lambda / m * 1e6) AS BIGINT)
          END AS keep_ratio_ppm
      FROM c CROSS JOIN l ORDER BY source"""))

  // --- s27: epoch-capped waterfill -------------------------------------
  // The data-constrained regime: when the budget exceeds what one pass
  // over the weighted sources supplies, real mixture plans REPEAT
  // sources (up to E epochs) rather than evaporate budget. Same
  // closed-form solver as s26 with caps E·m_j; keep_ratio_ppm becomes
  // epochs-in-ppm (capped sources pin at E·1e6, uncapped land
  // anywhere in (0, E·1e6)). Budget 9000 against ~1.45k-token sources
  // at E = 2 puts the heavy-weight sources at the epoch cap and the
  // light ones under λ — both regimes in one fixture, robust to the
  // driver's testdata regeneration (masses sit near 1.3–1.6k per
  // source at every sf).
  private val s27 = GraftQuery(
    "s27_epoch_waterfill_mix",
    (s, d) =>
      Sampling.waterfillBudgetMix(Tables(s, d, "documents"),
          "doc_id", "text", "source",
          weights = Map("src0" -> 0.35, "src1" -> 0.25, "src2" -> 0.20,
            "src3" -> 0.10, "src4" -> 0.06, "src5" -> 0.04),
          budgetTokens = 9000, maxEpochs = 2)
        .withColumnRenamed("keep_ratio_ppm", "epochs_ppm")
        .orderBy("source"),
    Some("""WITH base AS (
        SELECT source,
          CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS tok
        FROM documents),
      w(src, w) AS (VALUES ('src0', 0.35), ('src1', 0.25), ('src2', 0.20),
        ('src3', 0.10), ('src4', 0.06), ('src5', 0.04)),
      m AS (
        SELECT source, CAST(sum(tok) AS BIGINT) AS m, any_value(w.w) AS w
        FROM base JOIN w ON w.src = source
        GROUP BY source),
      m2 AS (SELECT source, m, w, m * 2 AS c,
        (m * 2)::DOUBLE / w AS ratio FROM m),
      r AS (
        SELECT *,
          sum(c) OVER (ORDER BY ratio, source
            ROWS UNBOUNDED PRECEDING) AS prefixC,
          coalesce(sum(w) OVER (ORDER BY ratio, source
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) AS sufW
        FROM m2),
      c AS (
        SELECT *, (prefixC::DOUBLE + ratio * sufW) <= 9000.0 AS capped
        FROM r),
      l AS (
        SELECT (9000.0 - sum(CASE WHEN capped THEN c ELSE 0 END)::DOUBLE)
            / sum(CASE WHEN capped THEN 0 ELSE w END) AS lambda
        FROM c)
      SELECT source, m AS n_tokens,
        CAST(CASE WHEN capped THEN c
          ELSE CAST(round(w * lambda) AS BIGINT) END AS BIGINT)
          AS alloc_tokens,
        CAST(capped AS INTEGER) AS capped,
        CASE WHEN capped THEN CAST(2000000 AS BIGINT)
          ELSE CAST(round(w * lambda / m * 1e6) AS BIGINT)
          END AS epochs_ppm
      FROM c CROSS JOIN l ORDER BY source"""))

  // --- s28: duplicate-cluster-aware split assignment -------------------
  // The constructive twin of s19: s19 DETECTS held-out/train leakage
  // after a naive per-doc split; this PREVENTS the exact-dup case by
  // construction — every member of a content-fingerprint cluster
  // inherits the split of the cluster's min-id representative, so a
  // duplicated document can never sit in train and val at once.
  // Planted exact copies (doc_id+7M, same text, like s19's plant)
  // guarantee multi-member clusters regardless of how the driver
  // regenerates testdata; n_docs_moved counts members whose group
  // split differs from their naive per-doc split — the leakage the
  // naive assignment would have caused.
  //
  // Scale shape: fingerprint first (text leaves the plan at the md5),
  // one fp-keyed exchange for the min-id representative, one narrow
  // (fp, rep) join back, then a 3-row aggregate. Same cost class as
  // d01's exact dedup.
  private val s28 = GraftQuery(
    "s28_group_split",
    (s, d) => {
      val base = Tables(s, d, "documents").select("doc_id", "text")
      val planted = base.filter(col("doc_id") < 40)
        .select((col("doc_id") + 7000000).as("doc_id"), col("text"))
      val docs = base.unionByName(planted)
        .select(col("doc_id"),
          graft.operators.TextAnalysis.fingerprint(col("text")).as("fp"))
      Sampling.groupAwareSplit(docs, col("fp"), col("doc_id"))
        .withColumn("naive", Sampling.assignSplit(col("doc_id")))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("fp")).as("n_clusters"),
          sum(when(col("split") =!= col("naive"), 1L).otherwise(0L))
            .as("n_docs_moved"))
        .orderBy("split")
    },
    Some("""WITH p AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 7000000, text FROM documents WHERE doc_id < 40),
      n AS (
        SELECT doc_id,
          md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        FROM p),
      c AS (SELECT fp, min(doc_id) AS rep FROM n GROUP BY fp),
      a AS (
        SELECT nn.doc_id, nn.fp,
          CASE WHEN substr(md5(CAST(c.rep AS VARCHAR)), 1, 2) < 'cc'
              THEN 'train'
            WHEN substr(md5(CAST(c.rep AS VARCHAR)), 1, 2) < 'e6'
              THEN 'val'
            ELSE 'test' END AS split,
          CASE WHEN substr(md5(CAST(nn.doc_id AS VARCHAR)), 1, 2) < 'cc'
              THEN 'train'
            WHEN substr(md5(CAST(nn.doc_id AS VARCHAR)), 1, 2) < 'e6'
              THEN 'val'
            ELSE 'test' END AS naive
        FROM n nn JOIN c USING (fp))
      SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(count(DISTINCT fp) AS BIGINT) AS n_clusters,
        CAST(sum(CASE WHEN split <> naive THEN 1 ELSE 0 END) AS BIGINT)
          AS n_docs_moved
      FROM a GROUP BY split ORDER BY split"""))

  // --- s29: annealed temperature-mixture schedule ----------------------
  // The epoch curriculum s24 is one frame of: T decays 2.0 → 0.686
  // over four epochs (decay 0.7), so training starts smoothed toward
  // uniform (low-resource sources upsampled) and anneals toward
  // natural proportions. Emits the schedule table (epoch × source →
  // temperature/target-share/keep-ratio ppm), derived from ONE corpus
  // token aggregate reused across all epochs. Float parity: the exact
  // 1/T doubles computed in Scala are interpolated into the oracle
  // text, so pow sees bit-identical exponents on both engines; the
  // Σ pw sum-order caveat (s24) is absorbed by the ppm grain.
  private val s29Temps: Seq[Double] =
    (0 until 4).map(e => 2.0 * math.pow(0.7, e))
  private val s29Budget = 500000L

  private def s29EpochSql(e: Int, t: Double): String =
    s"""SELECT CAST($e AS BIGINT) AS epoch, source,
        CAST(round($t * 1e6) AS BIGINT) AS temperature_ppm,
        CAST(round(pw / sumpw * 1e6) AS BIGINT) AS target_share_ppm,
        CAST(round(least(1.0, pw / sumpw * ${s29Budget.toDouble}
          / total::DOUBLE) * 1e6) AS BIGINT) AS keep_ratio_ppm
      FROM (SELECT source, total, pow(total::DOUBLE, ${1.0 / t}) AS pw,
          sum(pow(total::DOUBLE, ${1.0 / t})) OVER () AS sumpw
        FROM masses)"""

  private val s29 = GraftQuery(
    "s29_annealed_mixture",
    (s, d) =>
      Sampling.annealedMixtureSchedule(Tables(s, d, "documents"),
          "doc_id", "text", "source", s29Temps, s29Budget)
        .orderBy("epoch", "source"),
    Some(s"""WITH masses AS (
        SELECT source, sum(len(string_split_regex(trim(text), '\\s+')))
          AS total
        FROM documents GROUP BY source)
      SELECT * FROM (
        ${s29Temps.zipWithIndex.map { case (t, e) => s29EpochSql(e, t) }
          .mkString("\n        UNION ALL\n        ")})
      ORDER BY epoch, source"""))

  // --- s30: fixed context-length efficiency sweep ----------------------
  // The "pick the sequence length" curve: if every doc becomes ONE
  // fixed-L sequence (pad short, truncate long), what does each L
  // cost? Short L truncates content away; long L pads capacity away.
  // Reports, per candidate L: utilization (kept tokens over n·L
  // capacity) and truncation loss (tokens cut over corpus tokens),
  // both exact-integer ratios in ppm. s22 answers the variable-bucket
  // variant (smallest rung per doc); this is the single-global-cap
  // trade. One token-count pass; the sweep is a 5-way explode of
  // narrow (tok, cap) rows into one keyed aggregate.
  private val s30 = GraftQuery(
    "s30_context_length_sweep",
    (s, d) => {
      val caps = Seq(64, 128, 256, 512, 1024)
      Tables(s, d, "documents")
        .select(graft.operators.TextAnalysis.tokenCount(col("text"))
          .cast("long").as("tok"))
        .withColumn("cap", explode(array(caps.map(c => lit(c.toLong)): _*)))
        .groupBy(col("cap"))
        .agg(count(lit(1)).as("n_docs"),
          sum(least(col("tok"), col("cap"))).as("kept_tokens"),
          sum(greatest(col("tok") - col("cap"), lit(0L)))
            .as("truncated_tokens"),
          round(sum(least(col("tok"), col("cap"))).cast("double") /
              (count(lit(1)) * col("cap")) * 1e6).cast("long")
            .as("utilization_ppm"),
          round(sum(greatest(col("tok") - col("cap"), lit(0L)))
              .cast("double") / sum(col("tok")) * 1e6).cast("long")
            .as("truncation_loss_ppm"))
        .orderBy("cap")
    },
    Some("""WITH t AS (
        SELECT CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
          AS tok
        FROM documents),
      g AS (
        SELECT tok, cap FROM t
        CROSS JOIN (SELECT CAST(unnest([64, 128, 256, 512, 1024]) AS BIGINT)
          AS cap))
      SELECT cap, count(*) AS n_docs,
        CAST(sum(least(tok, cap)) AS BIGINT) AS kept_tokens,
        CAST(sum(greatest(tok - cap, 0)) AS BIGINT) AS truncated_tokens,
        CAST(round(sum(least(tok, cap))::DOUBLE / (count(*) * cap) * 1e6)
          AS BIGINT) AS utilization_ppm,
        CAST(round(sum(greatest(tok - cap, 0))::DOUBLE / sum(tok) * 1e6)
          AS BIGINT) AS truncation_loss_ppm
      FROM g GROUP BY cap ORDER BY cap"""))

  // --- s31: sequence packing over REAL BPE token ids -------------------
  // s17's twin with the tokenizer made real (verdict r13 §3): pack
  // budgets and boundaries computed from [[graft.operators.Bpe]]
  // token COUNTS instead of whitespace words, and the packed payload
  // gated as the md5 of the ordered token-ID stream itself — so the
  // gate pins tokenizer + packing TOGETHER (a drifting merge table or
  // a re-ordered pack both diverge). Oracle replays the full 24-round
  // training + encode (TextQueries.bpeTrainCtes, the t35 chain) and
  // then the s17 running-sum pack over the id counts. The per-pack
  // collect is bounded by the pack budget itself (s17's argument).
  private val s31 = GraftQuery(
    "s31_pack_bpe_ids",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      val model = graft.operators.Bpe
        .train(s, docs, "text", TextQueries.bpeMergeRounds)
      val enc = graft.operators.Bpe
        .encode(s, docs.filter(col("doc_id") < 120), "doc_id", "text", model)
      val perDoc = enc.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("tok"),
          array_join(transform(
            sort_array(collect_list(struct(col("pos"), col("token_id")))),
            e => e.getField("token_id").cast("string")), ",").as("_ids"))
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      val packed = graft.operators.Packing
        .packByBudget(perDoc, col("source"), col("doc_id"), col("tok"),
          budget = 512)
      packed.groupBy(col("source"), col("_pack").as("pack"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tok")).as("bpe_tokens"),
          md5(array_join(transform(
            sort_array(collect_list(struct(col("doc_id"), col("_ids")))),
            e => e.getField("_ids")), ",")).as("ids_md5"))
        .orderBy("source", "pack")
    },
    Some(s"""WITH ${TextQueries.bpeTrainCtes(TextQueries.bpeMergeRounds)},
      docw AS MATERIALIZED (
        SELECT d.doc_id, wi.i AS widx, d.ws[wi.i] AS word
        FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
              FROM documents WHERE doc_id < 120) d,
             LATERAL (SELECT unnest(generate_series(1, len(d.ws))) AS i) wi
        WHERE regexp_matches(d.ws[wi.i], '^[a-z0-9]+$$')),
      alpha AS MATERIALIZED (
        SELECT DISTINCT substring(word, gi.i, 1) AS sym
        FROM w, LATERAL (SELECT unnest(generate_series(1, length(word)))
                         AS i) gi),
      vocab AS MATERIALIZED (
        SELECT sym AS token,
          CAST(row_number() OVER (ORDER BY sym) - 1 AS BIGINT) AS token_id
        FROM alpha
        UNION ALL
        SELECT m.lhs || m.rhs,
          (SELECT count(*) FROM alpha) + m.rank - 1
        FROM (${TextQueries.bpeMergeUnion(TextQueries.bpeMergeRounds)}) m),
      enc AS MATERIALIZED (
        SELECT dw.doc_id, dw.widx, st.state
        FROM docw dw JOIN s${TextQueries.bpeMergeRounds} st
          ON st.word = dw.word),
      toks AS MATERIALIZED (
        SELECT t.doc_id, t.widx, tj.j, v.token_id
        FROM (SELECT doc_id, widx,
                string_split(substring(state, 2, length(state) - 2), '  ')
                  AS syms
              FROM enc) t,
             LATERAL (SELECT unnest(generate_series(1, len(t.syms))) AS j) tj
        JOIN vocab v ON v.token = t.syms[tj.j]),
      perdoc AS MATERIALIZED (
        SELECT t.doc_id, d.source,
          CAST(count(*) AS BIGINT) AS tok,
          string_agg(CAST(t.token_id AS VARCHAR), ','
            ORDER BY t.widx, t.j) AS ids
        FROM toks t JOIN documents d USING (doc_id)
        GROUP BY t.doc_id, d.source),
      c AS (
        SELECT *, coalesce(sum(tok) OVER (PARTITION BY source
          ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
          0) AS before
        FROM perdoc),
      pk AS (
        SELECT source, CAST(floor(before / 512.0) AS BIGINT) AS pack,
          doc_id, tok, ids
        FROM c)
      SELECT source, pack, count(*) AS n_docs,
        CAST(sum(tok) AS BIGINT) AS bpe_tokens,
        md5(string_agg(ids, ',' ORDER BY doc_id)) AS ids_md5
      FROM pk GROUP BY source, pack ORDER BY source, pack"""))

  val all: Seq[GraftQuery] =
    Seq(s01, s02, s03, s04, s05, s06, s07, s08, s09, s10, s11, s12, s13,
      s14, s15, s16, s17, s18, s19, s20, s21, s22, s23, s24, s25, s26,
      s27, s28, s29, s30, s31)
}
