package graft.queries

import graft.{GraftQuery, Tables}
import graft.sources.{CorpusReader, CorpusWriter}
import org.apache.spark.sql.functions._

/** Driver-gated ingest surface: the JSONL corpus writer/reader pair
  * exercised END-TO-END inside the correctness gate, not just in unit
  * specs. The query exports the driver's `documents` table to sharded
  * JSONL, re-ingests it with [[CorpusReader.readJsonl]], and reports a
  * per-(source, lang) content audit keyed on the content-addressed
  * doc_id. The DuckDB oracle never sees the exported files — it
  * recomputes the same audit from the ORIGINAL table (the md5
  * normalization is SQL-replayable), so a hash match proves the
  * export→import cycle preserved every document byte-exactly: any
  * corruption, dropped row, or mangled field changes a count or an
  * md5 extremum.
  */
object IngestQueries {

  // --- i01: JSONL export → re-ingest round-trip audit ------------------
  // Scale shape: the export is [[CorpusWriter.writeJsonl]]'s one
  // shard-keyed exchange + per-shard sort; the re-read is a plain
  // schema'd JSON scan (no inference pass); the audit is one narrow
  // aggregate over (source, lang, doc_id) — text leaves the plan at
  // the md5. At 100 TB this is the standard corpus-materialization
  // validation pass: write shards, read them back, compare
  // content-addressed inventories.
  private val i01 = GraftQuery(
    "i01_jsonl_roundtrip",
    (s, d) => {
      val docs = Tables(s, d, "documents")
        .select(col("text"), col("lang"), col("source"))
      val out = java.nio.file.Files
        .createTempDirectory("graft-i01").toString
      CorpusWriter.writeJsonl(docs, col("text"), out, nShards = 4)
      CorpusReader.readJsonl(s, out, recursive = true)
        .groupBy(col("source"), col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("doc_id")).as("n_distinct"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .orderBy("source", "lang")
    },
    Some("""WITH ids AS (
        SELECT source, lang,
          md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS doc_id
        FROM documents)
      SELECT source, lang, count(*) AS n_docs,
        count(DISTINCT doc_id) AS n_distinct,
        min(doc_id) AS min_id, max(doc_id) AS max_id
      FROM ids GROUP BY source, lang ORDER BY source, lang"""))

  // --- i02: raw-text-lines export → re-ingest round-trip audit ---------
  // The one-document-per-line layout (sentence/paragraph corpora):
  // export every document's text as one raw line, re-ingest with
  // [[CorpusReader.readTextLines]], and audit the content-addressed id
  // inventory against the original table. Valid because the driver's
  // documents are single-line and non-blank (both asserted by the
  // count match itself: a newline inside a text would split a doc and
  // change n_docs; a blank would drop one). Same scale shape as i01
  // with a splittable plain-text scan instead of the JSON parse.
  private val i02 = GraftQuery(
    "i02_textlines_roundtrip",
    (s, d) => {
      val docs = Tables(s, d, "documents").select(col("text"))
      val out = java.nio.file.Files
        .createTempDirectory("graft-i02").toString
      docs.write.mode("overwrite").text(out)
      CorpusReader.readTextLines(s, out)
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("doc_id")).as("n_distinct"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
    },
    Some("""WITH ids AS (
        SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS doc_id
        FROM documents)
      SELECT count(*) AS n_docs, count(DISTINCT doc_id) AS n_distinct,
        min(doc_id) AS min_id, max(doc_id) AS max_id
      FROM ids"""))

  // --- i03: one-document-per-FILE export → wholetext re-ingest ---------
  // The crawl-extract layout ([[CorpusReader.readTextFiles]]): each
  // document lives in its own file, `wholetext` keeps a file one row
  // (a doc can never split across partitions). The export writes a
  // bounded 100-doc subset through partitionBy(doc_id) — one row per
  // doc ⇒ exactly one part file per doc directory — and the audit
  // proves every byte survived the cycle via the content-addressed
  // inventory (the collapse-then-trim normalization in
  // [[CorpusReader]] absorbs the text sink's trailing newline; a
  // trim-FIRST order would not — trim strips only spaces). Bounded
  // BY DESIGN: a per-file layout at corpus scale is a listing
  // pathology, which is exactly why the production readers are the
  // sharded i01/i02 layouts; this gate covers the reader used at the
  // crawl-extract EDGE, where per-file inputs are what upstream hands
  // you.
  private val i03 = GraftQuery(
    "i03_textfiles_roundtrip",
    (s, d) => {
      val docs = Tables(s, d, "documents")
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), col("text").as("value"))
      val out = java.nio.file.Files
        .createTempDirectory("graft-i03").toString
      docs.write.mode("overwrite").partitionBy("doc_id").text(out)
      CorpusReader.readTextFiles(s, out, recursive = true)
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("doc_id")).as("n_distinct"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
    },
    Some("""WITH ids AS (
        SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS doc_id
        FROM documents WHERE doc_id < 100)
      SELECT count(*) AS n_docs, count(DISTINCT doc_id) AS n_distinct,
        min(doc_id) AS min_id, max(doc_id) AS max_id
      FROM ids"""))

  // --- i04: CSV export → re-ingest round-trip audit --------------------
  // The quoting/escaping gate: CSV is the one interchange format where
  // serialization can silently corrupt text (embedded commas, quotes,
  // leading zeros...). Export the documents table through Spark's
  // RFC-4180 writer, re-ingest with [[CorpusReader.readCsv]], and
  // hash-match the content-addressed inventory against the ORIGINAL
  // table — any writer/reader escaping asymmetry changes an md5
  // extremum. Same audit shape (and oracle) as i01; only the codec
  // under test differs.
  private val i04 = GraftQuery(
    "i04_csv_roundtrip",
    (s, d) => {
      // readCsv is single-line by contract (multiLine would make the
      // scan non-splittable) — so a text with an embedded newline
      // must fail THIS export loudly, not mis-split on re-read: the
      // writer would quote it as a multi-line record that FAILFAST
      // then rejects with an opaque malformed-row error.
      val docs = Tables(s, d, "documents")
        .select(
          when(col("text").rlike("[\\r\\n]"), raise_error(lit(
            "i04: embedded newline in text — CSV interchange is " +
            "single-line only; export this corpus as JSONL instead")))
            .otherwise(col("text")).as("text"),
          col("lang"), col("source"))
      val out = java.nio.file.Files
        .createTempDirectory("graft-i04").toString
      docs.write.mode("overwrite").option("header", "true").csv(out)
      CorpusReader.readCsv(s, out)
        .groupBy(col("source"), col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("doc_id")).as("n_distinct"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .orderBy("source", "lang")
    },
    Some("""WITH ids AS (
        SELECT source, lang,
          md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS doc_id
        FROM documents)
      SELECT source, lang, count(*) AS n_docs,
        count(DISTINCT doc_id) AS n_distinct,
        min(doc_id) AS min_id, max(doc_id) AS max_id
      FROM ids GROUP BY source, lang ORDER BY source, lang"""))

  // --- i05: hive-partitioned export → partition-PRUNED slice read ------
  // The layout decision that matters most at 100 TB: write the corpus
  // partitioned by (source, lang) so a slice query never opens
  // non-matching files. The gate exports, re-reads ONLY the
  // (src18, en) slice through the partition filter (the re-read's
  // partition columns come back from directory names, proving the
  // layout round-trips values), and audits the slice's ids and raw
  // content digests against the original table. Pruning itself is
  // plan-pinned in CorpusWriterSpec via inputFiles — exactly one
  // directory's files are touched.
  private val i05 = GraftQuery(
    "i05_partitioned_slice",
    (s, d) => {
      val docs = Tables(s, d, "documents")
        .select("doc_id", "text", "lang", "source")
      val out = java.nio.file.Files
        .createTempDirectory("graft-i05").toString
      CorpusWriter.writeHivePartitioned(docs, out, Seq("source", "lang"))
      s.read.parquet(out)
        .filter(col("source") === "src18" && col("lang") === "en")
        .groupBy(col("source"), col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("doc_id")).as("n_distinct"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"),
          min(md5(col("text"))).as("min_md5"),
          max(md5(col("text"))).as("max_md5"))
        .orderBy("source", "lang")
    },
    Some("""SELECT source, lang, count(*) AS n_docs,
        count(DISTINCT doc_id) AS n_distinct,
        min(doc_id) AS min_id, max(doc_id) AS max_id,
        min(md5(text)) AS min_md5, max(md5(text)) AS max_md5
      FROM documents WHERE source = 'src18' AND lang = 'en'
      GROUP BY source, lang ORDER BY source, lang"""))

  // --- i06: the STREAMING front door, driver-gated end to end ----------
  // The last un-gated execution path (r13 verdict item 5): every
  // streaming twin was spec-pinned against its batch kernel, but no
  // registry row ever ran Structured Streaming under the DuckDB hash
  // gate. This one drives the live-ingest pipeline a crawl runs:
  //
  //   JSONL shards → readJsonlStream → streamingDedup (content
  //   fingerprint) → streamingTokenBudget (per-source admission) →
  //   parquet sink
  //
  // as TWO chained AvailableNow streaming queries with a durable
  // intermediate (the production stage boundary; it also sidesteps
  // the engine's multi-stateful-operator restrictions by design, not
  // by accident). Determinism: the fixture is the keep-first-deduped
  // base corpus plus planted IDENTICAL copies — whichever copy the
  // stream's dedup keeps, the surviving ROW is byte-identical — and
  // the budget admits in docId order within the single AvailableNow
  // batch (the operator's documented in-batch contract), with docId a
  // hex-prefix of the content address, so the whole admitted set is a
  // pure function of content that DuckDB replays with a recursive
  // greedy fold (budget skip semantics are a fold, not a cumsum).
  private val i06 = GraftQuery(
    "i06_streaming_ingest_dedup_budget",
    (s, d) => {
      import graft.streaming.StatefulOps
      val docs = Tables(s, d, "documents")
        .select("doc_id", "text", "lang", "source")
      // keep-first dedup the RAW corpus first so the fixture's only
      // duplicates are the planted ones — and plant them as EXACT
      // copies of base rows, so whichever copy the stream's dedup
      // keeps, the surviving row is byte-identical
      val base = graft.operators.Dedup.exactKeepFirst(docs, "text", "doc_id")
      val fixture = base.select("text", "lang", "source").unionByName(
        base.filter(col("doc_id") < 50).select("text", "lang", "source"))
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-i06").toString
      CorpusWriter.writeJsonl(fixture, col("text"), s"$tmp/in", nShards = 4)
      // stage 1: stream-ingest + content-fingerprint dedup → parquet
      val stream = CorpusReader
        .readJsonlStream(s, s"$tmp/in",
          options = Map("recursiveFileLookup" -> "true"))
        .withColumn("_nid",
          expr("cast(conv(substring(doc_id, 1, 15), 16, 10) as bigint)"))
        .withColumn("_ts", expr("timestamp_micros(_nid % 1000000000)"))
      val deduped = StatefulOps.streamingDedup(stream, "text", "_ts",
        delay = "0 seconds")
      deduped.writeStream.format("parquet")
        .option("path", s"$tmp/dedup").option("checkpointLocation", s"$tmp/ck1")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
      // stage 2: stream the curated intermediate through the per-source
      // token-budget admission → parquet
      val mid = s.readStream.schema(
          s.read.parquet(s"$tmp/dedup").schema)
        .parquet(s"$tmp/dedup")
      val budgeted = StatefulOps.streamingTokenBudget(
        StatefulOps.sourcedDocs(mid, "source", "_nid", "text", Some("_ts")),
        budgetTokens = 800)
      budgeted.writeStream.format("parquet")
        .option("path", s"$tmp/out").option("checkpointLocation", s"$tmp/ck2")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
      s.read.parquet(s"$tmp/out")
        .select(col("source"), col("docId").as("doc_num"),
          col("nTokens").as("n_tokens"), col("budgetUsed").as("budget_used"))
        .orderBy("source", "doc_num")
    },
    Some("""WITH RECURSIVE base AS MATERIALIZED (
        SELECT doc_id, text, source FROM (
          SELECT *, row_number() OVER (
            PARTITION BY lower(trim(regexp_replace(text, '\s+', ' ', 'g')))
            ORDER BY doc_id) AS rn
          FROM documents) WHERE rn = 1),
      -- content-addressed re-ingest: planted identical copies collapse
      -- onto base rows, so the deduped stream IS base keyed by content
      nid AS MATERIALIZED (
        SELECT CAST(CAST(('0x' || substr(
            md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))), 1, 15))
            AS UBIGINT) AS BIGINT) AS nid,
          source,
          CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS tok
        FROM base),
      ord AS MATERIALIZED (
        SELECT *, CAST(row_number() OVER (PARTITION BY source ORDER BY nid)
          AS BIGINT) AS rn
        FROM nid),
      fold AS (
        SELECT source, CAST(0 AS BIGINT) AS rn, CAST(0 AS BIGINT) AS used,
          CAST(NULL AS BIGINT) AS nid, CAST(NULL AS BIGINT) AS tok,
          FALSE AS adm
        FROM (SELECT DISTINCT source FROM ord)
        UNION ALL
        SELECT o.source, o.rn,
          CASE WHEN f.used + o.tok <= 800 THEN f.used + o.tok
               ELSE f.used END,
          o.nid, o.tok, f.used + o.tok <= 800
        FROM fold f JOIN ord o ON o.source = f.source AND o.rn = f.rn + 1)
      SELECT source, nid AS doc_num, tok AS n_tokens,
        CAST(used AS BIGINT) AS budget_used
      FROM fold WHERE adm ORDER BY source, doc_num"""))

  // --- i07: streaming sessionization under the hash gate ---------------
  // streamingSessionize driver-gated via the i06 pattern (r14 verdict
  // item 2): durable parquet fixture → AvailableNow file stream →
  // session_window aggregate in append mode → parquet sink. What the
  // gate pins beyond the batch-parity spec: the WATERMARK EMISSION
  // CONTRACT. Append mode emits a session only once the watermark
  // passes its window end; AvailableNow runs a final no-data
  // micro-batch that advances the watermark to max(event time) −
  // delay, so with delay=0 the emitted set is exactly the sessions
  // with last_event + gap <= global max ts, BOUNDARY INCLUSIVE (both
  // facts pinned empirically in spark-shell before this oracle was
  // written; the sessions still open at end-of-stream live on in the
  // checkpoint, exactly what a restarted stream must be free to
  // extend). The oracle replays that closure rule in SQL on top of
  // q49's gaps-and-islands sessionization. One input file ⇒ one data
  // batch ⇒ the in-batch ordering contract covers the whole fixture.
  private val i07 = GraftQuery(
    "i07_streaming_sessionize",
    (s, d) => {
      import graft.streaming.StatefulOps
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-i07").toString
      Tables(s, d, "events").select(col("user_id"), col("ts"))
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/in")
      val stream = s.readStream
        .schema(s.read.parquet(s"$tmp/in").schema).parquet(s"$tmp/in")
      StatefulOps.streamingSessionize(
          stream, "user_id", "ts", "30 minutes", "0 seconds")
        .writeStream.format("parquet")
        .option("path", s"$tmp/out")
        .option("checkpointLocation", s"$tmp/ck")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
      s.read.parquet(s"$tmp/out").orderBy("user_id", "start_us")
    },
    Some("""WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
      mx AS (SELECT max(us) AS wm FROM e),
      t AS (
        SELECT user_id, event_id, us,
          CASE WHEN us - lag(us) OVER w >= 1800000000 OR
                    lag(us) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      s AS (
        SELECT user_id, us, sum(new_sess) OVER (PARTITION BY user_id
          ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sid
        FROM t),
      sess AS (
        SELECT user_id, min(us) AS start_us, max(us) AS end_us,
          CAST(count(*) AS BIGINT) AS n_events
        FROM s GROUP BY user_id, sid)
      SELECT user_id, start_us, end_us, n_events
      FROM sess, mx WHERE end_us + 1800000000 <= wm
      ORDER BY user_id, start_us"""))

  // --- i08: streaming timed funnel under the hash gate ------------------
  // streamingFunnel's INCREMENTAL semantics gated row-exactly: each
  // advance emits one stage row when reached (flatMapGroupsWithState,
  // no watermark dependence), so the full output lands in the single
  // data batch. The oracle encodes the incremental rule, which is
  // STRICTER than q55's batch windows on one edge: a next-stage event
  // tied on timestamp with the previous stage's completion but with a
  // SMALLER event_id was already processed when the stage filled, so
  // it cannot advance the funnel — hence the row-value comparison
  // (us, event_id) > (prev_us, prev_eid), not q55's us >= prev_us.
  // Under the (ts, event_id) in-batch sort the advance picks the
  // minimum eligible (us, event_id), which is what the row_number
  // over that order replays.
  private val i08 = GraftQuery(
    "i08_streaming_funnel",
    (s, d) => {
      import graft.streaming.StatefulOps
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-i08").toString
      Tables(s, d, "events").select(
          col("user_id").cast("string").as("key"),
          unix_micros(col("ts")).as("tsMicros"),
          col("event_id").as("eventId"),
          col("event_type").as("eventType"),
          col("value"))
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/in")
      import s.implicits._
      val stream = s.readStream
        .schema(s.read.parquet(s"$tmp/in").schema).parquet(s"$tmp/in")
        .as[StatefulOps.TouchEvent]
      StatefulOps.streamingFunnel(stream)
        .writeStream.format("parquet")
        .option("path", s"$tmp/out")
        .option("checkpointLocation", s"$tmp/ck")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
      s.read.parquet(s"$tmp/out")
        .select(col("key"), col("stage"), col("tsMicros").as("ts_us"),
          col("eventId").as("event_id"))
        .orderBy("key", "stage")
    },
    Some("""WITH e AS (
        SELECT CAST(user_id AS VARCHAR) AS key, event_id, event_type,
          epoch_us(ts) AS us
        FROM events),
      v AS (
        SELECT key, us AS v_us, event_id AS v_eid FROM (
          SELECT key, us, event_id, row_number() OVER (
            PARTITION BY key ORDER BY us, event_id) AS rn
          FROM e WHERE event_type = 'view') WHERE rn = 1),
      c AS (
        SELECT key, us AS c_us, event_id AS c_eid FROM (
          SELECT e.key, e.us, e.event_id, row_number() OVER (
            PARTITION BY e.key ORDER BY e.us, e.event_id) AS rn
          FROM e JOIN v USING (key)
          WHERE e.event_type = 'click'
            AND (e.us, e.event_id) > (v.v_us, v.v_eid)
            AND e.us <= v.v_us + 3600000000) WHERE rn = 1),
      p AS (
        SELECT key, us AS p_us, event_id AS p_eid FROM (
          SELECT e.key, e.us, e.event_id, row_number() OVER (
            PARTITION BY e.key ORDER BY e.us, e.event_id) AS rn
          FROM e JOIN c USING (key)
          WHERE e.event_type = 'purchase'
            AND (e.us, e.event_id) > (c.c_us, c.c_eid)
            AND e.us <= c.c_us + 3600000000) WHERE rn = 1)
      SELECT key, '1_view' AS stage, v_us AS ts_us, v_eid AS event_id
      FROM v
      UNION ALL
      SELECT key, '2_click', c_us, c_eid FROM c
      UNION ALL
      SELECT key, '3_purchase', p_us, p_eid FROM p
      ORDER BY key, stage"""))

  // --- i09: streaming SCD2 compaction under the hash gate ---------------
  // streamingScd2's closed intervals gated against the q57 batch
  // run-collapse: a state change closes the open interval (emitted
  // immediately — no watermark), the LAST run per key stays open in
  // state and never emits, so the oracle is q57's interval build
  // minus each key's open tail (valid_to IS NULL). Version numbers,
  // the (ts, event_id) run order, and per-run event counts are all
  // hashed. Bounded to 20 users like q57: the gate hashes the whole
  // interval table.
  private val i09 = GraftQuery(
    "i09_streaming_scd2",
    (s, d) => {
      import graft.streaming.StatefulOps
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-i09").toString
      Tables(s, d, "events").filter(col("user_id") < 20).select(
          col("user_id").cast("string").as("key"),
          unix_micros(col("ts")).as("tsMicros"),
          col("event_id").as("eventId"),
          col("event_type").as("state"))
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/in")
      import s.implicits._
      val stream = s.readStream
        .schema(s.read.parquet(s"$tmp/in").schema).parquet(s"$tmp/in")
        .as[StatefulOps.Scd2Event]
      StatefulOps.streamingScd2(stream)
        .writeStream.format("parquet")
        .option("path", s"$tmp/out")
        .option("checkpointLocation", s"$tmp/ck")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
      s.read.parquet(s"$tmp/out")
        .select(col("key"), col("version"), col("state"),
          col("validFromUs").as("valid_from_us"),
          col("validToUs").as("valid_to_us"),
          col("nEvents").as("n_events"))
        .orderBy("key", "version")
    },
    Some("""WITH e AS (
        SELECT CAST(user_id AS VARCHAR) AS key, event_id, event_type,
          epoch_us(ts) AS us
        FROM events WHERE user_id < 20),
      r AS (
        SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
            OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        FROM e WINDOW w AS (PARTITION BY key ORDER BY us, event_id)),
      v AS (
        SELECT *, sum(chg) OVER (PARTITION BY key
          ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS version
        FROM r),
      iv AS (
        SELECT key, version, min(event_type) AS state,
          min(us) AS valid_from_us, CAST(count(*) AS BIGINT) AS n_events
        FROM v GROUP BY 1, 2),
      cl AS (
        SELECT key, CAST(version AS BIGINT) AS version, state,
          valid_from_us,
          lead(valid_from_us) OVER (
            PARTITION BY key ORDER BY version) AS valid_to_us,
          n_events
        FROM iv)
      SELECT * FROM cl WHERE valid_to_us IS NOT NULL
      ORDER BY key, version"""))

  // --- i10: streaming heavy hitters, exact-under-capacity regime -------
  // streamingHeavyHitters gated where the Space-Saving guarantee makes
  // the sketch EXACT: items are the props.k values (a 100-value domain
  // at every sf — the k%4 sharding puts ~25 distinct items on each
  // shard, far under capacity 64), so no counter is ever evicted,
  // estCount is the true count and maxError is 0 — an exact groupBy
  // the DuckDB oracle replays directly. One data batch ⇒ exactly one
  // top-10 snapshot per shard, stamped with the shard's max event
  // time; the (count DESC, item) tie order is the operator's
  // documented eviction/summary order and the oracle's row_number
  // order. The sketch-not-exact regime stays spec-pinned
  // (StatefulOpsSpec's over-capacity guarantees test) — a hash gate
  // on an approximate summary would pin incidental internals, not a
  // contract.
  private val i10 = GraftQuery(
    "i10_streaming_heavy_hitters",
    (s, d) => {
      import graft.streaming.StatefulOps
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-i10").toString
      Tables(s, d, "events")
        .withColumn("_k", get_json_object(col("props"), "$.k").cast("int"))
        .filter(col("_k").isNotNull)
        .select(pmod(col("_k"), lit(4)).cast("int").as("shard"),
          col("_k").cast("string").as("item"),
          unix_micros(col("ts")).as("tsMicros"))
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/in")
      import s.implicits._
      val stream = s.readStream
        .schema(s.read.parquet(s"$tmp/in").schema).parquet(s"$tmp/in")
        .as[StatefulOps.ShardedItem]
      StatefulOps.streamingHeavyHitters(stream, capacity = 64, topJ = 10)
        .writeStream.format("parquet")
        .option("path", s"$tmp/out")
        .option("checkpointLocation", s"$tmp/ck")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
      s.read.parquet(s"$tmp/out")
        .select(col("shard"), col("item"),
          col("estCount").as("est_count"),
          col("maxError").as("max_error"),
          col("asOfMicros").as("as_of_us"))
        .orderBy("shard", "item")
    },
    Some("""WITH e AS (
        SELECT CAST(TRY_CAST(props->>'$.k' AS INTEGER) % 4 AS INTEGER)
            AS shard,
          CAST(TRY_CAST(props->>'$.k' AS INTEGER) AS VARCHAR) AS item,
          epoch_us(ts) AS us
        FROM events
        WHERE TRY_CAST(props->>'$.k' AS INTEGER) IS NOT NULL),
      cnt AS (
        SELECT shard, item, CAST(count(*) AS BIGINT) AS est_count
        FROM e GROUP BY 1, 2),
      mx AS (SELECT shard, max(us) AS as_of_us FROM e GROUP BY 1),
      rk AS (
        SELECT shard, item, est_count, row_number() OVER (
          PARTITION BY shard ORDER BY est_count DESC, item) AS rn
        FROM cnt)
      SELECT r.shard, r.item, r.est_count, CAST(0 AS BIGINT) AS max_error,
        m.as_of_us
      FROM rk r JOIN mx m USING (shard) WHERE rn <= 10
      ORDER BY shard, item"""))

  val all: Seq[GraftQuery] =
    Seq(i01, i02, i03, i04, i05, i06, i07, i08, i09, i10)
}
