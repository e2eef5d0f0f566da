package graft

import graft.operators.{Dedup, Packing, Sampling, TextAnalysis}
import graft.sources.CorpusWriter
import org.apache.spark.sql.functions._

/** End-to-end curation pipeline: the "switch your pipeline to this
  * library" composition claim, exercised as one flow instead of per
  * operator — quality gate → exact dedup → LSH near-dup merge →
  * decontamination against an eval set → split/shard → token packing →
  * sharded write and read-back. Each stage's invariant is asserted on
  * the REAL intermediate (not a mock), so a contract drift between two
  * operators (e.g. dedup emitting a column the writer re-derives
  * differently) fails here even when every per-operator spec passes.
  */
class PipelineIntegrationSpec extends SparkSpec {
  import spark.implicits._

  test("curation pipeline: gate → dedup → near-dup → decontaminate → write") {
    val sf = "/root/testdata/sf0.001"
    val base = Tables(spark, sf, "documents")
      .select("doc_id", "text", "source", "n_chars")
    // plant exact copies (+1M) and one-token near-dup mutations (+2M);
    // a ≥10-token gate guarantees a planted pair's shingle Jaccard is
    // at least 8/9, safely above the 0.8 near-dup threshold
    val seeds = base.filter(col("doc_id") < 5)
    val corpus = base
      .unionByName(seeds.select((col("doc_id") + 1000000).as("doc_id"),
        col("text"), col("source"), col("n_chars")))
      .unionByName(seeds.select((col("doc_id") + 2000000).as("doc_id"),
        concat(col("text"), lit(" graftdup")).as("text"),
        col("source"), col("n_chars")))
    val eval = base.filter(col("doc_id").between(20, 22))
      .select(col("doc_id"), col("text"))

    // 1. quality gate (map-side)
    val gated = corpus.filter(TextAnalysis.tokenCount(col("text")) >= 10)
    val gatedIds = gated.select("doc_id").as[Long].collect().toSet
    assert((0L until 5L).forall(gatedIds.contains),
      "seed docs must survive the gate for the planted assertions to bite")
    assert(Seq(20L, 21L, 22L).forall(gatedIds.contains),
      "eval-twin docs must survive the gate")

    // 2. exact dedup, keep-first: the +1M copies fold into their seeds
    val exact = Dedup.exactKeepFirst(gated, "text", "doc_id")
    val exactIds = exact.select("doc_id").as[Long].collect().toSet
    assert(!exactIds.exists(id => id >= 1000000L && id < 2000000L),
      "exact copies must not survive")
    assert((0L until 5L).forall(exactIds.contains), "keep-first keeps the seed")
    assert(exact.select(TextAnalysis.fingerprint(col("text"))).distinct().count()
      == exactIds.size, "post-dedup content is unique")

    // 3. near-dup merge: LSH pairs → connected components → min-id survivor
    val (nh, bands) = Dedup.lshBandPlan(threshold = 0.8, missProb = 1e-6)
    val pairs = Dedup.minhashNearDupPairs(exact, "doc_id", "text",
      numHashes = nh, bands = bands, threshold = 0.8)
    val comp = Dedup.connectedComponents(
      pairs.select(col("a"), col("b")),
      exact.select(col("doc_id").as("node")))
    val survivors = exact.join(
      comp.groupBy(col("component")).agg(min(col("node")).as("keep"))
        .select(col("keep").as("doc_id")), Seq("doc_id"), "left_semi")
    val survivorIds = survivors.select("doc_id").as[Long].collect().toSet
    val mutantIds = gatedIds.filter(_ >= 2000000L)
    assert(mutantIds.nonEmpty && mutantIds.forall(!survivorIds.contains(_)),
      s"planted mutations must merge into their seeds: $mutantIds")
    assert((0L until 5L).forall(survivorIds.contains), "min-id survivor is the seed")

    // 4. decontamination: docs sharing a 5-gram with the eval set go
    val contam = Dedup.contaminated(survivors, eval, "doc_id", "text")
      .select(col("train_id").as("doc_id"))
    val clean = survivors.join(contam, Seq("doc_id"), "left_anti")
    val cleanIds = clean.select("doc_id").as[Long].collect().toSet
    assert(Seq(20L, 21L, 22L).forall(!cleanIds.contains(_)),
      "eval twins are contamination by construction")
    val contamIds = contam.as[Long].collect().toSet
    assert((survivorIds -- cleanIds) == contamIds,
      "exactly the contaminated docs are removed, nothing else")

    // 5. split assignment is total and deterministic
    val split = clean.withColumn("split", Sampling.assignSplit(col("doc_id")))
    assert(split.filter(!col("split").isin("train", "val", "test")).count() == 0)

    // 6. token packing: cumulative mass before each row stays under the
    // budget within every (split, pack)
    val budget = 256
    val packed = Packing.packByBudget(split, col("split"), col("doc_id"),
      TextAnalysis.tokenCount(col("text")), budget)
      .withColumn("_tok", TextAnalysis.tokenCount(col("text")))
    val overfull = packed
      .withColumn("_before", coalesce(sum(col("_tok")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("split"), col("_pack")).orderBy(col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
      .filter(col("_before") >= budget)
    assert(overfull.count() == 0, "a pack never starts a row at/after the budget")

    // 7. sharded write + read-back round trip
    val out = java.nio.file.Files.createTempDirectory("graft_pipeline").toString
    CorpusWriter.writeSharded(clean, col("doc_id"), out, nShards = 4)
    val back = spark.read.parquet(out)
    assert(back.select("doc_id").as[Long].collect().toSet == cleanIds,
      "read-back preserves exactly the curated ids")
    assert(back.select("shard").distinct().count() <= 4)
    graft.operators.OpCaches.release(spark)
  }

  test("audit pipeline: block dedup → novelty gate → temperature mix → coverage") {
    // The round-9 audit/mixing operators composed as one flow over a
    // corpus with planted redundancy: block-level accounting sees the
    // planted copies, the novelty gate drops them, the temperature mix
    // rebalances what survives, and the realized per-source keep ratios
    // match the mix's own integer-ppm audit — contracts asserted across
    // operator boundaries on real intermediates.
    val sf = "/root/testdata/sf0.001"
    val base = Tables(spark, sf, "documents").select("doc_id", "text", "source")
    val seeds = base.filter(col("doc_id") < 8)
    val corpus = base.unionByName(
      seeds.select((col("doc_id") + 1000000).as("doc_id"), col("text"),
        col("source")))

    // 1. block accounting must see the planted copies: at least the
    // copies' full block mass is redundant
    val blocks = Dedup.blockDedupStats(corpus, "doc_id", "text").head()
    assert(blocks.getAs[Long]("dup_blocks") > 0, "planted copies yield dup blocks")
    assert(blocks.getAs[Long]("chars_saved") > 0)

    // 2. novelty gate: every planted pair's shingles appear in >= 2
    // docs, so BOTH members score novelty 0; gating novelty > 0 drops
    // all 16 planted-pair members (and only unique-content docs stay)
    val novelty = TextAnalysis.ngramNovelty(corpus, "doc_id", "text")
    val gated = corpus.join(
      novelty.filter(col("novelty_ppm") > 0).select("doc_id"), "doc_id")
    val gatedIds = gated.select("doc_id").as[Long].collect().toSet
    (0L until 8L).foreach { id =>
      assert(!gatedIds.contains(id) && !gatedIds.contains(id + 1000000),
        s"planted pair member $id must fail an all-shingles-novel gate")
    }
    assert(gatedIds.nonEmpty, "unique docs survive")

    // 3. temperature mix over the gated survivors: realized keep ratio
    // per source equals the audit's own ppm within rounding slack
    val mix = Sampling.temperatureBudgetMix(gated, "doc_id", "text",
      "source", temperature = 0.7, budgetTokens = 2000)
    val audited = mix.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(4)))).toMap // n_docs_kept, keep_ratio_ppm
    assert(audited.nonEmpty)
    audited.foreach { case (src, (kept, _)) =>
      assert(kept >= 1 && kept <= gated.filter(col("source") === src).count())
    }

    // 4. coverage audit closes the loop: summing per-cell corpus counts
    // over (lang × source) cells reproduces the corpus row count —
    // the audit partitions the corpus, no cell double-counts or drops
    val cells = Tables(spark, sf, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_corpus"))
      .agg(sum(col("n_corpus"))).head().getLong(0)
    assert(cells == Tables(spark, sf, "documents").count())
    graft.operators.OpCaches.release(spark)
  }

  test("live-crawl admission end-to-end: jsonl shards → streaming dedup → " +
      "token budget → sink equals the batch replay, across a checkpoint restart") {
    // The whole front door as ONE pipeline, not per-operator specs:
    // crawl shard files land one at a time (including a late re-crawl
    // of already-seen content after a restart), flow through
    // readJsonlStream → streamingDedup → streamingTokenBudget into a
    // parquet sink, and the admitted set must equal a greedy batch
    // replay of the same shards in the same order. The mid-run restart
    // exercises the real recovery path for BOTH stateful operators at
    // once: the re-crawled duplicate must drop on restored dedup state,
    // and source A's post-restart doc must be rejected only because
    // A's used-token state was recovered.
    import graft.sources.CorpusReader
    import graft.streaming.StatefulOps
    val dir = java.nio.file.Files.createTempDirectory("crawl-shards")
    val ckpt = java.nio.file.Files.createTempDirectory("crawl-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("crawl-out").toString

    // texts pre-normalized (lowercase, single spaces) so content ids
    // are the plain md5 of the literal; token counts are word counts
    val a1 = "alpha one two three four" // 5 tokens
    val a2 = "alpha five six seven eight" // 5 tokens → A exactly at budget 10
    val a3 = "alpha nine" // 2 tokens → must REJECT iff A's used=10 survived
    val b1 = "bravo one two three four five six" // 7 tokens
    val b2 = "bravo seven eight nine ten" // 5 tokens → skip (7+5 > 10)
    val b3 = "bravo ten" // 2 tokens → admit (skip-not-truncate leaves room)
    def writeShard(name: String, rows: Seq[(String, String)]): Unit =
      java.nio.file.Files.writeString(dir.resolve(name), rows.map {
        case (t, s) => s"""{"text":"$t","lang":"en","source":"$s"}"""
      }.mkString("", "\n", "\n"))

    def startQuery() = {
      val stream = CorpusReader.readJsonlStream(spark, dir.toString,
          options = Map("maxFilesPerTrigger" -> "1"))
        // arrival event time: the crawl front door stamps ingest time
        .withColumn("ts", current_timestamp())
      val deduped = StatefulOps.streamingDedup(stream, "text", "ts", "24 hours")
      // the canonical string doc_id feeds sourcedDocs directly: the
      // adapter hashes string ids (xxhash64) instead of null-casting
      val docs = StatefulOps.sourcedDocs(deduped, "source", "doc_id", "text")
      StatefulOps.streamingTokenBudget(docs, budgetTokens = 10)
        .toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .start()
    }

    // run 1: shard0 with an IN-shard duplicate of a1
    writeShard("shard000.jsonl",
      Seq((a1, "A"), (a2, "A"), (a1, "A"), (b1, "B")))
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    // run 2 (fresh query, same checkpoint): a late re-crawl of a1 plus
    // new docs that probe both sources' restored budget state
    writeShard("shard001.jsonl",
      Seq((a1, "A"), (a3, "A"), (b2, "B"), (b3, "B")))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val admitted = spark.read.parquet(out)
      .select("source", "docId", "nTokens").as[(String, Long, Long)]
      .collect().toSet
    // batch replay over the same shards in the same order (greedy
    // per-source admission over first-seen content): a1+a2 fill A
    // exactly; the duplicates of a1 never reach admission; a3 bounces
    // off A's exhausted budget; b2 skips but b3 fits behind it
    val numId = Seq(a1, a2, a3, b1, b2, b3).toDF("text")
      .select(col("text"), xxhash64(md5(col("text"))).as("id"))
      .as[(String, Long)].collect().toMap
    val expect = Set(
      ("A", numId(a1), 5L), ("A", numId(a2), 5L),
      ("B", numId(b1), 7L), ("B", numId(b3), 2L))
    assert(admitted == expect,
      s"streamed admission must equal the batch replay: got $admitted")
    // per-source budget accounting is exact in the sink rows
    val used = spark.read.parquet(out).groupBy("source")
      .agg(max("budgetUsed").as("u"), sum("nTokens").as("s"))
      .as[(String, Long, Long)].collect()
      .map { case (s, u, n) => s -> ((u, n)) }.toMap
    assert(used("A") == ((10L, 10L)) && used("B") == ((9L, 9L)), s"$used")
  }
}
