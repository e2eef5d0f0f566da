package graft

/** Plan-shape regression guards: the properties that make these plans
  * scale (filters pushed to the parquet scan, pruned read schemas,
  * broadcast joins for small dimensions, shuffle-free map-side
  * statistics) asserted against the executed plans, so a refactor that
  * silently de-optimizes a query fails here rather than at 100 TB.
  */
class PlanAssertionsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def executedPlan(name: String): String = {
    val df = QueryRegistry.queryMap(name)(spark, sf)
    // collect(), not count(): count() executes a DIFFERENT (count-
    // aggregated) plan, leaving this one isFinalPlan=false — the
    // assertions would then read the static plan, not the AQE-final
    // executed one
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q06: filters and projection reach the parquet scan") {
    val plan = executedPlan("q06_forecast_revenue")
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"), plan.take(500))
    // 4 of lineitem's 16 columns read
    val schema = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(plan).get.group(1)
    assert(schema.split(",").length == 4, schema)
  }

  test("q03: small filtered dimension joins broadcast") {
    val plan = executedPlan("q03_shipping_priority")
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
    assert(!plan.contains("CartesianProduct"))
  }

  test("t10: per-doc statistic plans with no shuffle at all") {
    val plan = executedPlan("t10_repetition")
    assert(!plan.contains("Exchange"), plan.take(800))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
  }

  test("deterministic sample operator is a pure map-side filter") {
    // the registry query adds an ORDER BY for the oracle; the operator
    // itself must not shuffle
    import org.apache.spark.sql.functions.col
    val df = graft.operators.Sampling.deterministicSample(
      Tables(spark, sf, "documents"), col("doc_id"), 0.1)
    df.collect() // collect, not count: finalize THIS plan (see executedPlan)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(800))
  }

  test("jaccard queries run the rewritten count-only intersect kernel") {
    val plan = executedPlan("d05_ngram_jaccard")
    assert(plan.contains("intersect_size"), plan.take(800))
  }

  test("d13 decontamination prefilters the train side with a Bloom probe") {
    val plan = executedPlan("d13_contamination_bloom")
    assert(plan.contains("might_contain"), plan.take(800))
  }

  test("v04 near-dup generates candidates by equi-join, never all-pairs") {
    val plan = executedPlan("v04_embedding_neardup")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }

  test("v15 ANN kNN labels: candidates equi-join by cell, never all-pairs") {
    val plan = executedPlan("v15_knn_label_ann")
    // the property that distinguishes the scale path from exact v12
    // (whose query side IS the broadcast corpus): no all-pairs shape
    // anywhere — candidate generation is the IVF cell equi-join
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }

  test("d14 line dedup: map-side keep-first, filter pushed to the scan") {
    val plan = executedPlan("d14_line_dedup")
    // row_number()<=1 runs as WindowGroupLimit with a Partial phase
    // BEFORE the line-hash exchange: each map task forwards at most one
    // row per distinct line, so boilerplate repeated a billion times
    // shuffles once per task, not once per occurrence
    assert(plan.contains("WindowGroupLimit"), plan.take(1200))
    assert("WindowGroupLimit.*Partial".r.findFirstIn(plan).isDefined, plan.take(1200))
    // match each pushed filter on its own: the exact ordering and
    // punctuation inside PushedFilters is datasource explain formatting
    // that a Spark upgrade may reshuffle without a behavior change
    assert("PushedFilters: \\[[^\\]]*IsNotNull\\(doc_id\\)".r.findFirstIn(plan).isDefined,
      plan.take(1200))
    assert("PushedFilters: \\[[^\\]]*LessThan\\(doc_id,50\\)".r.findFirstIn(plan).isDefined,
      plan.take(1200))
  }

  test("d17 substring spans: hash-keyed equi-joins only, partial agg first") {
    val plan = executedPlan("d17_substring_spans")
    // candidate generation must never degenerate to all-pairs
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1200))
    // min-occurrence/count aggregate combines map-side before its
    // exchange, so a boilerplate window repeated per map task shuffles
    // one partial row per task, not one row per occurrence
    assert("partial_min".r.findFirstIn(plan).isDefined, plan.take(1200))
    assert("partial_count".r.findFirstIn(plan).isDefined, plan.take(1200))
  }

  test("d18 incremental dedup: history joins anti, never cartesian") {
    val plan = executedPlan("d18_incremental_dedup")
    assert(plan.contains("LeftAnti"), plan.take(1200))
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("s09 source cap: per-group limit runs map-side before the exchange") {
    val plan = executedPlan("s09_source_cap")
    assert(plan.contains("WindowGroupLimit"), plan.take(1200))
    assert("WindowGroupLimit.*Partial".r.findFirstIn(plan).isDefined, plan.take(1200))
  }

  test("s21 token-budget mix: ratio table broadcasts, no corpus-sized shuffle join") {
    val plan = executedPlan("s21_token_budget_mix")
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }

  test("q39 rolling distinct: explode fan-out, never a range join") {
    val plan = executedPlan("q39_rolling_distinct_users")
    // the naive formulation is a day-grid BETWEEN join → nested loop;
    // the linear plan explodes each fact onto its ≤7 window ends
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1200))
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
    assert(plan.contains("Generate explode"), plan.take(1200))
  }

  test("v10 euclidean top-k: query side broadcasts, corpus never shuffles") {
    val plan = executedPlan("v10_euclidean_topk")
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(1200))
    // the only exchange is the final per-query top-k window (+ the
    // ORDER BY the oracle requires); no join-side corpus shuffle
    assert(!plan.contains("SortMergeJoin"), plan.take(1200))
  }

  test("t20 OOV rate: vocab cut is TakeOrdered heaps, vocab join broadcasts") {
    val plan = executedPlan("t20_oov_rate")
    // the top-1k vocab must come from per-partition heaps + driver
    // merge, not a row_number window sorting every distinct word on
    // one core, and must reach the token stream as a broadcast
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1200))
    assert(plan.contains("BroadcastHashJoin"), plan.take(1200))
    assert(!plan.contains("SortMergeJoin"), plan.take(1200))
  }

  test("s15 curriculum stages: range partitioning, no unpartitioned window") {
    import org.apache.spark.sql.functions.col
    val df = graft.operators.Sampling.curriculumStages(
      Tables(spark, sf, "documents"),
      Seq(col("n_chars"), col("doc_id")), stages = 4)
    df.collect() // collect, not count: finalize THIS plan (see executedPlan)
    val plan = df.queryExecution.executedPlan.toString
    // the range partitioning runs inside the localCheckpoint job that
    // pins the assignment (see curriculumStages); this plan reads the
    // pinned blocks back as an RDD scan
    assert(plan.contains("Scan ExistingRDD"), plan.take(1200))
    // the rank window is per-range (partitioned on _range); a global
    // ntile would be an unpartitioned window over everything
    assert(plan.contains("windowspecdefinition(_range"), plan.take(1600))
  }

  test("v12 kNN labels: corpus never shuffles for scoring; vote window keyed") {
    val plan = executedPlan("v12_knn_label")
    // scoring joins broadcast (query side + label lookup); the only
    // sort-merge-free requirement is no corpus-side shuffle join
    assert(!plan.contains("SortMergeJoin"), plan.take(1200))
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("d25 boilerplate strip: anti-join is UNHINTED — AQE picks, no mandatory broadcast") {
    val plan = executedPlan("d25_boilerplate_lines")
    // The boilerplate set's size is corpus-dependent (C4-scale: 1e8+
    // line fingerprints), so the removal anti-join must carry NO
    // explicit broadcast hint: at test scale AQE measures the tiny set
    // and broadcasts on its own; past the threshold the same plan
    // falls back to a shuffled anti-join on narrow (md5, xxhash64)
    // keys. Assert AQE's choice here AND that the optimized logical
    // plan is hint-free — the latter is what scales.
    assert(plan.contains("LeftAnti"), plan.take(1200))
    assert(plan.contains("BroadcastHashJoin"), plan.take(1200)) // AQE's pick at sf0.001
    val logical = QueryRegistry.queryMap("d25_boilerplate_lines")(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(!logical.contains("strategy=broadcast"),
      s"anti-join must stay unhinted:\n${logical.take(1200)}")
    // frequency counting combines map-side before its exchange
    assert(plan.contains("partial_count"), plan.take(1200))
  }

  test("v16 truncation audit: both rankings broadcast probes, overlap join narrow") {
    val plan = executedPlan("v16_truncation_overlap")
    // two widths = two broadcast probe scans (non-equi ⇒ nested-loop
    // over the broadcast query side, the scoredPairs shape); the only
    // hash join is the narrow (query_id, neighbor_id) overlap join
    // judge the AQE-final plan only — the toString repeats the pre-AQE
    // tree (where this join is still sort-merge) under "== Initial Plan =="
    val finalSection = plan.split("== Initial Plan ==").head
    assert(!finalSection.contains("CartesianProduct"), finalSection.take(1200))
    assert(!finalSection.contains("SortMergeJoin"), finalSection.take(1200))
    assert("BroadcastNestedLoopJoin".r.findAllIn(finalSection).size >= 2,
      finalSection.take(1200))
    assert(finalSection.contains("BroadcastHashJoin"), finalSection.take(1200))
  }

  test("q48 rolling z-score: both trailing windows share one event_type exchange") {
    val plan = executedPlan("q48_rolling_zscore")
    val finalSection = plan.split("== Initial Plan ==").head
    assert(!finalSection.contains("Join"), finalSection.take(800))
    // count/avg and avg-of-squares windows reuse a single sort +
    // hashpartitioning(event_type); only the oracle ORDER BY adds a
    // range exchange on top
    val hashEx = "Exchange hashpartitioning".r.findAllIn(finalSection).size
    assert(hashEx == 1, s"$hashEx hash exchanges:\n${finalSection.take(1200)}")
  }

  test("q49 session windows: partial session agg, one exchange, pruned scan") {
    val plan = executedPlan("q49_session_window")
    val finalSection = plan.split("== Initial Plan ==").head
    // sessions merge via the dedicated MergingSessions operator with a
    // partial aggregate BEFORE the user_id exchange — no per-user
    // window sort pass, no join
    assert(finalSection.contains("MergingSessions"), finalSection.take(1200))
    assert(finalSection.contains("partial_min"), finalSection.take(1200))
    assert(!finalSection.contains("Join"), finalSection.take(800))
    val hashEx = "Exchange hashpartitioning".r.findAllIn(finalSection).size
    assert(hashEx == 1, s"$hashEx hash exchanges:\n${finalSection.take(1200)}")
    // only (ts, user_id) read from the 6-column events table
    val schema = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(finalSection).get.group(1)
    assert(schema.split(",").length == 2, schema)
  }

  test("d26 source overlap: no corpus self-join, share lookups broadcast") {
    val plan = executedPlan("d26_source_overlap")
    val finalSection = plan.split("== Initial Plan ==").head
    // overlap pairs come from groupBy(fingerprint)+collect_set, never a
    // content self-join; the only joins are the tiny per-source-count
    // broadcasts
    assert(!finalSection.contains("SortMergeJoin"), finalSection.take(1200))
    assert(!finalSection.contains("CartesianProduct"), finalSection.take(1200))
    assert(finalSection.contains("BroadcastHashJoin"), finalSection.take(1200))
  }

  test("q50 lateral top-N: decorrelated to a partial WindowGroupLimit join") {
    val plan = executedPlan("q50_lateral_topn")
    val finalSection = plan.split("== Initial Plan ==").head
    // the correlated LIMIT subquery must become a ranked window with a
    // map-side (Partial) group limit before the shuffle — never a
    // per-outer-row rescan or a cartesian
    assert(finalSection.contains("WindowGroupLimit"), finalSection.take(1200))
    assert("WindowGroupLimit .*Partial".r.findFirstIn(finalSection).isDefined,
      finalSection.take(1600))
    assert(finalSection.contains("BroadcastHashJoin"), finalSection.take(1200))
    assert(!finalSection.contains("CartesianProduct"), finalSection.take(1200))
  }

  test("q51 unpivot: one pruned scan fanned by Expand, no union of rescans") {
    val plan = executedPlan("q51_unpivot_measures")
    val finalSection = plan.split("== Initial Plan ==").head
    // melt must be the map-side Expand over a single scan — 4 separate
    // scans unioned together would read the wide table 4 times
    assert(finalSection.contains("Expand"), finalSection.take(1200))
    assert(!finalSection.contains("Union"), finalSection.take(1200))
    assert("Scan parquet".r.findAllIn(finalSection).length == 1,
      finalSection.take(1200))
    // partial agg runs before the single measure-key exchange
    assert("HashAggregate .*partial_count".r.findFirstIn(finalSection).isDefined
        || finalSection.contains("partial_count"),
      finalSection.take(1600))
  }

  test("s22 length buckets: map-side when-ladder, one partial-agg exchange") {
    val plan = executedPlan("s22_length_buckets")
    assert(!plan.contains("Join"), plan.take(800))
    assert(plan.contains("partial_count"), plan.take(800))
    // exactly one shuffle: the <=|caps|-row final aggregate (plus the
    // oracle ORDER BY's range exchange); count in the final plan only —
    // the AQE toString repeats the tree under "== Initial Plan =="
    val finalSection = plan.split("== Initial Plan ==").head
    val exchanges = "Exchange [a-z]+partitioning".r.findAllIn(finalSection).size
    assert(exchanges <= 2, s"$exchanges exchanges:\n${finalSection.take(800)}")
  }

  test("q52 OHLC: one partial-agg'd exchange, no window sort, no join") {
    val plan = executedPlan("q52_event_ohlc")
    val finalSection = plan.split("== Initial Plan ==").head
    assert(!finalSection.contains("Join"), finalSection.take(800))
    assert(!finalSection.contains("Window"), finalSection.take(800))
    // min_by/max_by combine map-side: partial_min_by before the exchange
    assert("partial_min_by".r.findFirstIn(finalSection).isDefined,
      finalSection.take(1200))
    val hashEx = "Exchange hashpartitioning".r.findAllIn(finalSection).size
    assert(hashEx == 1, s"$hashEx hash exchanges:\n${finalSection.take(1200)}")
  }

  test("t24 novelty: only fingerprints shuffle, never document text") {
    val plan = executedPlan("t24_ngram_novelty")
    val finalSection = plan.split("== Initial Plan ==").head
    assert(!finalSection.contains("CartesianProduct"), finalSection.take(1200))
    // the shuffled attributes are doc_id + the md5 fingerprint; the
    // text column must be projected away before any exchange — assert
    // no exchange carries `text`
    "Exchange hashpartitioning\\(([^)]*)\\)".r.findAllMatchIn(finalSection)
      .foreach { m =>
        assert(!m.group(1).contains("text"),
          s"text on the shuffle: ${m.matched}")
      }
    // frequency agg combines map-side before its exchange
    assert(finalSection.contains("partial_count"), finalSection.take(1200))
  }

  test("q53 streaks: map-side day dedup first, then narrow user-keyed chain") {
    val plan = executedPlan("q53_activity_streaks")
    val finalSection = plan.split("== Initial Plan ==").head
    assert(!finalSection.contains("Join"), finalSection.take(800))
    // the (user, day) distinct MUST partial-aggregate before its
    // exchange: a user's thousand events per day collapse to one row
    // per map task, so the first shuffle moves ~active-user-days, not
    // events. After that, exactly one more (narrow) exchange re-keys
    // the deduped days to user_id for the window + both aggs. A
    // single-exchange variant (repartition by user first) would
    // shuffle EVERY raw event — more bytes at scale, not fewer.
    // (plan prints top-down: the partial dedup is the bottom-most
    // operator chain, so it appears AFTER the last exchange in the
    // string, between it and the FileScan)
    val lastEx = finalSection.lastIndexOf("Exchange hashpartitioning")
    val below = finalSection.substring(lastEx)
    assert(below.contains("HashAggregate") && below.contains("FileScan"),
      s"no map-side dedup below the bottom exchange:\n${below.take(600)}")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(finalSection).size
    assert(hashEx == 2, s"$hashEx hash exchanges:\n${finalSection.take(1200)}")
    // both aggregation steps after the window combine map-side
    assert(finalSection.contains("partial_count"), finalSection.take(1200))
  }

  test("s24 temperature mix: share table broadcasts, corpus filter is map-side") {
    val plan = executedPlan("s24_temperature_mix")
    val finalSection = plan.split("== Initial Plan ==").head
    assert(finalSection.contains("BroadcastHashJoin"), finalSection.take(800))
    assert(!finalSection.contains("SortMergeJoin"), finalSection.take(800))
    // the 1-row Σpw join is a broadcast nested loop, never a cartesian
    assert(!finalSection.contains("CartesianProduct"), finalSection.take(800))
  }

  test("q55 timeout funnel: three chained windows share ONE user exchange") {
    val plan = executedPlan("q55_funnel_timeout")
    val finalSection = plan.split("== Initial Plan ==").head
    // funnel depth must cost window passes, never extra shuffles: the
    // only hash exchange is the user_id partition all three stages ride
    val userEx = "Exchange hashpartitioning\\(user_id".r
      .findAllIn(finalSection).size
    assert(userEx == 1, s"$userEx user exchanges:\n${finalSection.take(1200)}")
    assert(!finalSection.contains("Join"), finalSection.take(800))
  }

  test("d28 containment: fp equi-join candidates, text never on a shuffle") {
    val plan = executedPlan("d28_containment_neardup")
    val finalSection = plan.split("== Initial Plan ==").head
    assert(!finalSection.contains("CartesianProduct"), finalSection.take(1200))
    assert(!finalSection.contains("BroadcastNestedLoopJoin"), finalSection.take(1200))
    // candidates pair through the md5 fingerprint equi-join; the text
    // column reduces to fingerprints at the scan and never shuffles
    "Exchange hashpartitioning\\(([^)]*)\\)".r.findAllMatchIn(finalSection)
      .foreach { m =>
        assert(!m.group(1).contains("text"),
          s"text on the shuffle: ${m.matched}")
      }
  }

  test("t26 source divergence: cached in-vocab counts, matrix math broadcasts") {
    val plan = executedPlan("t26_source_divergence")
    val finalSection = plan.split("== Initial Plan ==").head
    // scan-count contract: the vocab was collected in its own bounded
    // job (not in this plan), and every downstream reference reads the
    // CACHED (source, in-vocab word) count frame instead of rescanning
    // the corpus — so the main plan shows InMemoryTableScan and no
    // sort-merge join (the only SMJ-eligible join would be
    // corpus-sized, and there must not be one)
    assert(finalSection.contains("InMemoryTableScan"), finalSection.take(1200))
    assert(!finalSection.contains("SortMergeJoin"), finalSection.take(1200))
    assert(finalSection.contains("BroadcastHashJoin"), finalSection.take(1200))
    graft.operators.OpCaches.release(spark)
  }

  test("v26 anisotropy: per-dim sums partial-aggregate, no pairwise join") {
    val plan = executedPlan("v26_anisotropy")
    val finalSection = plan.split("== Initial Plan ==").head
    // the whole audit is narrow aggregates + scalar math on 1-row /
    // 64-row frames: any SMJ or cartesian would mean a pairwise
    // vector join snuck in
    assert(!finalSection.contains("SortMergeJoin"), finalSection.take(1200))
    assert(!finalSection.contains("CartesianProduct"), finalSection.take(1200))
    assert(finalSection.contains("partial_sum"), finalSection.take(1200))
  }

  test("date-partitioned lake layout: partition pruning at the scan") {
    // The 100 TB table layout this engine assumes downstream: a
    // partitionBy(day) parquet lake where a day predicate must prune
    // DIRECTORIES (PartitionFilters), not just row groups, and data
    // predicates still push into the surviving files.
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files
      .createTempDirectory("graft-ppr").toString
    Tables(spark, sf, "events")
      .withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(out)
    val df = spark.read.parquet(out)
      .filter(col("day") === "2024-01-02" && col("value") > 5.0)
      .select("event_id", "value")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*2024-01-02".r
      .findFirstIn(plan).isDefined, plan.take(900))
    assert("PushedFilters: \\[[^\\]]*GreaterThan\\(value,5.0\\)".r
      .findFirstIn(plan).isDefined, plan.take(900))
    // the scan must read only the two projected data columns
    val schema = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(plan)
      .get.group(1)
    assert(schema.split(",").length == 2, schema)
  }

  test("broadcast() hints only on whitelisted bounded frames") {
    // An explicit broadcast() hint is honored REGARDLESS of size — no
    // AQE demotion — so a hint on a data-derived frame is a latent
    // broadcast-limit/driver-OOM at scale (the r14 t37/Bpe.encode/
    // tfidf class). This lint greps every main-source hint site and
    // pins (file, hinted identifier, count) against a whitelist of
    // frames that are bounded BY CONSTRUCTION: literal model tables
    // (vocab/centroid/codebook), per-source or per-stratum aggregates
    // (≤|sources| rows), 1-row scalars, and literal-bounded query
    // sets. Adding, moving, or re-aiming a hint fails here until the
    // whitelist is consciously updated with the boundedness argument.
    val whitelist: Map[String, Map[String, Int]] = Map(
      // ratios/sumPw/lam/lim/tot/lr: per-source or per-stratum agg
      // tables (≤|sources| / ≤|strata| rows) and 1-row scalars
      "Sampling.scala" -> Map("ratios" -> 2, "sumPw" -> 2, "lam" -> 1,
        "lim" -> 1, "tot" -> 1, "lr" -> 1),
      // q/qu/cands/poolIds/members/qUnits: literal-bounded query sets
      // (the ANN contract: queries are a bounded set, the corpus
      // streams); b: |sources|×vocabSize grid half
      "Similarity.scala" -> Map("q" -> 6, "poolIds" -> 1,
        "members" -> 2, "cands" -> 2, "qu" -> 2, "b" -> 1,
        "qUnits" -> 1),
      // dfreq: per-QUERY-TERM df in bm25TopK (≤|queryTerms| rows —
      // NOT tfidfTopK's corpus-vocab df, which is unhinted since
      // r15); vocab/b: heap-cut vocabSize grids; ctx/cont: KN model
      // tables keyed by single words (vocab-bounded — the bigram
      // table cb is NOT hinted); bt: the 1-row bigram-type-count
      // scalar (cb.agg(count)) that replaced knBigramScore's separate
      // cb.count() driver job in r15
      "TextAnalysis.scala" -> Map("dfreq" -> 1, "vocab" -> 1,
        "b" -> 1, "ctx" -> 1, "cont" -> 1, "bt" -> 1),
      // q: query set; cellCounts: ≤nlist rows (centroid table size)
      "IvfIndex.scala" -> Map("q" -> 1, "cellCounts" -> 1),
      // perSource: per-source aggregate, ≤|sources| rows
      "Dedup.scala" -> Map("perSource" -> 4),
      "PqIndex.scala" -> Map("q" -> 2),
      // vocabDf: the trained merge vocab, |merges|-bounded (the word-
      // TYPE table join is deliberately unhinted since r15)
      "Bpe.scala" -> Map("vocabDf" -> 1),
      "SamplingQueries.scala" -> Map("cnts" -> 1),
      // centroids: k-bounded; deg: per-neighbor degree of a bounded
      // candidate set
      "VectorQueries.scala" -> Map("centroids" -> 1, "deg" -> 1),
      // TPC-H dimension tables (nation/region/supplier/customer/part
      // filtered) and 1-row scalar denominators
      "RelationalQueries.scala" -> Map("c" -> 2, "part" -> 3,
        "su" -> 1, "n" -> 2, "r" -> 1, "med" -> 1, "cust" -> 1,
        "nat" -> 3, "reg" -> 1, "supp" -> 2, "avgBal" -> 1,
        "tot" -> 1, "totO" -> 1),
      // vocab: heap-cut; total/totals: per-source aggregates
      "TextQueries.scala" -> Map("vocab" -> 1, "total" -> 1,
        "totals" -> 1))
    import scala.jdk.CollectionConverters._
    val hint = "\\bbroadcast\\(\\s*([A-Za-z_][A-Za-z0-9_]*)".r
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    val found = scala.collection.mutable.Map
      .empty[(String, String), Int].withDefaultValue(0)
    java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala")).foreach { p =>
        val name = p.getFileName.toString
        // ISO-8859-1 never throws on stray bytes; the regex is ASCII
        new String(java.nio.file.Files.readAllBytes(p),
          java.nio.charset.StandardCharsets.ISO_8859_1)
          .linesIterator
          .map(_.trim)
          .filterNot(l => l.startsWith("//") || l.startsWith("*") ||
            l.startsWith("/*"))
          .foreach { l =>
            hint.findAllMatchIn(l).foreach { m =>
              found((name, m.group(1))) += 1 }
          }
      }
    val flat = whitelist.flatMap { case (f, m) =>
      m.map { case (id, n) => (f, id) -> n } }
    val unexpected = found.toMap.filter { case (k, n) =>
      flat.get(k) != Some(n) }
    val missing = flat.filter { case (k, _) => !found.contains(k) }
    assert(unexpected.isEmpty && missing.isEmpty,
      s"broadcast-hint whitelist drift — new/moved hints need a " +
        s"boundedness argument here.\nunexpected: $unexpected\n" +
        s"missing: $missing")
  }
}
