package graft.tools

import graft.QueryRegistry
import org.apache.spark.sql.SparkSession

/** Plan audit (dev tool): for each registry query, summarize the
  * physical plan — parquet pushed filters, read schema width, join
  * strategies, exchange count, whole-stage codegen coverage. The
  * things that must look right before believing a plan scales to
  * 100 TB.
  */
object ExplainAudit {

  import org.apache.spark.sql.execution.SparkPlan

  /** Children with AQE/reuse wrappers unwrapped, so subtree checks see
    * through query-stage boundaries in a finalized adaptive plan. */
  private def kids(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      Seq(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      Seq(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      Seq(r.child)
    case other => other.children
  }

  private def subtreeBounded(p: SparkPlan): Boolean = p match {
    // a FINAL/COMPLETE aggregate bounds rows to |group keys|; a
    // global/local limit bounds them literally; a LocalTableScan is
    // literal driver-side rows (model tables, VALUES) — any of these
    // makes a single-partition sort above it a tiny-table operation,
    // not a corpus-wide funnel. A PARTIAL aggregate bounds NOTHING
    // globally (it's the pre-shuffle map-side combine — one output
    // row per group PER TASK), so it must not waive the lint; keep
    // searching below it. Residual limitation, accepted: a final
    // aggregate grouped by a corpus-cardinality key (e.g. doc_id)
    // still reads as bounded — group-key cardinality isn't statically
    // knowable; reviewers should treat groupBy(id)+global-window
    // shapes as suspect despite a clean lint.
    case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
      import org.apache.spark.sql.catalyst.expressions.aggregate.{Partial, PartialMerge}
      // distinct-style aggregates (SELECT DISTINCT / groupBy with no
      // agg functions) have EMPTY aggregateExpressions in BOTH the
      // partial and final stages, so the mode check alone would read a
      // pre-shuffle partial distinct as bounded. The stage marker that
      // never lies is requiredChildDistributionExpressions: None =
      // partial (any input distribution), Some(keys)/Some(Nil) = final
      // (clustered/all-tuples) — exactly the planner's own contract.
      val partial = a.aggregateExpressions.exists(e =>
        e.mode == Partial || e.mode == PartialMerge) ||
        (a.aggregateExpressions.isEmpty &&
          a.requiredChildDistributionExpressions.isEmpty)
      if (partial) kids(a).exists(subtreeBounded) else true
    case _: org.apache.spark.sql.execution.GlobalLimitExec => true
    case _: org.apache.spark.sql.execution.LocalLimitExec => true
    case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
    case _: org.apache.spark.sql.execution.LocalTableScanExec => true
    case other => kids(other).exists(subtreeBounded)
  }

  /** Queries whose global window IS the documented contract rather
    * than an accident: the reference's preprocessing CLI (PD:55-148)
    * processes ONE pandas-sized CSV file per invocation, and
    * `CleanCsv`'s no-`seriesKeys` mode mirrors exactly that — a global
    * row order over a single file the reference itself holds in one
    * DataFrame. The waiver is per-QUERY, not per-operator: the same
    * operators run partitioned via `seriesKeys` at corpus scale
    * (interpolateCubic's scaladoc spells out the 100 TB contract), and
    * any NEW registry entry driving the no-key mode over corpus tables
    * still fails the lint. Waived windows are still printed, flagged
    * as waived, so the audit output shows them rather than hiding
    * them. */
  val singleFileCliContract: Set[String] =
    Set("p10_interpolate_linear", "p11_rolling_mean_fill")

  /** Nested-loop join triage: a BroadcastNestedLoopJoin whose build
    * side is BOUNDED (a no-grouping-key aggregate = exactly one row, or
    * a limit) is the library's 1-row scalar-attach pattern
    * (`crossJoin(broadcast(totals))` — a denominator riding along every
    * row; constant work per probe row, nothing quadratic). One with
    * both sides unbounded is the scale-killer the audit exists to
    * catch. Returns (bounded, unbounded) BNLJ/cartesian nodes. */
  def nestedLoopTriage(root: SparkPlan): (Seq[SparkPlan], Seq[SparkPlan]) = {
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val here = p match {
        case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => Seq(j)
        case j: org.apache.spark.sql.execution.joins.CartesianProductExec => Seq(j)
        case _ => Nil
      }
      here ++ kids(p).flatMap(walk)
    }
    // benign = the BROADCAST side (the one behind a broadcast
    // exchange/stage) is bounded — not either side: a probe side with
    // some upstream groupBy must not excuse an unbounded build side
    def strip(p: SparkPlan): SparkPlan = p match {
      case i: org.apache.spark.sql.execution.InputAdapter => strip(i.child)
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => strip(w.child)
      case other => other
    }
    def broadcastSide(j: SparkPlan): Seq[SparkPlan] = kids(j).map(strip).filter {
      case _: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => true
      case _: org.apache.spark.sql.execution.adaptive.BroadcastQueryStageExec => true
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        r.child.isInstanceOf[org.apache.spark.sql.execution.exchange.BroadcastExchangeExec]
      case _ => false
    }
    walk(root).partition { j =>
      val b = broadcastSide(j)
      b.nonEmpty && b.forall(subtreeBounded)
    }
  }

  /** Queries whose nested-loop join's broadcast side is bounded by
    * CONTRACT rather than provably by plan shape: the brute-force
    * similarity family broadcasts a QUERY SET selected by a literal
    * predicate (`vec_id < 5`-style) or guarded by an explicit
    * `require(count <= maxRows)` (`Similarity.topPairs`), then streams
    * the corpus past it — cost |Q|·N, linear in the corpus, which is
    * exactly what brute-force scoring IS (no equi key exists for
    * all-pairs cosine; a nested-loop over a small broadcast is the
    * RIGHT 100 TB plan, per-partition corpus scan × tiny query table).
    * The plan can't see the filter's selectivity, so these are waived
    * by name with the contract stated; a NEW query broadcasting an
    * unbounded side still fails the audit. */
  val queryBroadcastContract: Set[String] = Set(
    "v01_cosine_topk", "v02_similar_pairs",
    "v07_ann_pq", "v09_range_search", "v10_euclidean_topk",
    "v11_mips_topk", "v12_knn_label", "v16_truncation_overlap",
    "v18_ivf_recall_sweep", "v19_cosine_histogram",
    "v21_hubness", "v24_ann_pq_trained", "v29_binary_hamming_audit",
    "v30_rerank_retrieval", "v31_rerank_recall_sweep",
    "v33_recall_cost_table",
    // v37's filtered brute-force GROUND TRUTH reuses the v01 probe
    // shape (literal-bounded query set broadcast past the streamed
    // corpus) once per selectivity step
    "v37_filtered_recall_sweep")

  /** Single-partition window lint: every `Window` whose partitionSpec
    * is EMPTY funnels its whole input through ONE task. That is fine
    * exactly when the input is already tiny — i.e. the window sits
    * above an aggregate (the q60 day-table pattern) or a limit — and a
    * scale-killer anywhere else: a future query putting a global
    * `Window.orderBy` UNDER the aggregation would silently serialize
    * the full corpus. Returns the offending window nodes. */
  def unboundedGlobalWindows(root: SparkPlan): Seq[SparkPlan] = {
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val here = p match {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty && !kids(w).exists(subtreeBounded) => Seq(w)
        case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
            if w.partitionSpec.isEmpty && !kids(w).exists(subtreeBounded) => Seq(w)
        case _ => Nil
      }
      here ++ kids(p).flatMap(walk)
    }
    walk(root)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val only = args.headOption
    // capture one representative PRE-checkpoint round body per
    // iterative operator while the registry queries run (see
    // operators.IterTrace) — localCheckpoint severs lineage, so
    // without this the audit lints only the post-checkpoint tail of a
    // 10-iteration job
    graft.operators.IterTrace.enable()
    QueryRegistry.all
      .filter(q => only.forall(q.name.contains))
      .foreach { q =>
        try {
          val df = q.impl(spark, sfDir)
          // Execute the physical plan DIRECTLY: foreach/count wrap the
          // dataframe in their own plan, leaving this one
          // isFinalPlan=false — the audit would then read the static
          // AQE plan (no whole-stage-codegen markers, no runtime join
          // conversions). executedPlan.execute() runs the
          // AdaptiveSparkPlanExec itself (finalizing it) without
          // materializing corpus-sized output on the driver (t19/t20
          // are per-doc).
          df.queryExecution.executedPlan.execute().foreach(_ => ())
          // a finalized AdaptiveSparkPlan prints the final plan AND an
          // "== Initial Plan ==" section — count only the former
          val plan = df.queryExecution.executedPlan.toString
            .split("== Initial Plan ==").head
          def n(pat: String) = pat.r.findAllIn(plan).length
          val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(plan)
            .filterNot(_ == "PushedFilters: []").mkString(" | ")
          val readSchemas = "ReadSchema: [^,\n]*".r.findAllIn(plan).map(_.length).toSeq
          val wins = unboundedGlobalWindows(df.queryExecution.executedPlan)
          val (waived, winViolations) =
            if (singleFileCliContract(q.name)) (wins, Nil) else (Nil, wins)
          val (smallNlj, restNlj) =
            nestedLoopTriage(df.queryExecution.executedPlan)
          val (nljWaived, badNlj) =
            if (queryBroadcastContract(q.name)) (restNlj, Nil)
            else (Nil, restNlj)
          println(f"${q.name}%-28s bhj=${n("BroadcastHashJoin")} smj=${n("SortMergeJoin")} " +
            f"nlj_bad=${badNlj.length} nlj_small=${smallNlj.length} " +
            f"nlj_qbc=${nljWaived.length} " +
            f"exch=${n("Exchange")} codegen=${n("\\*\\(\\d+\\)")} " +
            f"scan=${n("FileScan parquet")} winlint=${winViolations.length}" +
            (if (waived.nonEmpty) f" winlint_waived=${waived.length}" else ""))
          badNlj.foreach(j => println(
            s"   NLJ_VIOLATION: nested-loop/cartesian join without a " +
            s"bounded broadcast side in ${q.name}: " +
            j.verboseString(2).linesIterator.next()))
          winViolations.foreach(w => println(
            s"   WINDOW_LINT_VIOLATION: single-partition window over " +
            s"unbounded input in ${q.name}: ${w.verboseString(2).linesIterator.next()}"))
          waived.foreach(w => println(
            s"   window waived (single-file CLI contract) in ${q.name}: " +
            w.verboseString(2).linesIterator.next()))
          if (pushed.nonEmpty && args.length > 1) println(s"   $pushed")
          if (args.length > 1 && args(1) == "tree") {
            def dump(p: SparkPlan, d: Int): Unit = {
              println("   " + ("  " * d) + p.getClass.getSimpleName)
              kids(p).foreach(dump(_, d + 1))
            }
            dump(df.queryExecution.executedPlan, 0)
          }
        } catch {
          case e: Throwable => println(s"${q.name}: EXPLAIN FAILED ${e.getMessage}")
        }
      }
    // --- iteration-body audit -----------------------------------------
    // cc_minlabel (the one iterative op no registry query drives — the
    // gated queries use the large/small-star variant) runs on a small
    // synthetic chain-with-islands graph just to capture its round body
    if (only.forall("cc_minlabel".contains)) {
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val edges = ((0L to 40L).sliding(2).map(p => (p.head, p.last)).toSeq ++
        Seq((100L, 101L), (102L, 103L))).toDF("a", "b")
      val nodes = edges.select(col("a").as("node"))
        .union(edges.select(col("b").as("node"))).distinct()
      graft.operators.Dedup.connectedComponents(edges, nodes, maxIters = 50)
        .foreach(_ => ())
    }
    val captured = graft.operators.IterTrace.captured
    graft.operators.IterTrace.expected.toSeq.sortBy(_._1).foreach {
      case (tag, drivenBy) =>
        // with a name filter, only tags whose driving query ran apply
        val applies = only.forall(f => drivenBy.contains(f) ||
          tag.contains(f) || captured.contains(tag))
        if (applies) captured.get(tag) match {
          case None =>
            println(s"iter:$tag EXPLAIN FAILED round body never captured " +
              s"(driving query: ${if (drivenBy.isEmpty) "<synthetic>" else drivenBy})")
          case Some(df) =>
            try {
              // same finalize-then-lint protocol as the query rows; the
              // round body's parents are checkpointed, so this executes
              // exactly one representative iteration
              df.queryExecution.executedPlan.execute().foreach(_ => ())
              val plan = df.queryExecution.executedPlan.toString
                .split("== Initial Plan ==").head
              def n(pat: String) = pat.r.findAllIn(plan).length
              val wins = unboundedGlobalWindows(df.queryExecution.executedPlan)
              val (smallNlj, badNlj) =
                nestedLoopTriage(df.queryExecution.executedPlan)
              println(f"iter:$tag%-23s bhj=${n("BroadcastHashJoin")} " +
                f"smj=${n("SortMergeJoin")} " +
                f"nlj_bad=${badNlj.length} nlj_small=${smallNlj.length} " +
                f"exch=${n("Exchange")} codegen=${n("\\*\\(\\d+\\)")} " +
                f"winlint=${wins.length}")
              badNlj.foreach(j => println(
                s"   NLJ_VIOLATION in iteration body iter:$tag: " +
                j.verboseString(2).linesIterator.next()))
              wins.foreach(w => println(
                s"   WINDOW_LINT_VIOLATION in iteration body iter:$tag: " +
                w.verboseString(2).linesIterator.next()))
            } catch {
              case e: Throwable =>
                println(s"iter:$tag EXPLAIN FAILED ${e.getMessage}")
            }
        }
    }
    graft.operators.IterTrace.disable()
    spark.stop()
  }
}
