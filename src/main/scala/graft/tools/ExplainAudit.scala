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
    // an aggregate bounds rows to |group keys|; a global/local limit
    // bounds them literally — either makes a single-partition sort
    // above it a tiny-table operation, not a corpus-wide funnel
    case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
    case _: org.apache.spark.sql.execution.GlobalLimitExec => true
    case _: org.apache.spark.sql.execution.LocalLimitExec => true
    case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
    case other => kids(other).exists(subtreeBounded)
  }

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
          val winViolations =
            unboundedGlobalWindows(df.queryExecution.executedPlan)
          println(f"${q.name}%-28s bhj=${n("BroadcastHashJoin")} smj=${n("SortMergeJoin")} " +
            f"exch=${n("Exchange")} codegen=${n("\\*\\(\\d+\\)")} " +
            f"scan=${n("FileScan parquet")} winlint=${winViolations.length}")
          winViolations.foreach(w => println(
            s"   WINDOW_LINT_VIOLATION: single-partition window over " +
            s"unbounded input in ${q.name}: ${w.verboseString(2).linesIterator.next()}"))
          if (pushed.nonEmpty && args.length > 1) println(s"   $pushed")
        } catch {
          case e: Throwable => println(s"${q.name}: EXPLAIN FAILED ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
