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
          println(f"${q.name}%-28s bhj=${n("BroadcastHashJoin")} smj=${n("SortMergeJoin")} " +
            f"exch=${n("Exchange")} codegen=${n("\\*\\(\\d+\\)")} " +
            f"scan=${n("FileScan parquet")}")
          if (pushed.nonEmpty && args.length > 1) println(s"   $pushed")
        } catch {
          case e: Throwable => println(s"${q.name}: EXPLAIN FAILED ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
