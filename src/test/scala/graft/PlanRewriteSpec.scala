package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** The injected optimizer rule ([[graft.plans.IntersectSizeRewrite]]):
  * fires on the Jaccard pattern, preserves results, and leaves
  * non-matching shapes alone.
  */
class PlanRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def jaccardDf = {
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e zz"), (3L, "q r s t u v"))
      .toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"),
      TextAnalysis.wordShingles(col("text"), 3).as("sh"))
    sh.as("x").join(sh.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        TextAnalysis.jaccard(col("x.sh"), col("y.sh")).as("j"))
  }

  test("rule rewrites size(array_intersect) to intersect_size in the plan") {
    val plan = jaccardDf.queryExecution.optimizedPlan.toString
    assert(plan.contains("intersect_size"), plan)
    assert(!plan.contains("array_intersect"), plan)
  }

  test("rewritten jaccard equals the builtin computation") {
    val got = jaccardDf.as[(Long, Long, Double)].collect().toSet
    // reference without the rule: compute via exploded set ops
    def shingles(t: String): Set[String] =
      t.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
    val texts = Map(1L -> "a b c d e f", 2L -> "a b c d e zz", 3L -> "q r s t u v")
    val want = (for {
      a <- texts.keys; b <- texts.keys if a < b
      sa = shingles(texts(a)); sb = shingles(texts(b))
      inter = (sa & sb).size.toDouble
    } yield (a, b, inter / (sa.size + sb.size - inter))).toSet
    assert(got == want)
  }

  test("legacy or nullable shapes are not rewritten") {
    // integer arrays: guard requires string elements (non-foldable
    // input so constant folding can't collapse the expression first)
    val df = spark.range(1).select(
      size(array_intersect(
        array(col("id").cast("int") + 1, lit(2), lit(3)),
        array(lit(2), lit(3), lit(4)))).as("n"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("array_intersect"), plan)
    assert(df.head().getInt(0) == 2)
  }
}
