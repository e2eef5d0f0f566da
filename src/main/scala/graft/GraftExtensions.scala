package graft

import graft.functions.HashExpressions.{CharEntropy, IntersectSize, MinHash64, NGramHashPairs, NGrams, NormalizeUtf8, SimHash64, TopGramStats, VecDot, VecL2, Winnow}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Registers the engine's custom Catalyst expressions as SQL functions,
  * so `spark.sql("SELECT vec_dot(a, b) ...")` works next to the Column
  * API. Install via
  * `spark.builder.withExtensions(new GraftExtensions)` or at runtime
  * with [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    e.injectOptimizerRule(_ => graft.plans.IntersectSizeRewrite)
  }
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("minhash64",
      new ExpressionInfo(classOf[MinHash64].getName, "minhash64"),
      (args: Seq[Expression]) => args match {
        case Seq(shingles) => MinHash64(shingles, 128)
        case Seq(shingles, n) => MinHash64(shingles, intLit(n, "numHashes"))
        case _ => throw new IllegalArgumentException("minhash64(shingles[, numHashes])")
      }),
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => args match {
        case Seq(tokens) => SimHash64(tokens)
        case _ => throw new IllegalArgumentException("simhash64(tokens)")
      }),
    ("vec_dot",
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => VecDot(a, b)
        case _ => throw new IllegalArgumentException("vec_dot(a, b)")
      }),
    ("vec_l2",
      new ExpressionInfo(classOf[VecL2].getName, "vec_l2"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => VecL2(a, b)
        case _ => throw new IllegalArgumentException("vec_l2(a, b)")
      }),
    ("ngrams",
      new ExpressionInfo(classOf[NGrams].getName, "ngrams"),
      (args: Seq[Expression]) => args match {
        case Seq(toks, k) => NGrams(toks, intLit(k, "k"), distinct = true)
        case _ => throw new IllegalArgumentException("ngrams(tokens, k)")
      }),
    ("ngram_hash_pairs",
      new ExpressionInfo(classOf[NGramHashPairs].getName, "ngram_hash_pairs"),
      (args: Seq[Expression]) => args match {
        case Seq(toks, k) => NGramHashPairs(toks, intLit(k, "k"))
        case _ => throw new IllegalArgumentException("ngram_hash_pairs(tokens, k)")
      }),
    ("gram_stats",
      new ExpressionInfo(classOf[TopGramStats].getName, "gram_stats"),
      (args: Seq[Expression]) => args match {
        case Seq(grams) => TopGramStats(grams)
        case _ => throw new IllegalArgumentException("gram_stats(grams)")
      }),
    ("intersect_size",
      new ExpressionInfo(classOf[IntersectSize].getName, "intersect_size"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => IntersectSize(a, b)
        case _ => throw new IllegalArgumentException("intersect_size(a, b)")
      }),
    ("winnow",
      new ExpressionInfo(classOf[Winnow].getName, "winnow"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => Winnow(text, 5, 4)
        case Seq(text, k, w) => Winnow(text, intLit(k, "k"), intLit(w, "w"))
        case _ => throw new IllegalArgumentException("winnow(text[, k, w])")
      }),
    ("normalize_text",
      new ExpressionInfo(classOf[NormalizeUtf8].getName, "normalize_text"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => NormalizeUtf8(text)
        case _ => throw new IllegalArgumentException("normalize_text(text)")
      }),
    ("char_entropy",
      new ExpressionInfo(classOf[CharEntropy].getName, "char_entropy"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => CharEntropy(text)
        case _ => throw new IllegalArgumentException("char_entropy(text)")
      }))

  /** Runtime registration into an existing session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
