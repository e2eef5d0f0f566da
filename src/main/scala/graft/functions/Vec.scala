package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` embedding columns, built from
  * codegen'd higher-order functions (`zip_with`/`aggregate`) — no UDFs,
  * so whole-stage codegen keeps the hot loop fused (SURVEY.md §2.8
  * north-star ops).
  *
  * Convention: compute in double (cast float arrays once, up front) and
  * fold sequentially — deterministic and bit-identical to a sequential
  * C loop over the same doubles.
  */
object Vec {

  /** Cast an `array<float>` column to `array<double>` for stable math. */
  def asDouble(a: Column): Column = a.cast("array<double>")

  /** Dot product — custom fused-loop expression ([[HashExpressions.VecDot]]);
    * the HOF formulation (`aggregate(zip_with(...))`) is interpreted
    * per element and an order of magnitude slower. Top-level use only;
    * inside lambdas use [[dotHof]]. */
  def dot(a: Column, b: Column): Column = HashExpressions.vec_dot(a, b)

  /** Higher-order-function dot product — the pure-builtin reference
    * implementation (used in tests to cross-check VecDot). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Euclidean distance — fused-loop kernel ([[HashExpressions.VecL2]]),
    * Σ(x−y)² left-to-right then √ (the order external oracles use). */
  def l2(a: Column, b: Column): Column = HashExpressions.vec_l2(a, b)

  /** Higher-order-function L2 — pure-builtin cross-check for [[l2]]. */
  def l2Hof(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; callers that compare one row against many
    * should pre-normalize instead (see [[normalize]]) so each pair costs
    * one dot product, not three. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Unit-normalize; with both sides normalized, cosine == dot. */
  def normalize(a: Column): Column = {
    val n = norm(a)
    transform(a, x => x / n)
  }

  /** Sign-bit signature of `a` against `planes` (random hyperplane LSH):
    * bit i set iff dot(a, planes(i)) > 0, packed into one long.
    * `planes.size` ≤ 63. Plane values are embedded as literals —
    * constant-folded, broadcast-free. */
  def hyperplaneSignature(a: Column, planes: Seq[Seq[Double]]): Column = {
    require(planes.nonEmpty && planes.size <= 63, "1..63 planes")
    planes.zipWithIndex.map { case (p, i) =>
      val plane = array(p.map(lit): _*)
      when(dot(a, plane) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }

  /** Deterministic unit-ish random hyperplanes (fixed seed). */
  def randomPlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }
}
