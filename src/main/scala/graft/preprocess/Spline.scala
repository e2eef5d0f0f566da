package graft.preprocess

/** Not-a-knot cubic spline — the interpolant behind pandas
  * `interpolate(method='cubic')` (process_csv_data.py:124-126, which
  * delegates to scipy's `interp1d(kind='cubic')`; scipy builds the
  * k=3 spline with not-a-knot boundary conditions).
  *
  * Solved on second derivatives M_i: interior continuity rows form a
  * tridiagonal system; the two not-a-knot rows (third-derivative
  * continuity at the second and second-to-last knots) are eliminated
  * into the first/last interior rows, keeping the whole solve a single
  * O(n) Thomas pass — no dense algebra, so a series of any length
  * solves in linear time.
  *
  * Fallbacks below the spline's minimum support: n == 1 → constant,
  * n ∈ {2, 3} → piecewise linear (scipy's kind='cubic' refuses n < 4
  * outright; filling linearly instead of failing is the documented
  * divergence). Evaluation outside the known range clamps to the
  * nearest known value (`limit_direction='both'` semantics, shared
  * with the linear/nearest fills — the repair step never emits NaN).
  */
object Spline {

  /** Evaluator for the known points (x strictly increasing). */
  def notAKnot(xs: Array[Double], ys: Array[Double]): Double => Double = {
    val n = xs.length
    require(n == ys.length, "xs/ys length mismatch")
    require(n > 0, "spline needs at least one known point")
    if (n == 1) return _ => ys(0)
    if (n < 4) return linearEval(xs, ys)
    val m = secondDerivatives(xs, ys)
    x => {
      if (x <= xs(0)) ys(0)
      else if (x >= xs(n - 1)) ys(n - 1)
      else {
        val i = interval(xs, x)
        val h = xs(i + 1) - xs(i)
        val a = xs(i + 1) - x
        val b = x - xs(i)
        (m(i) * a * a * a + m(i + 1) * b * b * b) / (6.0 * h) +
          (ys(i) / h - m(i) * h / 6.0) * a +
          (ys(i + 1) / h - m(i + 1) * h / 6.0) * b
      }
    }
  }

  private def linearEval(xs: Array[Double], ys: Array[Double]): Double => Double = {
    val n = xs.length
    x =>
      if (x <= xs(0)) ys(0)
      else if (x >= xs(n - 1)) ys(n - 1)
      else {
        val i = interval(xs, x)
        ys(i) + (ys(i + 1) - ys(i)) * (x - xs(i)) / (xs(i + 1) - xs(i))
      }
  }

  /** Index i with xs(i) <= x < xs(i+1), for x strictly inside range. */
  private def interval(xs: Array[Double], x: Double): Int = {
    var lo = 0
    var hi = xs.length - 2
    while (lo < hi) {
      val mid = (lo + hi + 1) >>> 1
      if (xs(mid) <= x) lo = mid else hi = mid - 1
    }
    lo
  }

  /** Second derivatives M_0..M_{n-1} under not-a-knot conditions,
    * n >= 4. The boundary rows
    *   h1·M0 − (h0+h1)·M1 + h0·M2 = 0
    *   h_{n-2}·M_{n-3} − (h_{n-3}+h_{n-2})·M_{n-2} + h_{n-3}·M_{n-1} = 0
    * are substituted into the first/last interior continuity rows, the
    * reduced tridiagonal system over M_1..M_{n-2} is Thomas-solved, and
    * the boundary values are back-substituted. */
  private def secondDerivatives(xs: Array[Double], ys: Array[Double]): Array[Double] = {
    val n = xs.length
    val h = Array.tabulate(n - 1)(i => xs(i + 1) - xs(i))
    val d = Array.tabulate(n - 2)(i =>
      6.0 * ((ys(i + 2) - ys(i + 1)) / h(i + 1) - (ys(i + 1) - ys(i)) / h(i)))
    // unknowns u(0..n-3) = M_1..M_{n-2}; rows are the interior
    // continuity equations with M_0 / M_{n-1} eliminated
    val len = n - 2
    val sub = new Array[Double](len)  // below-diagonal
    val diag = new Array[Double](len)
    val sup = new Array[Double](len)  // above-diagonal
    val rhs = new Array[Double](len)
    for (i <- 0 until len) {
      sub(i) = if (i == 0) 0.0 else h(i)
      diag(i) = 2.0 * (h(i) + h(i + 1))
      sup(i) = if (i == len - 1) 0.0 else h(i + 1)
      rhs(i) = d(i)
    }
    // first interior row: M_0 = ((h0+h1)·M_1 − h0·M_2) / h1
    diag(0) += h(0) * (h(0) + h(1)) / h(1)
    sup(0) -= h(0) * h(0) / h(1)
    // last interior row: M_{n-1} = ((h_{n-3}+h_{n-2})·M_{n-2} − h_{n-2}·M_{n-3}) / h_{n-3}
    val hl = h(n - 2)
    val hp = h(n - 3)
    diag(len - 1) += hl * (hp + hl) / hp
    sub(len - 1) -= hl * hl / hp
    // Thomas
    for (i <- 1 until len) {
      val w = sub(i) / diag(i - 1)
      diag(i) -= w * sup(i - 1)
      rhs(i) -= w * rhs(i - 1)
    }
    val u = new Array[Double](len)
    u(len - 1) = rhs(len - 1) / diag(len - 1)
    for (i <- len - 2 to 0 by -1)
      u(i) = (rhs(i) - sup(i) * u(i + 1)) / diag(i)
    val m = new Array[Double](n)
    for (i <- 0 until len) m(i + 1) = u(i)
    m(0) = ((h(0) + h(1)) * m(1) - h(0) * m(2)) / h(1)
    m(n - 1) = ((hp + hl) * m(n - 2) - hl * m(n - 3)) / hp
    m
  }
}
