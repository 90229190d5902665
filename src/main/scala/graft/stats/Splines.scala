package graft.stats

/** Piecewise-polynomial interpolants backing `Station.interpolate`'s
  * driver-fitted methods (reference surface: pandas
  * `Series.interpolate(method=...)` → scipy, station.py:403-437).
  * Knot sets are calibration-scale (one value per day), so fitting on
  * the driver and broadcasting (knots, ascending coefficients) for
  * Horner evaluation on executors is the right distribution shape —
  * the EVALUATION over the hourly grid is what scales, and that stays
  * a pure per-row expression.
  *
  * All fits return (knots, coefs) where `coefs(i)` are ascending
  * polynomial coefficients in (x - knots(i)) valid on
  * [knots(i), knots(i+1)].
  */
object Splines {

  /** C1 piecewise-quadratic interpolant (pandas method='quadratic' /
    * interp1d kind=2 shape). Construction: the leading parabola through
    * the first three points seeds the start slope, then first-derivative
    * continuity propagates: b_{i+1} = 2*m_i - b_i. Reproduces exact
    * quadratics (scipy's B-spline variant differs only in boundary
    * treatment, as documented for cubic). */
  def quadratic(xs: Array[Double], ys: Array[Double])
      : (Array[Double], Array[Array[Double]]) = {
    require(xs.length >= 3, "quadratic interpolation needs >= 3 knots")
    val n = xs.length
    // start slope from the parabola through (x0,x1,x2), evaluated at x0
    val (h0, h1) = (xs(1) - xs(0), xs(2) - xs(1))
    val (m0, m1) = ((ys(1) - ys(0)) / h0, (ys(2) - ys(1)) / h1)
    var b = m0 - (m1 - m0) / (h0 + h1) * h0
    val coefs = Array.ofDim[Array[Double]](n - 1)
    var i = 0
    while (i < n - 1) {
      val h = xs(i + 1) - xs(i)
      val m = (ys(i + 1) - ys(i)) / h
      coefs(i) = Array(ys(i), b, (m - b) / h)
      b = 2 * m - b
      i += 1
    }
    (xs.clone(), coefs)
  }

  /** Monotone cubic Hermite (pandas method='pchip'): Fritsch–Carlson
    * derivatives — harmonic-mean interior rule, three-point edge rule
    * with the sign/3x clamps — matching scipy's PchipInterpolator. */
  def pchip(xs: Array[Double], ys: Array[Double])
      : (Array[Double], Array[Array[Double]]) = {
    require(xs.length >= 2, "pchip needs >= 2 knots")
    val n = xs.length
    val h = Array.tabulate(n - 1)(i => xs(i + 1) - xs(i))
    val m = Array.tabulate(n - 1)(i => (ys(i + 1) - ys(i)) / h(i))
    val d = new Array[Double](n)
    def edge(h0: Double, h1: Double, m0: Double, m1: Double): Double = {
      val t = ((2 * h0 + h1) * m0 - h0 * m1) / (h0 + h1)
      if (math.signum(t) != math.signum(m0)) 0.0
      else if (math.signum(m0) != math.signum(m1) &&
        math.abs(t) > 3 * math.abs(m0)) 3 * m0
      else t
    }
    if (n == 2) { d(0) = m(0); d(1) = m(0) }
    else {
      d(0) = edge(h(0), h(1), m(0), m(1))
      d(n - 1) = edge(h(n - 2), h(n - 3), m(n - 2), m(n - 3))
      var i = 1
      while (i < n - 1) {
        d(i) =
          if (m(i - 1) * m(i) <= 0) 0.0
          else {
            val w1 = 2 * h(i) + h(i - 1)
            val w2 = h(i) + 2 * h(i - 1)
            (w1 + w2) / (w1 / m(i - 1) + w2 / m(i))
          }
        i += 1
      }
    }
    val coefs = Array.tabulate(n - 1) { i =>
      Array(ys(i), d(i),
        (3 * m(i) - 2 * d(i) - d(i + 1)) / h(i),
        (d(i) + d(i + 1) - 2 * m(i)) / (h(i) * h(i)))
    }
    (xs.clone(), coefs)
  }
}
