package graft.stats

import org.scalatest.funsuite.AnyFunSuite

class SplinesSpec extends AnyFunSuite {

  private def eval(knots: Array[Double], coefs: Array[Array[Double]],
      x: Double): Double = {
    var i = java.util.Arrays.binarySearch(knots, x)
    if (i < 0) i = -i - 2
    if (i >= coefs.length) i = coefs.length - 1
    val d = x - knots(i)
    coefs(i).indices.reverse.foldLeft(0.0)((acc, j) =>
      acc * d + coefs(i)(j))
  }

  test("quadratic reproduces an exact quadratic through irregular knots") {
    def q(x: Double) = 2.0 * x * x - 3.0 * x + 1.0
    val xs = Array(0.0, 1.0, 2.5, 3.1, 5.0, 8.0)
    val ys = xs.map(q)
    val (k, c) = Splines.quadratic(xs, ys)
    for (x <- Seq(0.3, 1.7, 2.9, 4.2, 7.7))
      assert(math.abs(eval(k, c, x) - q(x)) < 1e-9, s"x=$x")
  }

  test("quadratic passes through knots and is C1 at interior knots") {
    val xs = Array(0.0, 1.0, 2.0, 4.0, 7.0)
    val ys = Array(1.0, -2.0, 0.5, 3.0, 3.0)
    val (k, c) = Splines.quadratic(xs, ys)
    xs.zip(ys).foreach { case (x, y) =>
      assert(math.abs(eval(k, c, x) - y) < 1e-9) }
    // derivative continuity: left piece slope at knot == right piece b
    for (i <- 1 until xs.length - 1) {
      val h = xs(i) - xs(i - 1)
      val left = c(i - 1)(1) + 2 * c(i - 1)(2) * h
      assert(math.abs(left - c(i)(1)) < 1e-9, s"knot $i")
    }
  }

  test("pchip: knots, monotonicity preserved, flat at sign changes") {
    val xs = Array(0.0, 1.0, 2.0, 3.0, 5.0, 6.0)
    val ys = Array(0.0, 0.5, 2.0, 2.0, 4.0, 3.0)
    val (k, c) = Splines.pchip(xs, ys)
    xs.zip(ys).foreach { case (x, y) =>
      assert(math.abs(eval(k, c, x) - y) < 1e-9) }
    // no overshoot: every value between adjacent knots stays within
    // the knot range (the defining pchip property)
    for (i <- 0 until xs.length - 1; t <- 1 until 20) {
      val x = xs(i) + (xs(i + 1) - xs(i)) * t / 20.0
      val v = eval(k, c, x)
      val (lo, hi) = (math.min(ys(i), ys(i + 1)),
        math.max(ys(i), ys(i + 1)))
      assert(v >= lo - 1e-9 && v <= hi + 1e-9, s"x=$x v=$v")
    }
    // slope sign change at x=3 (rise then flat) -> derivative 0 there
    assert(math.abs(c(3)(1)) < 1e-12) // piece [3,5] starts with d=0
  }

  test("pchip two-point case is linear") {
    val (k, c) = Splines.pchip(Array(0.0, 2.0), Array(1.0, 5.0))
    assert(math.abs(eval(k, c, 1.0) - 3.0) < 1e-12)
  }
}
