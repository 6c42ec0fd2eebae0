package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Pins SavGol coefficients to the published closed forms and to the
  * polynomial-reproduction property that defines the filter.
  */
class SavGolSpec extends AnyFunSuite {
  private val Eps = 1e-9

  test("w=7 deg=2 smoothing weights match the classic (-2,3,6,7,6,3,-2)/21") {
    val w = SavGol.centralWeights(7, 2, 0)
    val expect = Array(-2.0, 3, 6, 7, 6, 3, -2).map(_ / 21.0)
    w.zip(expect).foreach { case (a, b) => assert(math.abs(a - b) < Eps) }
  }

  test("w=5 deg=2 smoothing weights match (-3,12,17,12,-3)/35") {
    val w = SavGol.centralWeights(5, 2, 0)
    val expect = Array(-3.0, 12, 17, 12, -3).map(_ / 35.0)
    w.zip(expect).foreach { case (a, b) => assert(math.abs(a - b) < Eps) }
  }

  test("smoothing weights sum to 1; derivative weights sum to 0") {
    assert(math.abs(SavGol.centralWeights(9, 3, 0).sum - 1.0) < Eps)
    assert(math.abs(SavGol.centralWeights(9, 3, 1).sum) < Eps)
    assert(math.abs(SavGol.centralWeights(7, 2, 2).sum) < Eps)
  }

  test("filter reproduces polynomials up to deg exactly (interior + edges)") {
    // f(x) = 1 + 2x + 3x^2 over x = 0..n-1; deg-2 filter must return f and
    // f' exactly at every position including the edge-fitted ones.
    val n = 25
    val y = Array.tabulate(n)(i => 1.0 + 2.0 * i + 3.0 * i * i)
    val s0 = graft.dsp.SignalOps.local.savgol(y, 7, 2, 0)
    val s1 = graft.dsp.SignalOps.local.savgol(y, 7, 2, 1)
    (0 until n).foreach { i =>
      assert(math.abs(s0(i) - y(i)) < 1e-6, s"smooth at $i")
      assert(math.abs(s1(i) - (2.0 + 6.0 * i)) < 1e-6, s"deriv at $i")
    }
  }
}
