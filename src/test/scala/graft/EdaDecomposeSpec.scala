package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.EdaDecompose

class EdaDecomposeSpec extends AnyFunSuite {

  test("cvxEDA-class decomposition separates Bateman bumps from a slow baseline") {
    val fs = 4
    val n = 480 // 2 minutes
    // baseline: 2 µS with slow linear rise to 2.5
    val tonicTrue = Array.tabulate(n)(i => 2.0 + 0.5 * i / n)
    // two Bateman-shaped SCRs at 30 s and 75 s
    def bateman(t: Double): Double =
      if (t < 0) 0.0 else math.exp(-t / 2.0) - math.exp(-t / 0.7)
    val bumps = Array.tabulate(n) { i =>
      val t = i.toDouble / fs
      0.6 * bateman(t - 30) + 0.8 * bateman(t - 75)
    }
    val y = Array.tabulate(n)(i => tonicTrue(i) + bumps(i))
    val r = EdaDecompose.cvxEdaKernel(fs)(y)

    // driver is non-negative by construction
    assert(r.driver.forall(_ >= 0.0))
    // reconstruction is close
    val resid = Array.tabulate(n)(i => y(i) - r.phasic(i) - r.tonic(i))
    val rms = math.sqrt(resid.map(x => x * x).sum / n)
    assert(rms < 0.05, s"rms=$rms")
    // tonic tracks the baseline (no bump leakage beyond tolerance)
    val tonicErr = Array.tabulate(n)(i => math.abs(r.tonic(i) - tonicTrue(i)))
    assert(tonicErr.sum / n < 0.15, s"mean tonic err=${tonicErr.sum / n}")
    // phasic mass concentrates after the bump onsets
    val phasicAt = (a: Int, b: Int) => (a until b).map(r.phasic).sum
    val inBump = phasicAt(30 * fs, 45 * fs) + phasicAt(75 * fs, 90 * fs)
    val outBump = phasicAt(0, 30 * fs) + phasicAt(45 * fs, 75 * fs) + phasicAt(90 * fs, n)
    assert(inBump > 2 * math.max(outBump, 0.1), s"in=$inBump out=$outBump")
  }
}
