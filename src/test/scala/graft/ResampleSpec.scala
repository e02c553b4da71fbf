package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.Resample

class ResampleSpec extends AnyFunSuite {

  test("kaiser window: symmetric, peak 1 at center") {
    val w = Resample.kaiser(41, 5.0)
    assert(math.abs(w(20) - 1.0) < 1e-12)
    for (i <- 0 until 20) assert(math.abs(w(i) - w(40 - i)) < 1e-12)
    assert(w(0) < 0.05) // kaiser-5 edges are strongly tapered
  }

  test("polyphase taps: DC gain equals up factor") {
    val h = Resample.polyTaps(2, 1)
    assert(h.length == 41)
    assert(math.abs(h.sum - 2.0) < 1e-12)
  }

  test("fourier resample preserves a band-limited sine (2x up)") {
    val n = 128
    val x = Array.tabulate(n)(i => math.sin(2 * math.Pi * 5 * i / n))
    val y = Resample.fourierResampleKernel(2 * n)(x)
    assert(y.length == 2 * n)
    for (i <- 0 until 2 * n) {
      val expect = math.sin(2 * math.Pi * 5 * i / (2.0 * n))
      assert(math.abs(y(i) - expect) < 1e-9, s"i=$i")
    }
  }

  test("fourier resample downsamples a band-limited sine (2x down)") {
    val n = 256
    val x = Array.tabulate(n)(i => math.sin(2 * math.Pi * 5 * i / n))
    val y = Resample.fourierResampleKernel(n / 2)(x)
    assert(y.length == n / 2)
    for (i <- 0 until n / 2) {
      val expect = math.sin(2 * math.Pi * 5 * i / (n / 2.0))
      assert(math.abs(y(i) - expect) < 1e-9, s"i=$i")
    }
  }
}
