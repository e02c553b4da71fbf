package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.{BeatDetectors, Fft}

class FftDetectorSpec extends AnyFunSuite {

  private def naiveDft(x: Array[Double]): (Array[Double], Array[Double]) = {
    val n = x.length
    val re = new Array[Double](n); val im = new Array[Double](n)
    for (k <- 0 until n; j <- 0 until n) {
      val ang = -2 * math.Pi * k * j / n
      re(k) += x(j) * math.cos(ang)
      im(k) += x(j) * math.sin(ang)
    }
    (re, im)
  }

  test("fft matches naive DFT for power-of-two and arbitrary lengths") {
    for (n <- Seq(16, 12, 37, 100)) {
      val x = Array.tabulate(n)(i => math.sin(0.7 * i) + 0.3 * math.cos(2.1 * i))
      val (er, ei) = naiveDft(x)
      val re = x.clone(); val im = new Array[Double](n)
      Fft.fft(re, im, invert = false)
      for (k <- 0 until n) {
        assert(math.abs(re(k) - er(k)) < 1e-8, s"n=$n k=$k re")
        assert(math.abs(im(k) - ei(k)) < 1e-8, s"n=$n k=$k im")
      }
      // round trip
      Fft.fft(re, im, invert = true)
      for (k <- 0 until n) assert(math.abs(re(k) - x(k)) < 1e-9)
    }
  }

  test("hilbert imaginary part of cos is sin") {
    val n = 256
    val x = Array.tabulate(n)(i => math.cos(2 * math.Pi * 8 * i / n))
    val h = Fft.hilbertImag(x)
    for (i <- 0 until n)
      assert(math.abs(h(i) - math.sin(2 * math.Pi * 8 * i / n)) < 1e-9)
  }

  /** Synthetic ECG-ish train at fs=128: sharp R spikes every second over
    * gentle noise-free baseline. */
  private def spikes(fs: Int, seconds: Int): (Array[Double], Seq[Int]) = {
    val n = fs * seconds
    val x = new Array[Double](n)
    val peaks = (1 until seconds).map(_ * fs + fs / 2)
    peaks.foreach { p =>
      x(p - 1) = 0.4; x(p) = 1.0; x(p + 1) = 0.35
      x(p - 2) = -0.15; x(p + 2) = -0.2
    }
    (x, peaks)
  }

  test("engzee finds steady spikes (modulo its seed-beat drop)") {
    val fs = 128
    val (x, peaks) = spikes(fs, 20)
    val got = BeatDetectors.engzeeKernel(fs)(x).toSeq
    assert(got.nonEmpty)
    // every detection is within 3 samples of a true peak
    assert(got.forall(g => peaks.exists(p => math.abs(p - g) <= 3)))
    assert(got.size >= peaks.size - 3)
  }

  test("erma finds sinusoidal pulse peaks under the refractory gate") {
    val fs = 128
    val n = fs * 10
    // 1 Hz PPG-like wave: peaks at i = 32 + 128k
    val x = Array.tabulate(n)(i => math.sin(2 * math.Pi * i / fs))
    val got = graft.kernels.PpgDetectors.ermaKernel(fs)(x).toSeq
    assert(got.size >= 8)
    assert(got.forall(g => (g - 32) % fs == 0 || math.abs((g % fs) - 32) <= 2))
  }

  test("manikandan finds steady spikes") {
    val fs = 128
    val (x0, peaks) = spikes(fs, 20)
    // a zero-diff baseline would make the Shannon energy NaN (0·log 0,
    // faithful numpy semantics) — real inputs are always pre-filtered, so
    // give the synthetic signal a small smooth wiggle
    val x = x0.zipWithIndex.map { case (v, i) => v + 0.01 * math.sin(0.37 * i) }
    val got = BeatDetectors.manikandanKernel(fs)(x).toSeq
    assert(got.nonEmpty)
    assert(got.forall(g => peaks.exists(p => math.abs(p - g) <= 3)))
    assert(got.size >= peaks.size - 4)
  }
}
