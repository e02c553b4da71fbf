package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.Iir

/** Property-based validation of the IIR design + filtfilt kernels
  * (frequency-response invariants that any correct implementation must
  * satisfy — no external oracle needed). */
class IirSpec extends AnyFunSuite {

  /** |H(e^{jw})| for coefficient arrays. */
  private def gain(b: Array[Double], a: Array[Double], w: Double): Double = {
    def eval(c: Array[Double]): Iir.C =
      c.zipWithIndex.map { case (ci, i) =>
        Iir.C(ci * math.cos(-i * w), ci * math.sin(-i * w))
      }.foldLeft(Iir.C.zero)(_ + _)
    (eval(b) / eval(a)).abs
  }

  test("butter lowpass: unit DC gain, -3 dB at cutoff, strong stopband attenuation") {
    val (b, a) = Iir.butter(4, Seq(0.2), "lowpass")
    assert(math.abs(gain(b, a, 0) - 1.0) < 1e-9)
    assert(math.abs(gain(b, a, 0.2 * math.Pi) - math.sqrt(0.5)) < 1e-9)
    assert(gain(b, a, 0.8 * math.Pi) < 1e-3)
  }

  test("butter highpass: zero DC gain, unit Nyquist gain") {
    val (b, a) = Iir.butter(3, Seq(0.3), "highpass")
    assert(gain(b, a, 0) < 1e-12)
    assert(math.abs(gain(b, a, math.Pi) - 1.0) < 1e-9)
    assert(math.abs(gain(b, a, 0.3 * math.Pi) - math.sqrt(0.5)) < 1e-9)
  }

  /** Digital frequency (rad/sample) of the analog band center after the
    * bilinear transform at the internal fs=2 convention. */
  private def digitalCenter(w1: Double, w2: Double): Double = {
    val warped1 = 4.0 * math.tan(math.Pi * w1 / 2)
    val warped2 = 4.0 * math.tan(math.Pi * w2 / 2)
    2.0 * math.atan(math.sqrt(warped1 * warped2) / 4.0)
  }

  test("butter bandpass: zero at DC and Nyquist, ~unit at warped center") {
    val (b, a) = Iir.butter(2, Seq(0.5 / 16, 15.0 / 16), "bandpass") // the Pan-Tompkins preprocess at fs=32
    assert(gain(b, a, 0) < 1e-9)
    assert(gain(b, a, math.Pi) < 1e-9)
    assert(math.abs(gain(b, a, digitalCenter(0.5 / 16, 15.0 / 16)) - 1.0) < 1e-6)
    // band edges sit at -3 dB
    assert(math.abs(gain(b, a, 0.5 / 16 * math.Pi) - math.sqrt(0.5)) < 1e-9)
    assert(math.abs(gain(b, a, 15.0 / 16 * math.Pi) - math.sqrt(0.5)) < 1e-9)
  }

  test("butter bandstop: unit at DC and Nyquist, null at warped center") {
    val (b, a) = Iir.butter(2, Seq(0.2, 0.4), "bandstop")
    assert(math.abs(gain(b, a, 0) - 1.0) < 1e-9)
    assert(math.abs(gain(b, a, math.Pi) - 1.0) < 1e-9)
    assert(gain(b, a, digitalCenter(0.2, 0.4)) < 1e-9)
    assert(math.abs(gain(b, a, 0.2 * math.Pi) - math.sqrt(0.5)) < 1e-9)
    assert(math.abs(gain(b, a, 0.4 * math.Pi) - math.sqrt(0.5)) < 1e-9)
  }

  test("cheby1: DC gain 1 (odd order) and 1/sqrt(1+eps^2) (even order); ripple bounded in passband") {
    val rp = 1.0
    val eps2 = math.pow(10, 0.1 * rp) - 1
    val (b3, a3) = Iir.cheby1(3, rp, Seq(0.25), "lowpass")
    assert(math.abs(gain(b3, a3, 0) - 1.0) < 1e-9)
    val (b4, a4) = Iir.cheby1(4, rp, Seq(0.25), "lowpass")
    assert(math.abs(gain(b4, a4, 0) - 1.0 / math.sqrt(1 + eps2)) < 1e-9)
    for (fi <- 1 to 24; f = fi / 100.0) {
      val g = gain(b4, a4, f * math.Pi)
      assert(g <= 1.0 + 1e-9 && g >= 1.0 / math.sqrt(1 + eps2) - 1e-9, s"ripple at $f: $g")
    }
  }

  test("cheby2: stopband attenuation >= rs dB beyond the stopband edge") {
    val rs = 40.0
    val (b, a) = Iir.cheby2(4, rs, Seq(0.3), "lowpass")
    assert(math.abs(gain(b, a, 0) - 1.0) < 1e-9)
    for (fi <- 30 to 99 by 5; f = fi / 100.0) {
      val g = gain(b, a, f * math.Pi)
      assert(g <= math.pow(10, -rs / 20) + 1e-9, s"stopband leak at $f: $g")
    }
  }

  test("lfilterZi: steady state holds exactly for a step input") {
    val (b, a) = Iir.butter(4, Seq(0.2), "lowpass")
    val zi = Iir.lfilterZi(b, a)
    val y = Iir.lfilter(b, a, Array.fill(50)(1.0), zi)
    y.foreach(v => assert(math.abs(v - 1.0) < 1e-9))
  }

  test("filtfilt: zero phase and amplitude |H|^2 on a pure tone; constant passes through") {
    val fs = 64
    val f0 = 4.0
    val (b, a) = Iir.butter(2, Seq(0.25), "lowpass")
    val n = 1024
    val x = Array.tabulate(n)(i => math.sin(2 * math.Pi * f0 * i / fs))
    val y = Iir.filtfilt(b, a, x)
    val g2 = math.pow(gain(b, a, 2 * math.Pi * f0 / fs), 2)
    // compare mid-section samples: same phase, scaled by |H|^2
    for (i <- 400 until 600)
      assert(math.abs(y(i) - g2 * x(i)) < 1e-3, s"sample $i: ${y(i)} vs ${g2 * x(i)}")
    val const = Iir.filtfilt(b, a, Array.fill(200)(3.7))
    const.foreach(v => assert(math.abs(v - 3.7) < 1e-8))
  }

  test("ellip lowpass: equiripple passband, band edge at ripple floor, stopband at rs") {
    val rp = 1.0; val rs = 40.0
    val ripple = math.pow(10, -rp / 20) // 0.8913
    val floor = math.pow(10, -rs / 20) // 0.01
    val (b, a) = Iir.ellip(4, rp, rs, Seq(0.3), "lowpass")
    // even order: DC sits at the ripple floor of the passband
    assert(math.abs(gain(b, a, 0) - ripple) < 1e-6)
    // passband stays within [ripple, 1] and touches both
    val pb = (0 to 300).map(i => gain(b, a, i / 1000.0 * math.Pi))
    assert(pb.min > ripple - 1e-6 && pb.max < 1.0 + 1e-6)
    assert(pb.max > 1.0 - 1e-4)
    // band edge hits the ripple exactly
    assert(math.abs(gain(b, a, 0.3 * math.Pi) - ripple) < 1e-6)
    // stopband bounded by the attenuation floor (elliptic equiripple)
    for (i <- 55 to 100)
      assert(gain(b, a, i / 100.0 * math.Pi) < floor * 1.01, s"w=$i%")
  }

  test("ellip odd order: unit DC gain; bandpass zero at DC/Nyquist") {
    val (b, a) = Iir.ellip(3, 1.0, 40.0, Seq(0.25), "lowpass")
    assert(math.abs(gain(b, a, 0) - 1.0) < 1e-9)
    // elliptic zeros are finite, so the bandpass stop bands sit at the
    // equiripple floor (not hard zeros like Butterworth)
    val floor = math.pow(10, -40.0 / 20)
    val (bb, ab) = Iir.ellip(2, 1.0, 40.0, Seq(1.0 / 16, 15.0 / 16), "bandpass")
    assert(gain(bb, ab, 0) < floor * 1.01)
    assert(gain(bb, ab, math.Pi) < floor * 1.01)
    val wc = digitalCenter(1.0 / 16, 15.0 / 16)
    val g = gain(bb, ab, wc)
    assert(g > 0.8 && g < 1.01)
  }
}
