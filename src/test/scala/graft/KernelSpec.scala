package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.{BeatDetectors, Cbd}

class KernelSpec extends AnyFunSuite {

  test("CBD: uniform IBIs produce no artifacts") {
    val beats = Array.tabulate(50)(i => 100L + i * 250L)
    assert(Cbd.kernel(beats, fs = 1000).isEmpty)
  }

  test("CBD: a single ectopic interval flags the following beat") {
    // regular 800 ms IBIs at fs=1000, one 300 ms early beat in the middle
    val regular = Array.tabulate(30)(i => i * 800L)
    val withEctopic = (regular.take(15) :+ (regular(14) + 300L)) ++ regular.drop(15)
    val arts = Cbd.kernel(withEctopic.sorted, fs = 1000)
    assert(arts.nonEmpty)
    assert(arts.contains(regular(14) + 300L) || arts.contains(regular(15)))
  }

  test("CBD: implausible IBI (< 40 bpm) is flagged") {
    val beats = Array(0L, 800L, 1600L, 3700L, 4500L, 5300L, 6100L, 6900L)
    val arts = Cbd.kernel(beats, fs = 1000)
    assert(arts.contains(3700L)) // the beat ending the 2100 ms interval
  }

  test("Pan-Tompkins kernel finds periodic peaks in a synthetic ECG") {
    val fs = 128
    val n = fs * 30
    // smooth 1 Hz bump train — a sharp impulse train would produce MWA
    // plateaus, which strict local-max peak finding (plateau_size=(1,1))
    // rejects by design
    val sig = Array.tabulate(n) { i =>
      val phase = i % fs
      math.exp(-math.pow(phase - 20.37, 2) / 18.0)
    }
    val beats = BeatDetectors.panTompkinsKernel(fs)(sig)
    // ~1 beat/s after warm-up; refractory prevents doubles
    assert(beats.length >= 20 && beats.length <= 32, s"got ${beats.length}")
    val ibis = beats.sliding(2).map(p => p(1) - p(0)).toArray
    assert(ibis.forall(d => d > fs / 2), "refractory violated")
  }
}
