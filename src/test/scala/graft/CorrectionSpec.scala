package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.Correction

class CorrectionSpec extends AnyFunSuite {

  private val fs = 32
  // Steady rhythm: IBI 32 samples (1 s at fs=32) -> HR 60.
  private def steadyBeats(n: Int, ibi: Int = 32): Array[Double] =
    Array.tabulate(n)(i => (i * ibi).toDouble)

  test("clean series passes through: all Correct, no corrections") {
    val beats = steadyBeats(12)
    val (orig, corr) = Correction.correctInterval(fs)(beats)
    assert(orig.length == 12 && corr.length == 12)
    assert(orig.drop(1).forall(_.correction == 0))
    assert(corr.drop(1).forall(_.flag.contains("Correct")))
    assert(corr.map(_.beat).toSeq == beats.toSeq)
    // IBI ms = 32/32*1000 = 1000
    assert(corr.drop(1).forall(_.ibiMs.contains(1000.0)))
  }

  test("missed beat (extra-long IBI) is split back into two intervals") {
    // beats at 0,32,...,192 then a MISSED beat: next at 256 (IBI 64 = 2x).
    val beats = (0 to 6).map(_ * 32.0).toArray ++ Array(256.0, 288.0, 320.0)
    val (orig, corr) = Correction.correctInterval(fs)(beats)
    // original flags the extra-long interval as corrected
    assert(orig.exists(r => r.ibi.contains(64.0) && r.correction == 1))
    // corrected series inserts a beat at 224: all IBIs back to 32
    assert(corr.drop(1).forall(_.ibi.contains(32.0)))
    assert(corr.length == beats.length + 1)
    assert(corr.map(_.beat).contains(224.0))
  }

  test("false detection (two short IBIs) is merged") {
    // extra beat at 208 inside the 192-224 interval: IBIs ...32,16,16,32...
    val base = (0 to 10).map(_ * 32.0)
    val beats = (base.takeWhile(_ <= 192) :+ 208.0) ++ base.dropWhile(_ <= 192)
    val (_, corr) = Correction.correctInterval(fs)(beats.toArray)
    // merged back: corrected IBIs all 32, extra beat gone
    assert(corr.drop(1).forall(_.ibi.contains(32.0)))
    assert(!corr.map(_.beat).contains(208.0))
  }

  test("FSM state and FIFO survive a long mixed series without drift") {
    // alternating mild jitter (28/36) stays within Correct band of est 32
    val beats = Array.iterate(0.0, 40)(b => b + 32) ++
      Array.tabulate(10)(i => 1280.0 + i * (if (i % 2 == 0) 28 else 36))
    val (orig, corr) = Correction.correctInterval(fs)(beats)
    assert(orig.length == beats.length)
    // last beat always appended
    assert(corr.last.beat == beats.last)
  }
}
