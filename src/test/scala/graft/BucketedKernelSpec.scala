package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.KernelRunner
import graft.kernels.{BeatDetectors, Iir}

/** Proves the bucketed kernel runner (range-buckets + halo rows — the
  * 100 TB posture) reproduces whole-recording kernel output on a split
  * recording: exactly for a zero-phase IIR filter once the halo covers the
  * impulse-response decay, and detection-for-detection for the
  * Pan-Tompkins FSM once the halo covers its state convergence length. */
class BucketedKernelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  private def frame(values: Array[Double]) = {
    import spark.implicits._
    values.zipWithIndex.map { case (v, i) => (7L, i.toLong, v) }
      .toSeq.toDF("subject", "idx", "value")
  }

  test("bucketed filtfilt == whole-recording filtfilt (halo past IIR decay)") {
    val n = 2048
    val x = Array.tabulate(n)(i =>
      math.sin(2 * math.Pi * 1.3 * i / 32) + 0.4 * math.sin(2 * math.Pi * 9.7 * i / 32)
        + 0.1 * math.cos(0.01 * i))
    val (b, a) = Iir.butter(2, Seq(0.5 / 16.0, 15.0 / 16.0), "bandpass")
    val whole = KernelRunner.transformValues(frame(x), "value", "y")(
      v => Iir.filtfilt(b, a, v))
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val bucketed = KernelRunner.transformValuesBucketed(
      frame(x), "value", "y", bucketLen = 512, halo = 300)(
      v => Iir.filtfilt(b, a, v))
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(bucketed.keySet == whole.keySet) // every sample exactly once
    val maxDiff = whole.keys.map(i => math.abs(whole(i) - bucketed(i))).max
    assert(maxDiff < 1e-9, s"max divergence $maxDiff")
  }

  test("bucketed Pan-Tompkins == whole-recording detections (halo past FSM convergence)") {
    // clean pulse train at ~48 bpm equivalent for fs=32: spikes every 40
    // samples over a small ripple — adaptive thresholds converge quickly
    val n = 4096
    val x = Array.tabulate(n) { i =>
      val ripple = 0.05 * math.sin(2 * math.Pi * 1.1 * i / 32)
      if (i % 40 == 20) 10.0 + ripple else ripple
    }
    val fs = 32
    val whole = BeatDetectors.panTompkins(frame(x), fs)
      .collect().map(_.getLong(1)).sorted
    val bucketed = KernelRunner.detectIndicesBucketed(
      frame(x), "value", bucketLen = 1024, halo = 640) { v =>
      val (b, a) = Iir.butter(2, Seq(0.5 / 16.0, 15.0 / 16.0), "bandpass")
      BeatDetectors.panTompkinsKernel(fs)(Iir.filtfilt(b, a, v))
    }.collect().map(_.getLong(1)).sorted
    assert(bucketed.toSeq == whole.toSeq)
  }
}
