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

  test("production detector wrappers: split recording == single bucket") {
    // The q36/q51/q54 production entry points now route through the
    // bucketed runner with DefaultBucketLen (single bucket at test scale).
    // Forcing a small bucketLen on the same wrappers must reproduce the
    // single-bucket detections — the multi-task path IS the operator.
    val fs = 32
    val n = 4096
    val x = Array.tabulate(n) { i =>
      val ripple = 0.08 * math.sin(2 * math.Pi * 1.1 * i / fs)
      if (i % 37 == 11) 8.0 + ripple else ripple
    }
    val df = frame(x)
    def run(f: (Long, Int) => org.apache.spark.sql.DataFrame): (Seq[Long], Seq[Long]) = {
      val whole = f(1L << 20, 20 * fs).collect().map(_.getLong(1)).sorted.toSeq
      val split = f(1024L, 20 * fs).collect().map(_.getLong(1)).sorted.toSeq
      (whole, split)
    }
    val (pw, ps) = run((bl, h) => BeatDetectors.panTompkins(df, fs, bucketLen = bl, halo = h))
    assert(pw.nonEmpty && pw == ps, "panTompkins split != whole")
    val (ew, es) = run((bl, h) => BeatDetectors.engzee(df, fs, bucketLen = bl, halo = h))
    assert(ew == es, "engzee split != whole")
    val (mw, ms) = run((bl, h) => graft.kernels.PpgDetectors.erma(df, fs, bucketLen = bl, halo = h))
    assert(mw.nonEmpty && mw == ms, "erma split != whole")
  }

  test("production defaults satisfy the runner contract") {
    for (fs <- Seq(4, 32, 64, 128)) {
      val h = KernelRunner.defaultHalo(fs)
      assert(h >= 0 && h < KernelRunner.DefaultBucketLen)
      assert(h >= 3 * 5 * 3) // >= 3x padlen of the order-2 IIR designs
      assert(h >= (2.5 * fs).toInt) // >= the 2.5 s moving-average window
    }
  }
}
