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

  test("production detector wrappers: split recording == single bucket (two halos)") {
    // The q36/q51/q54 production entry points now route through the
    // bucketed runner with DefaultBucketLen (single bucket at test scale).
    // Forcing a small bucketLen on the same wrappers must reproduce the
    // single-bucket detections — the multi-task path IS the operator.
    // Parity is asserted at TWO halo values (the documented 20 s default
    // and 1.5x it) so the claim is stable in halo, not a single-point fluke.
    val fs = 32
    val n = 4096
    val x = Array.tabulate(n) { i =>
      val ripple = 0.08 * math.sin(2 * math.Pi * 1.1 * i / fs)
      if (i % 37 == 11) 8.0 + ripple else ripple
    }
    val df = frame(x)
    for (halo <- Seq(20 * fs, 30 * fs)) {
      def run(f: (Long, Int) => org.apache.spark.sql.DataFrame): (Seq[Long], Seq[Long]) = {
        val whole = f(1L << 20, halo).collect().map(_.getLong(1)).sorted.toSeq
        val split = f(1024L, halo).collect().map(_.getLong(1)).sorted.toSeq
        (whole, split)
      }
      val (pw, ps) = run((bl, h) => BeatDetectors.panTompkins(df, fs, bucketLen = bl, halo = h))
      assert(pw.nonEmpty && pw == ps, s"panTompkins split != whole (halo=$halo)")
      val (ew, es) = run((bl, h) => BeatDetectors.engzee(df, fs, bucketLen = bl, halo = h))
      assert(ew.nonEmpty && ew == es, s"engzee split != whole (halo=$halo)")
      val (mw, ms) = run((bl, h) => graft.kernels.PpgDetectors.erma(df, fs, bucketLen = bl, halo = h))
      assert(mw.nonEmpty && mw == ms, s"erma split != whole (halo=$halo)")
    }
  }

  test("bucketed Manikandan: split recording == single bucket (two halos)") {
    // K5 runs at fs=128 in production (q52). Its Hilbert envelope is a
    // global FFT, so the contract is convergence, not bitwise state
    // equality: the 1/t Hilbert tail is < 1/halo at the core boundary.
    // 16384 samples / bucketLen 4096 forces 4 splits.
    val fs = 128
    val n = 16384
    val x = Array.tabulate(n) { i =>
      val ripple = 0.06 * math.sin(2 * math.Pi * 0.9 * i / fs)
      if (i % 100 == 37) 6.0 + ripple else ripple
    }
    val df = frame(x)
    for (halo <- Seq(20 * fs, 30 * fs)) {
      val whole = BeatDetectors.manikandan(df, fs, bucketLen = 1L << 20, halo = halo)
        .collect().map(_.getLong(1)).sorted.toSeq
      val split = BeatDetectors.manikandan(df, fs, bucketLen = 4096L, halo = halo)
        .collect().map(_.getLong(1)).sorted.toSeq
      assert(whole.nonEmpty && whole == split, s"manikandan split != whole (halo=$halo)")
    }
  }

  test("bucketed decimation FIR: split values == whole to < 1e-9 (two halos)") {
    // K16's 129-tap zero-phase FIR has a strictly finite lookback
    // (2*taps + padlen = 645), so any halo >= 645 must give EXACT parity.
    // 8192 samples / bucketLen 1024 forces 8 splits.
    val n = 8192
    val x = Array.tabulate(n)(i =>
      math.sin(2 * math.Pi * 0.7 * i / 32) + 0.3 * math.sin(2 * math.Pi * 5.1 * i / 32)
        + 0.05 * math.cos(0.013 * i))
    val df = frame(x)
    val whole = graft.kernels.Decimate.antiAliasStride(df, dsFactor = 4)
      .collect().map(r => r.getAs[Long]("idx") -> r.getAs[Double]("value_f")).toMap
    for (halo <- Seq(660, 1000)) {
      val split = graft.kernels.Decimate.antiAliasStride(df, dsFactor = 4,
        bucketLen = 1024L, halo = halo)
        .collect().map(r => r.getAs[Long]("idx") -> r.getAs[Double]("value_f")).toMap
      assert(split.keySet == whole.keySet)
      val maxDiff = whole.keys.map(i => math.abs(whole(i) - split(i))).max
      assert(maxDiff < 1e-9, s"max divergence $maxDiff (halo=$halo)")
    }
  }

  test("chunked cvxEDA: forced-split solve tracks the whole-recording solve") {
    // K9's chunked path (q59 production): independent FISTA solves per
    // chunk+overlap slice, core-stitched. Chunk boundaries are genuine
    // approximation (each chunk refits its own spline/drift), so the
    // contract is a quantified max-abs delta, not bitwise parity.
    // 6000 samples at fs=4 (25 min) / chunkLen 2048 forces 3 chunks.
    val fs = 4
    val n = 6000
    def bateman(t: Double): Double =
      if (t < 0) 0.0 else math.exp(-t / 2.0) - math.exp(-t / 0.7)
    val y = Array.tabulate(n) { i =>
      val t = i.toDouble / fs
      val scrs = Seq(40.0, 210.0, 480.0, 700.0, 930.0, 1180.0, 1390.0)
        .zipWithIndex.map { case (t0, k) => (0.4 + 0.12 * k) * bateman(t - t0) }.sum
      2.0 + 0.6 * i / n + 0.25 * math.sin(2 * math.Pi * i / n) + scrs
    }
    val df = frame(y)
    val whole = graft.kernels.EdaDecompose.decompose(df, fs, chunkLen = 1L << 20)
      .collect().map(r => r.getLong(1) -> (r.getDouble(2), r.getDouble(4))).toMap
    val chunked = graft.kernels.EdaDecompose.decompose(df, fs,
      chunkLen = 2048L, overlap = graft.kernels.EdaDecompose.defaultOverlap(fs))
      .collect().map(r => r.getLong(1) -> (r.getDouble(2), r.getDouble(4))).toMap
    assert(chunked.keySet == whole.keySet) // every sample exactly once
    val dPhasic = whole.keys.map(i => math.abs(whole(i)._1 - chunked(i)._1)).max
    val dTonic = whole.keys.map(i => math.abs(whole(i)._2 - chunked(i)._2)).max
    info(f"chunked-vs-whole max|dPhasic|=$dPhasic%.2e max|dTonic|=$dTonic%.2e")
    // Measured 6.7e-2 / 6.8e-2 on this trace — the same order as the
    // FISTA<->exact-QP solver delta (3.3e-2, EdaDecomposeSpec): each chunk
    // refits its own spline/linear-drift basis, so mass shifts between
    // tonic and phasic near boundaries by about the solver tolerance.
    // Chunking adds no error CLASS of its own; bound with headroom.
    assert(dPhasic < 0.1, s"phasic chunk delta $dPhasic")
    assert(dTonic < 0.1, s"tonic chunk delta $dTonic")
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
