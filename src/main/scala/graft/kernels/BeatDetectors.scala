package graft.kernels

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.KernelRunner

/** Beat detectors (SURVEY K4-K8).
  *
  *  - Nabian 2018 (K6): pure window expression — no kernel needed.
  *  - Pan-Tompkins 1985 (K7): sequential FSM kernel via KernelRunner.
  *  Others (Engzee, Manikandan, PPG ERMA/van Gent) follow the same two
  *  shapes and land in later rounds.
  */
object BeatDetectors {

  /** Nabian et al. (2018) R-peak detection (reference ECG.py:515-554):
    * sample i is a peak iff the first argmax of window [i-w, i+w) sits at
    * position w+1 (the reference's exact off-by-one comparison,
    * `i == i - window_size - 1 + rpeak`), for i in [w+1, len-w-1].
    * w = int(0.4 * fs).
    *
    * Pure window form: one frame max + first-argmax via an ordered struct
    * max (ties resolve to the earliest index, matching np.argmax).
    * Output: signal rows + `nabian_beat` flag. */
  def nabian(signal: DataFrame, fs: Int): DataFrame = {
    val w = (0.4 * fs).toInt
    val frame = Window.partitionBy("subject").orderBy("idx").rowsBetween(-w, w - 1)
    val wAll = Window.partitionBy("subject")
    val maxStruct = max(struct(col("value").as("v"), (-col("idx")).as("ni"))).over(frame)
    signal
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__first_max_idx", -maxStruct.getField("ni"))
      .withColumn("nabian_beat",
        when(col("idx").between(w + 1, col("__n") - w - 1) &&
          col("__first_max_idx") === col("idx") + 1, 1))
      .drop("__n", "__first_max_idx")
  }

  /** Pan & Tompkins (1985) QRS detection (reference ECG.py:556-661) as a
    * per-recording kernel: squared derivative → 150 ms integration MA with
    * the reference's exact head handling → adaptive SPKI/NPKI thresholds,
    * 300 ms refractory, missed-beat re-search over the last 8 IBIs.
    * Returns positions (0-based) into the recording array. */
  def panTompkinsKernel(fs: Int)(signal: Array[Double]): Array[Int] = {
    val n = signal.length
    if (n < 2) return Array.empty
    // squared derivative
    val squared = new Array[Double](n - 1)
    var i = 0
    while (i < n - 1) { val d = signal(i + 1) - signal(i); squared(i) = d * d; i += 1 }

    // 150 ms moving average: uniform_filter1d(squared, w, origin=(w-1)//2)
    // is a TRAILING window [i-w+1, i] (== py-ecg-detectors MWA_cumulative);
    // the head overwrite below exists precisely because that is where the
    // trailing window is partial, so left indices just clamp to 0.
    val w = (0.15 * fs).toInt
    val mwa = new Array[Double](squared.length)
    var runSum = 0.0
    i = 0
    while (i < squared.length) {
      runSum += squared(i)
      if (i >= w) runSum -= squared(i - w)
      mwa(i) = runSum / w
      i += 1
    }
    // reference head quirk: first (w-1) values overwritten with the running
    // mean of the RAW signal (ECG.py:592-594), then first 0.2 s zeroed
    val headSize = math.min(w - 1, squared.length)
    var cum = 0.0
    i = 0
    while (i < headSize) { cum += signal(i); mwa(i) = cum / (i + 1); i += 1 }
    i = 0
    val zeroN = math.min((0.2 * fs).toInt, mwa.length)
    while (i < zeroN) { mwa(i) = 0.0; i += 1 }

    // strict local maxima (find_peaks plateau_size=(1,1))
    val peaks = collection.mutable.ArrayBuffer.empty[Int]
    i = 1
    while (i < mwa.length - 1) {
      if (mwa(i) > mwa(i - 1) && mwa(i) > mwa(i + 1)) peaks += i
      i += 1
    }

    val minPeakDist = (0.3 * fs).toInt
    val minMissedDist = (0.25 * fs).toInt
    val beats = collection.mutable.ArrayBuffer.empty[Int]
    var spki = 0.0
    var npki = 0.0
    var lastPeak = 0
    var lastIndex = -1
    var pi = 0
    while (pi < peaks.length) {
      val peak = peaks(pi)
      val pv = mwa(peak)
      val thr1 = npki + 0.25 * (spki - npki)
      if (pv > thr1 && peak > lastPeak + minPeakDist) {
        beats += peak
        if (beats.length > 9) {
          val ibiAvg = (beats(beats.length - 2) - beats(beats.length - 10)) / 8
          val ibiMissed = (1.66 * ibiAvg).toInt
          if (peak - lastPeak > ibiMissed) {
            val thr2 = 0.5 * thr1
            val missed = peaks.slice(lastIndex + 1, pi)
              .filter(p => p > lastPeak + minMissedDist && p < peak - minMissedDist)
              .filter(p => mwa(p) > thr2)
            if (missed.nonEmpty) {
              val best = missed.maxBy(mwa(_))
              beats(beats.length - 1) = best
              beats += peak
            }
          }
        }
        lastPeak = peak
        lastIndex = pi
        spki = 0.125 * pv + 0.875 * spki
      } else {
        npki = 0.125 * pv + 0.875 * npki
      }
      pi += 1
    }
    // order-preserving dedupe (reference _remove_dupes)
    val seen = collection.mutable.LinkedHashSet.empty[Int]
    beats.foreach(seen += _)
    seen.toArray
  }

  /** Pan-Tompkins over a signal frame with the reference's Butterworth
    * 0.5-15 Hz order-2 bandpass preprocessing. */
  def panTompkins(signal: DataFrame, fs: Int, preprocessed: Boolean = false): DataFrame = {
    val (b, a) = Iir.butter(2, Seq(0.5 / (0.5 * fs), 15.0 / (0.5 * fs)), "bandpass")
    KernelRunner.detectIndices(signal, "value") { x =>
      val pre = if (preprocessed) x else Iir.filtfilt(b, a, x)
      panTompkinsKernel(fs)(pre)
    }
  }
}
