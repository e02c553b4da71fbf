package graft.sqa

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCR peak detection (SURVEY K10; Nabian 2018 approach as implemented in
  * reference EDA.py `detect_scr_peaks`, EDA.py:219-309).
  *
  * Fully relational: the Bartlett-smoothed derivative is a fixed-offset
  * convolution expression, onset/offset pairing is a rank equi-join, the
  * per-window argmax is a bounded range join, and the reference's
  * sequential relative-amplitude filter reduces EXACTLY to a prefix-max
  * predicate: a rejected candidate's amplitude is < 0.1 x the accepted
  * max, so it can never raise the max — the running max over accepted
  * candidates equals the running max over all candidates (first candidate
  * always accepted when no absolute threshold is set).
  */
object Scr {

  /** np.bartlett(m) normalized to unit sum. */
  def bartlettKernel(m: Int): Array[Double] = {
    val w = Array.tabulate(m) { k =>
      if (k <= (m - 1) / 2.0) 2.0 * k / (m - 1) else 2.0 - 2.0 * k / (m - 1)
    }
    val s = w.sum
    w.map(_ / s)
  }

  /** Detected SCR peaks: (subject, peak_idx, onset, offset, amp).
    * Mirrors detect_scr_peaks with min_peak_amp = None. */
  def peaks(phasic: DataFrame, smoothSize: Int = 20,
      minAmpThresh: Double = 0.1): DataFrame = {
    val w = Window.partitionBy("subject").orderBy("idx")
    val kern = bartlettKernel(smoothSize)
    val off = (smoothSize - 1) / 2 // np.convolve 'same' centering

    val withDiff = phasic.withColumn("__d",
      coalesce(col("value") - lag(col("value"), 1).over(w), lit(0.0)))
    // smoothed[i] = sum_j kern(j) * d[i + off - j], zero-padded edges;
    // summed in j order so the oracle reproduces the exact double.
    def tap(j: Int): Column = {
      val o = off - j
      val v =
        if (o > 0) lead(col("__d"), o).over(w)
        else if (o < 0) lag(col("__d"), -o).over(w)
        else col("__d")
      lit(kern(j)) * coalesce(v, lit(0.0))
    }
    val smoothed = (0 until smoothSize).map(tap).reduce(_ + _)
    val s = withDiff.withColumn("__s", smoothed)
      .withColumn("__sn", lead(col("__s"), 1).over(w))

    val pos = s.filter(col("__s") < 0 && col("__sn") >= 0)
      .select(col("subject"), col("idx").as("onset"), col("value").as("onset_v"))
      .withColumn("__r", row_number().over(
        Window.partitionBy("subject").orderBy("onset")))
    val neg = s.filter(col("__s") > 0 && col("__sn") <= 0)
      .select(col("subject"), col("idx").as("offset"))
      .withColumn("__rn0", row_number().over(
        Window.partitionBy("subject").orderBy("offset")))

    // drop the first offset when it precedes the first onset
    val firsts = pos.groupBy("subject").agg(min("onset").as("__fp"))
      .join(neg.groupBy("subject").agg(min("offset").as("__fn")), Seq("subject"))
      .withColumn("__shift", when(col("__fn") < col("__fp"), 1).otherwise(0))
      .select("subject", "__shift")
    val negAdj = neg.join(broadcast(firsts), Seq("subject"))
      .withColumn("__r", col("__rn0") - col("__shift"))
      .filter(col("__r") >= 1)
      .select("subject", "offset", "__r")

    val pairs = pos.join(negAdj, Seq("subject", "__r"))
      .select("subject", "onset", "offset", "onset_v")

    // argmax of the phasic signal over [onset, offset); first max wins
    val inWin = pairs.join(phasic.select(col("subject"), col("idx"), col("value")),
      Seq("subject"))
      .filter(col("idx") >= col("onset") && col("idx") < col("offset"))
    val wPick = Window.partitionBy("subject", "onset")
      .orderBy(col("value").desc, col("idx"))
    val cands = inWin.withColumn("__pk", row_number().over(wPick))
      .filter(col("__pk") === 1)
      .select(col("subject"), col("onset"), col("offset"),
        col("idx").as("peak_idx"), (col("value") - col("onset_v")).as("amp"))

    // sequential relative-amplitude filter == prefix-max predicate
    val wSeq = Window.partitionBy("subject").orderBy("onset")
      .rowsBetween(Window.unboundedPreceding, -1)
    cands.withColumn("__pm", max(col("amp")).over(wSeq))
      .filter(col("__pm").isNull || col("amp") >= lit(minAmpThresh) * col("__pm"))
      .select("subject", "peak_idx", "onset", "offset", "amp")
  }
}
