package graft.sqa

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.SignalFrame

/** Electrodermal-activity quality assessment per Kleckner et al. (2017)
  * (reference pipeline/SQA.py:1830-2290): range / slope / temperature rule
  * masks, ±spread dilation of invalid points, and per-segment validity
  * metrics. Rules 2 and 4 are evaluated within segment slices exactly like
  * the reference's `_edaqa` (first slope of a slice is 0; dilation does not
  * cross slice boundaries); the trailing partial segment is dropped
  * (`n_segments = len // seg_len`).
  */
object Eda {

  /** Kleckner rule parameters (reference defaults: SQA.py:1879-1884). */
  case class Params(
      edaMin: Double = 0.2,
      edaMax: Double = 40,
      maxSlope: Double = 5,
      tempMin: Double = 20,
      tempMax: Double = 40,
      spreadDurS: Double = 2.5)

  /** Whole-signal per-sample quality table (reference `get_eda_quality`,
    * SQA.py:2010-2038): rule masks 1-3 computed over the full recording
    * (no dilation). Requires columns subject, idx, value and optionally
    * `tempCol`. */
  def qualityTable(signal: DataFrame, fs: Int, p: Params,
      tempCol: Option[String] = None): DataFrame = {
    val w = Window.partitionBy("subject").orderBy("idx")
    val slope = coalesce((col("value") - lag(col("value"), 1).over(w)) * fs, lit(0.0))
    val base = signal
      .withColumn("out_of_range",
        when(col("value") < p.edaMin || col("value") > p.edaMax, 1))
      .withColumn("excessive_slope", when(abs(slope) > p.maxSlope, 1))
    tempCol match {
      case Some(t) => base.withColumn("temp_out_of_range",
        when(col(t) < p.tempMin || col(t) > p.tempMax, 1))
      case None => base
    }
  }

  /** Per-segment metrics (reference `compute_metrics` segmented path,
    * SQA.py:2134-2160): rule masks within each FULL segment slice, rule-4
    * dilation of invalid points by ±spread samples inside the slice, counts
    * and HALF_EVEN-rounded percentages; optional SCR counts from a
    * `scrCol` flag column. */
  def metrics(signal: DataFrame, fs: Int, segSize: Int, p: Params,
      tempCol: Option[String] = None, scrCol: Option[String] = None): DataFrame = {
    val segRows = fs.toLong * segSize
    val spreadLen = (p.spreadDurS * fs).toInt
    val seg = signal.withColumn("segment", SignalFrame.segment(col("idx"), fs, segSize))
    val wSeg = Window.partitionBy("subject", "segment").orderBy("idx")

    val slope = coalesce((col("value") - lag(col("value"), 1).over(wSeg)) * fs, lit(0.0))
    val oor = col("value") < p.edaMin || col("value") > p.edaMax
    val slp = abs(slope) > p.maxSlope
    val tmp = tempCol.map(t => col(t) < p.tempMin || col(t) > p.tempMax)
    val invalid = tmp.foldLeft(oor || slp)(_ || _)

    val flagged = seg
      .withColumn("__oor", oor.cast("int"))
      .withColumn("__slp", slp.cast("int"))
      .withColumn("__tmp", tmp.map(_.cast("int")).getOrElse(lit(null).cast("int")))
      .withColumn("__inv", invalid.cast("int"))
      .withColumn("__spread",
        max(col("__inv")).over(wSeg.rowsBetween(-spreadLen, spreadLen)))

    val agged = flagged.groupBy("subject", "segment")
      .agg(
        count(lit(1)).as("__len"),
        sum(col("__spread")).as("__n_spread_inv"),
        sum(col("__oor")).as("n_out_of_range"),
        sum(col("__slp")).as("n_excessive_slope"),
        sum(col("__tmp")).as("n_temp_out_of_range"),
        scrCol.map(c => count(col(c)).as("n_scrs")).getOrElse(lit(null).as("n_scrs")))
      .filter(col("__len") === segRows) // full segments only
    agged
      .withColumn("n_invalid", col("__n_spread_inv"))
      .withColumn("n_valid", col("__len") - col("__n_spread_inv"))
      .withColumn("pct_valid", bround(col("n_valid").cast("double") / col("__len") * 100, 2))
      .withColumn("pct_invalid", bround(col("n_invalid").cast("double") / col("__len") * 100, 2))
      .withColumn("pct_out_of_range",
        bround(col("n_out_of_range").cast("double") / col("__len") * 100, 2))
      .withColumn("pct_excessive_slope",
        bround(col("n_excessive_slope").cast("double") / col("__len") * 100, 2))
      .withColumn("pct_temp_out_of_range",
        bround(col("n_temp_out_of_range").cast("double") / col("__len") * 100, 2))
      .select("subject", "segment", "n_valid", "pct_valid", "n_invalid", "pct_invalid",
        "n_out_of_range", "pct_out_of_range", "n_excessive_slope", "pct_excessive_slope",
        "n_temp_out_of_range", "pct_temp_out_of_range", "n_scrs")
  }

  /** A16: statistical EDA features over sliding windows of the phasic/tonic
    * decomposition (reference `compute_features`, EDA.py:451-482, which
    * delegates to the external flirt package; the per-window feature set
    * here — mean, sample std, min, max of each component — is the engine's
    * own honest definition, following the A15 HRV pattern).
    *
    * Input: (subject, idx, phasic, tonic) — in the full pipeline the K9
    * decomposition (kernels/EdaDecompose). Windows start every `stepS`
    * seconds, `windowS` seconds wide, truncated at the recording end; the
    * bounded explode (≤ windowS/stepS windows per sample) + one grouped
    * aggregation is the same scale shape as the rolling SQA metrics. All
    * means/stds route through DECIMAL sums (order-independent). */
  def features(decomposed: DataFrame, fs: Int, windowS: Int = 180,
      stepS: Int = 60): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val step = fs.toLong * stepS
    val win = fs.toLong * windowS
    val wlo = when(col("idx") < win, lit(0L))
      .otherwise(((col("idx") - win) / step).cast("long") + 1)
    val whi = (col("idx") / step).cast("long")
    val ex = decomposed.withColumn("w", explode(sequence(wlo, whi)))
    def stats(c: String): Seq[Column] = {
      val s1 = sum(col(c).cast(DecimalType(30, 8))).cast("double")
      val s2 = sum((col(c) * col(c)).cast(DecimalType(30, 8))).cast("double")
      val n = count(col(c))
      Seq(
        bround(s1 / n, 6).as(s"${c}_mean"),
        bround(when(n > 1,
          sqrt((s2 - s1 * s1 / n) / (n - 1).cast("double"))), 6).as(s"${c}_std"),
        min(col(c)).as(s"${c}_min"),
        max(col(c)).as(s"${c}_max"))
    }
    val aggs = count(lit(1)).as("n") +: (stats("phasic") ++ stats("tonic"))
    ex.groupBy("subject", "w")
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("moving_window", col("w") + 1)
      .select("subject", "moving_window", "n",
        "phasic_mean", "phasic_std", "phasic_min", "phasic_max",
        "tonic_mean", "tonic_std", "tonic_min", "tonic_max")
  }
}
