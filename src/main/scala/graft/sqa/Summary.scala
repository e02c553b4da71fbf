package graft.sqa

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A14 summary scalar tables — the dashboard's headline cardiac/EDA summary
  * panels (reference dashboard/utils.py:584-631 `_cardiac_summary_table`,
  * :633-686 `_eda_summary_table`), generalized per subject (the reference
  * renders one recording at a time).
  *
  * Scale shape: input is the already-aggregated per-segment metrics table
  * (tiny relative to the signal), so these are cheap second-level
  * aggregations — one shuffle on `subject`. Double means route through
  * DECIMAL sums so partial-aggregation order can never flip a rounded
  * digit (graft.core.Det rationale).
  */
object Summary {

  private def decMean(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(24, 6))).cast("double") / count(c)

  /** Cardiac summary: average beats over valid segments passing the
    * reference's `diff(N Detected) < 10` stability filter, segment counts
    * with missing/artifact/invalid beats, % invalid of all segments,
    * averaged percentages. One row per subject. */
  def cardiac(metrics: DataFrame): DataFrame = {
    val wSeg = Window.partitionBy("subject").orderBy("segment")
    // valid_ix = np.where(diff(valid.n_detected) < 10): row i is kept when
    // the NEXT valid row's count is less than 10 above it (the last valid
    // row is always dropped — diff has length n-1).
    val avgN = metrics
      .filter(col("invalid").isNull)
      .withColumn("__d", lead(col("n_detected"), 1).over(wSeg) - col("n_detected"))
      .filter(col("__d") < 10)
      .groupBy("subject")
      .agg(bround(sum(col("n_detected")).cast("double") / count(lit(1)), 2)
        .as("avg_n_detected"))
    metrics.groupBy("subject")
      .agg(
        count(when(col("n_missing") > 0, 1)).as("n_seg_missing"),
        count(when(col("n_artifact") > 0, 1)).as("n_seg_artifact"),
        count(when(col("invalid") === 1, 1)).as("n_seg_invalid"),
        bround(count(when(col("invalid") === 1, 1)).cast("double") /
          max(col("segment")) * 100, 2).as("pct_invalid"),
        bround(decMean(col("pct_missing")), 2).as("avg_pct_missing"),
        bround(coalesce(
          decMean(when(col("pct_artifact") > 0, col("pct_artifact"))), lit(0.0)), 2)
          .as("avg_pct_artifact"))
      .join(avgN, Seq("subject"), "left")
      .select("subject", "avg_n_detected", "n_seg_missing", "n_seg_artifact",
        "n_seg_invalid", "pct_invalid", "avg_pct_missing", "avg_pct_artifact")
  }

  /** EDA summary: median tonic SCL (np.median semantics — any NaN segment
    * poisons the median), average SCR peaks per full segment, invalid
    * segment count, averaged quality percentages. One row per subject.
    * `tonic` needs (subject, tonic_scl); `metrics` is Eda.metrics output. */
  def eda(metrics: DataFrame, tonic: DataFrame): DataFrame = {
    val med = tonic.groupBy("subject")
      .agg(
        bround(
          when(sum(isnan(col("tonic_scl")).cast("int")) > 0, lit(Double.NaN))
            .otherwise(percentile(when(!isnan(col("tonic_scl")),
              col("tonic_scl")), lit(0.5))), 2).as("median_tonic_scl"))
    metrics.groupBy("subject")
      .agg(
        bround(sum(col("n_scrs")).cast("double") / count(lit(1)), 2)
          .as("avg_scrs_per_segment"),
        count(when(col("n_invalid") > 0, 1)).as("n_seg_invalid"),
        bround(decMean(col("pct_invalid")), 2).as("avg_pct_invalid"),
        bround(decMean(col("pct_out_of_range")), 2).as("avg_pct_out_of_range"),
        bround(decMean(col("pct_excessive_slope")), 2).as("avg_pct_excessive_slope"),
        bround(decMean(col("pct_temp_out_of_range")), 2).as("avg_pct_temp_out_of_range"))
      .join(med, Seq("subject"), "left")
      .select("subject", "median_tonic_scl", "avg_scrs_per_segment",
        "n_seg_invalid", "avg_pct_invalid", "avg_pct_out_of_range",
        "avg_pct_excessive_slope", "avg_pct_temp_out_of_range")
  }
}
