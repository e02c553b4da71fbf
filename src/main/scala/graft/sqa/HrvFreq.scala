package graft.sqa

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequency-domain HRV via the Lomb-Scargle periodogram (SURVEY A15 —
  * the reference delegates fd-HRV to the flirt package; Lomb-Scargle is
  * the standard estimator for UNEVENLY sampled IBI series, Scargle 1982).
  *
  * Fully relational: beats cross the (small, broadcast) frequency grid,
  * then two grouped aggregations per (subject, freq) — one for the mean
  * and the time-offset τ (tan 2ωτ = Σsin2ωt / Σcos2ωt), one for the
  * centered cos/sin projections. No kernel, two shuffles, scales linearly
  * in beats × |grid|.
  *
  * Rows-only correctness check (libm trig differs across engines in the
  * last ulp); validated by spec against a direct reference implementation.
  */
object HrvFreq {

  /** Normalized Lomb-Scargle periodogram: input (subject, t_s, y), output
    * (subject, freq, power). */
  def lombScargle(beats: DataFrame, freqs: Seq[Double]): DataFrame = {
    val grid = freqs.map(f => lit(f))
    val exploded = beats
      .select(col("subject"), col("t_s"), col("y"),
        explode(array(grid: _*)).as("freq"))
      .withColumn("__w", lit(2.0) * lit(math.Pi) * col("freq"))

    // pass 1: mean, variance, and tau per (subject, freq)
    val p1 = exploded.groupBy("subject", "freq")
      .agg(
        avg(col("y")).as("__ybar"),
        var_samp(col("y")).as("__var"),
        count(lit(1)).as("__n"),
        sum(sin(col("__w") * lit(2.0) * col("t_s"))).as("__s2"),
        sum(cos(col("__w") * lit(2.0) * col("t_s"))).as("__c2"))
      .withColumn("__tau",
        atan2(col("__s2"), col("__c2")) / (lit(2.0) * lit(2.0) * lit(math.Pi) * col("freq")))

    // pass 2: centered projections at the shifted phase
    val joined = exploded.join(
      p1.select("subject", "freq", "__ybar", "__var", "__tau"),
      Seq("subject", "freq"))
      .withColumn("__ph", col("__w") * (col("t_s") - col("__tau")))
      .withColumn("__yc", col("y") - col("__ybar"))
    joined.groupBy("subject", "freq")
      .agg(
        sum(col("__yc") * cos(col("__ph"))).as("__sc"),
        sum(col("__yc") * sin(col("__ph"))).as("__ss"),
        sum(cos(col("__ph")) * cos(col("__ph"))).as("__cc"),
        sum(sin(col("__ph")) * sin(col("__ph"))).as("__ssq"),
        first(col("__var")).as("__var"))
      .withColumn("power",
        (col("__sc") * col("__sc") / col("__cc") +
          col("__ss") * col("__ss") / col("__ssq")) /
          (lit(2.0) * col("__var")))
      .select("subject", "freq", "power")
  }

  /** Standard HRV band powers by rectangle integration of the periodogram:
    * LF 0.04-0.15 Hz, HF 0.15-0.4 Hz. */
  def bandPowers(psd: DataFrame, df: Double): DataFrame =
    psd.groupBy("subject")
      .agg(
        sum(when(col("freq") >= 0.04 && col("freq") < 0.15,
          col("power") * df)).as("lf_power"),
        sum(when(col("freq") >= 0.15 && col("freq") < 0.4,
          col("power") * df)).as("hf_power"))
      .withColumn("lf_hf_ratio", col("lf_power") / col("hf_power"))
}
