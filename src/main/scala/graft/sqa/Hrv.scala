package graft.sqa

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.SignalFrame

/** Time-domain + nonlinear HRV features over sliding/fixed windows
  * (SURVEY A15; the reference delegates to the `flirt` package,
  * physioview.py:1078-1084 — feature definitions follow the standard
  * published HRV formulas flirt implements).
  *
  * Determinism: every moment (mean/variance/rmssd) is computed from exact
  * DECIMAL sums of the IBI values and their squares, so results are
  * reduction-order independent and hash-match the oracle. With fs a power
  * of two, IBIs and their squares are exactly representable.
  */
object Hrv {

  /** Per-(subject, window) time-domain features from a beats frame with an
    * `ibi` column. Window = fixed bucket of `windowS` seconds on the
    * sample clock. */
  def timeDomain(beats: DataFrame, fs: Int, windowS: Int): DataFrame = {
    val wSub = Window.partitionBy("subject").orderBy("idx")
    val windowRows = fs.toLong * windowS
    val withDiff = beats
      .filter(col("ibi").isNotNull)
      .withColumn("__sd", col("ibi") - lag(col("ibi"), 1).over(wSub))
      .withColumn("win", (col("idx") / windowRows).cast("long") + 1)
    def dsum(c: Column): Column = sum(c.cast(DecimalType(30, 6))).cast("double")
    withDiff.groupBy("subject", "win")
      .agg(
        count(col("ibi")).as("n_ibi"),
        dsum(col("ibi")).as("__sum"),
        dsum(col("ibi") * col("ibi")).as("__sumsq"),
        dsum(col("__sd") * col("__sd")).as("__sdsq"),
        count(col("__sd")).as("__nsd"),
        sum(when(abs(col("__sd")) > 50, 1).otherwise(0)).as("__nn50"),
        sum(when(abs(col("__sd")) > 20, 1).otherwise(0)).as("__nn20"),
        min(col("ibi")).as("min_nni"),
        max(col("ibi")).as("max_nni"),
        percentile(col("ibi"), lit(0.5)).as("median_nni"))
      .withColumn("mean_nni", col("__sum") / col("n_ibi"))
      .withColumn("range_nni", col("max_nni") - col("min_nni"))
      .withColumn("sdnn", when(col("n_ibi") > 1, sqrt(
        (col("__sumsq") - col("__sum") * col("__sum") / col("n_ibi")) / (col("n_ibi") - 1))))
      .withColumn("rmssd", when(col("__nsd") > 0, sqrt(col("__sdsq") / col("__nsd"))))
      .withColumn("pnn50", when(col("__nsd") > 0,
        col("__nn50").cast("double") / col("__nsd") * 100))
      .withColumn("pnn20", when(col("__nsd") > 0,
        col("__nn20").cast("double") / col("__nsd") * 100))
      .withColumn("mean_hr", lit(60000.0) / (col("__sum") / col("n_ibi")))
      .withColumn("max_hr", lit(60000.0) / col("min_nni"))
      .withColumn("min_hr", lit(60000.0) / col("max_nni"))
      .select("subject", "win", "n_ibi", "mean_nni", "median_nni", "range_nni",
        "min_nni", "max_nni", "sdnn", "rmssd", "pnn50", "pnn20",
        "mean_hr", "min_hr", "max_hr")
  }

  /** Statistical-moment features (flirt's 'stat' domain): skewness and
    * excess kurtosis of the per-window IBI distribution from exact DECIMAL
    * power sums — explicit population-moment formulas rather than engine
    * built-ins (Spark's and DuckDB's skewness/kurtosis apply different
    * bias corrections). IBI^4 at 2000 ms is ~1.6e13, inside DECIMAL(38,6).
    */
  def statDomain(beats: DataFrame, fs: Int, windowS: Int): DataFrame = {
    val windowRows = fs.toLong * windowS
    def dsum(c: Column): Column = sum(c.cast(DecimalType(38, 6))).cast("double")
    val ibi = col("ibi")
    beats
      .filter(ibi.isNotNull)
      .withColumn("win", (col("idx") / windowRows).cast("long") + 1)
      .groupBy("subject", "win")
      .agg(
        count(ibi).as("n_ibi"),
        dsum(ibi).as("__s1"),
        dsum(ibi * ibi).as("__s2"),
        dsum(ibi * ibi * ibi).as("__s3"),
        dsum(ibi * ibi * ibi * ibi).as("__s4"))
      .filter(col("n_ibi") > 2)
      .withColumn("__m", col("__s1") / col("n_ibi"))
      .withColumn("__m2", col("__s2") / col("n_ibi") - col("__m") * col("__m"))
      .withColumn("__m3",
        col("__s3") / col("n_ibi") - lit(3.0) * col("__m") * col("__s2") / col("n_ibi")
          + lit(2.0) * col("__m") * col("__m") * col("__m"))
      .withColumn("__m4",
        col("__s4") / col("n_ibi") - lit(4.0) * col("__m") * col("__s3") / col("n_ibi")
          + lit(6.0) * col("__m") * col("__m") * col("__s2") / col("n_ibi")
          - lit(3.0) * col("__m") * col("__m") * col("__m") * col("__m"))
      // m2^1.5 as m2*sqrt(m2): sqrt and * are IEEE-exact, pow is not
      .withColumn("skewness", when(col("__m2") > 0,
        bround(col("__m3") / (col("__m2") * sqrt(col("__m2"))), 6)))
      .withColumn("kurtosis", when(col("__m2") > 0,
        bround(col("__m4") / (col("__m2") * col("__m2")) - 3.0, 6)))
      .withColumn("mean_nni", col("__m"))
      .select("subject", "win", "n_ibi", "mean_nni", "skewness", "kurtosis")
  }

  /** Poincaré nonlinear features SD1/SD2/CSI/CVI from successive-difference
    * and total variance (standard identities: SD1² = var(diff)/2,
    * SD2² = 2·var(nni) − SD1²). */
  def nonlinear(beats: DataFrame, fs: Int, windowS: Int): DataFrame = {
    val wSub = Window.partitionBy("subject").orderBy("idx")
    val windowRows = fs.toLong * windowS
    def dsum(c: Column): Column = sum(c.cast(DecimalType(30, 6))).cast("double")
    val withDiff = beats
      .filter(col("ibi").isNotNull)
      .withColumn("__sd", col("ibi") - lag(col("ibi"), 1).over(wSub))
      .withColumn("win", (col("idx") / windowRows).cast("long") + 1)
    withDiff.groupBy("subject", "win")
      .agg(
        count(col("ibi")).as("n_ibi"),
        dsum(col("ibi")).as("__sum"),
        dsum(col("ibi") * col("ibi")).as("__sumsq"),
        dsum(col("__sd") * col("__sd")).as("__sdsq"),
        count(col("__sd")).as("__nsd"))
      .filter(col("n_ibi") > 2 && col("__nsd") > 1)
      .withColumn("__var_nni",
        (col("__sumsq") - col("__sum") * col("__sum") / col("n_ibi")) / (col("n_ibi") - 1))
      .withColumn("__var_sd", col("__sdsq") / col("__nsd"))
      .withColumn("sd1", sqrt(col("__var_sd") / 2))
      .withColumn("sd2_sq", lit(2.0) * col("__var_nni") - col("__var_sd") / 2)
      .withColumn("sd2", when(col("sd2_sq") > 0, sqrt(col("sd2_sq"))))
      .withColumn("csi", col("sd2") / col("sd1"))
      // log10 is not correctly-rounded across libm implementations — pin
      // the last digit for cross-engine hash parity
      .withColumn("cvi", round(log10(col("sd1") * col("sd2") * 16), 6))
      .select("subject", "win", "n_ibi", "sd1", "sd2", "csi", "cvi")
  }

  /** Sample entropy of the per-window IBI series (SURVEY A15 names it;
    * flirt's nl domain computes it — physioview.py:1078-1084). Standard
    * Richman-Moorman SampEn with flirt/nolds defaults: template length
    * m=2, tolerance r = 0.2 x population std of the window, Chebyshev
    * distance, pairs i<j only; sampen = -ln(A/B) where B counts length-2
    * template matches and A length-3.
    *
    * Fully relational form — templates via lead() and a self-join confined
    * to one (subject, win) group. The per-window quadratic is BOUNDED by
    * the window length (a fixed beat budget per 60 s), so the shape is
    * scale-safe: 100 TB means more windows, never bigger joins, and the
    * window/join/agg all share the (subject, win) exchange. Tolerance from
    * exact decimal sums -> both engines compare against bit-identical r. */
  def sampleEntropy(beats: DataFrame, fs: Int, windowS: Int): DataFrame = {
    val windowRows = fs.toLong * windowS
    def dsum(c: Column): Column = sum(c.cast(DecimalType(30, 6))).cast("double")
    val wWin = Window.partitionBy("subject", "win").orderBy("idx")
    val t = beats.filter(col("ibi").isNotNull)
      .withColumn("win", (col("idx") / windowRows).cast("long") + 1)
      .withColumn("k", row_number().over(wWin))
      .withColumn("x1", lead(col("ibi"), 1).over(wWin))
      .withColumn("x2", lead(col("ibi"), 2).over(wWin))
      .select(col("subject"), col("win"), col("k"),
        col("ibi").as("x0"), col("x1"), col("x2"))
    val tol = t.groupBy("subject", "win")
      .agg(count(lit(1)).as("n_ibi"),
        dsum(col("x0")).as("__s1"), dsum(col("x0") * col("x0")).as("__s2"))
      .filter(col("n_ibi") > 3)
      .withColumn("r", lit(0.2) *
        sqrt((col("__s2") - col("__s1") * col("__s1") / col("n_ibi")) / col("n_ibi")))
      .select("subject", "win", "n_ibi", "r")
    val lhs = t.select(col("subject"), col("win"), col("k").as("ka"),
      col("x0").as("a0"), col("x1").as("a1"), col("x2").as("a2"))
    val rhs = t.select(col("subject"), col("win"), col("k").as("kb"),
      col("x0").as("b0"), col("x1").as("b1"), col("x2").as("b2"))
    lhs.join(rhs, Seq("subject", "win")).filter(col("kb") > col("ka"))
      .join(tol, Seq("subject", "win"))
      .groupBy("subject", "win", "n_ibi")
      .agg(
        sum(when(col("a1").isNotNull && col("b1").isNotNull &&
          greatest(abs(col("a0") - col("b0")), abs(col("a1") - col("b1"))) <= col("r"),
          1L).otherwise(0L)).as("b_count"),
        sum(when(col("a2").isNotNull && col("b2").isNotNull &&
          greatest(abs(col("a0") - col("b0")), abs(col("a1") - col("b1")),
            abs(col("a2") - col("b2"))) <= col("r"), 1L).otherwise(0L)).as("a_count"))
      .withColumn("sampen", when(col("a_count") > 0 && col("b_count") > 0,
        bround(-log(col("a_count").cast("double") / col("b_count")), 6)))
      .select("subject", "win", "n_ibi", "b_count", "a_count", "sampen")
  }
}
