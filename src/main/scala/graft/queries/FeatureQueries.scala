package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.SignalFrame
import graft.kernels.PpgDetectors
import graft.sqa.{Cardio, Eda, Hrv, HrvFreq, Scr}

/** EDA quality, HRV features, and ACC AUC query suite — all oracle-checked.
  * The events-derived signal doubles as pseudo-EDA (value in µS) with a
  * deterministic synthetic temperature channel 28 + value mod 14. */
object FeatureQueries {

  val FS = 4
  val SEG = 10
  private val P = Eda.Params(edaMin = 5, edaMax = 150, maxSlope = 400,
    tempMin = 30, tempMax = 40, spreadDurS = 2.0)

  private def edaSignal(s: SparkSession, dir: String): DataFrame =
    SignalFrame.fromEvents(s, dir)
      .withColumn("temp", lit(28.0) + col("value") % 14.0)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q37_eda_quality" -> ((s, dir) =>
      Eda.qualityTable(edaSignal(s, dir), FS, P, tempCol = Some("temp"))
        .select("subject", "idx", "value", "out_of_range", "excessive_slope",
          "temp_out_of_range")),

    "q38_eda_metrics" -> ((s, dir) =>
      Eda.metrics(edaSignal(s, dir), FS, SEG, P,
        tempCol = Some("temp"), scrCol = Some("artifact"))),

    // A16 EDA features over sliding windows (EDA.py:451-482): per-window
    // mean/std/min/max of phasic/tonic, 30 s windows stepped by 10 s. The
    // feature math is oracle-checked over a SQL-expressible decomposition
    // (centered decimal-mean tonic, residual phasic); in the full pipeline
    // the input is the K9 decomposition (q59 covers that kernel).
    "q66_eda_features" -> ((s, dir) => {
      val wf = Window.partitionBy("subject").orderBy("idx").rowsBetween(-8, 8)
      val dec = SignalFrame.fromEvents(s, dir)
        .withColumn("tonic", bround(
          sum(col("value").cast(DecimalType(24, 6))).over(wf).cast("double") /
            count(lit(1)).over(wf), 6))
        .withColumn("phasic", bround(col("value") - col("tonic"), 6))
      Eda.features(dec, FS, windowS = 30, stepS = 10)
    }),

    // A14 EDA summary panel (dashboard/utils.py:633-686): median tonic SCL
    // (np.median NaN-poisoning semantics), avg SCRs per full segment,
    // invalid-segment count, averaged quality percentages.
    "q65_eda_summary" -> ((s, dir) =>
      graft.sqa.Summary.eda(
        Eda.metrics(edaSignal(s, dir), FS, SEG, P,
          tempCol = Some("temp"), scrCol = Some("artifact")),
        Scr.tonicScl(SignalFrame.fromEvents(s, dir), FS, SEG)
          .withColumn("tonic_scl", bround(col("tonic_scl"), 6)))),

    "q39_hrv_td" -> ((s, dir) =>
      Hrv.timeDomain(
        Cardio.ibis(Cardio.beatRows(SignalFrame.fromEvents(s, dir)), FS),
        FS, windowS = 60)),

    "q40_hrv_nl" -> ((s, dir) =>
      Hrv.nonlinear(
        Cardio.ibis(Cardio.beatRows(SignalFrame.fromEvents(s, dir)), FS),
        FS, windowS = 60)),

    // A15 nl: per-window sample entropy (m=2, r=0.2·std, flirt defaults).
    "q91_sampen" -> ((s, dir) =>
      Hrv.sampleEntropy(
        Cardio.ibis(Cardio.beatRows(SignalFrame.fromEvents(s, dir)), FS),
        FS, windowS = 60)),

    // A15 stat domain: skewness/excess kurtosis of the per-window IBI
    // distribution from exact decimal power sums.
    "q68_hrv_stat" -> ((s, dir) =>
      Hrv.statDomain(
        Cardio.ibis(Cardio.beatRows(SignalFrame.fromEvents(s, dir)), FS),
        FS, windowS = 60)),

    "q41_acc_auc" -> ((s, dir) => {
      val w = Window.partitionBy("subject").orderBy("idx")
      val sig = SignalFrame.fromEvents(s, dir)
        .withColumn("x", col("value"))
        .withColumn("y", coalesce(lag(col("value"), 1).over(w), lit(0.0)))
        .withColumn("z", col("value") % 50.0)
        .withColumn("mag", round(sqrt(col("x") * col("x") + col("y") * col("y") +
          col("z") * col("z")), 6))
      val perSec = sig
        .groupBy(col("subject"), (col("idx") / FS).cast("long").as("second"))
        .agg(sum(col("mag").cast(DecimalType(24, 6))).as("__dec"))
      val wSec = Window.partitionBy("subject").orderBy("second").rangeBetween(-2, 0)
      perSec
        .withColumn("auc_1s", (col("__dec").cast("double") * 0.25))
        .withColumn("auc_3s", sum(col("__dec")).over(wSec).cast("double") * 0.25)
        .select("subject", "second", "auc_1s", "auc_3s")
    }),

    // K10: SCR peak detection over the pseudo-phasic signal — fully
    // relational (EDA.py:219-309); the reference's sequential amplitude
    // filter is provably a prefix-max predicate.
    "q53_scr_peaks" -> ((s, dir) =>
      Scr.peaks(SignalFrame.fromEvents(s, dir))),

    // K8b: Elgendi ERMA PPG detector (PPG.py:235-322). Sequential
    // refractory pass — rows-only check.
    "q54_erma" -> ((s, dir) =>
      PpgDetectors.erma(SignalFrame.fromEvents(s, dir), fs = 32)),

    // A5 full: stepped moving-window AUC with minmax-normalized sums
    // (ACC.py:86-197 rolling path): windows of 5 s starting every 2 s,
    // truncated at the recording end.
    "q62_acc_windows" -> ((s, dir) => {
      val rw = 5L; val step = 2L
      val secs = SignalFrame.fromEvents(s, dir)
        .groupBy(col("subject"), (col("idx") / FS).cast("long").as("second"))
        .agg(sum(col("value").cast(DecimalType(24, 4))).as("__dec"))
        .withColumn("__sec_v", col("__dec").cast("double"))
      val wlo = when(col("second") < rw, lit(0L))
        .otherwise(((col("second") - rw) / step).cast("long") + 1)
      val whi = (col("second") / step).cast("long")
      val exploded = secs.withColumn("w", explode(sequence(wlo, whi)))
      val wWin = Window.partitionBy("subject", "w")
      exploded
        .withColumn("__mn", min(col("__sec_v")).over(wWin))
        .withColumn("__mx", max(col("__sec_v")).over(wWin))
        .withColumn("__norm", when(col("__mx") > col("__mn"),
          bround((col("__sec_v") - col("__mn")) / (col("__mx") - col("__mn")), 6)))
        .groupBy("subject", "w")
        .agg(
          sum(col("__dec")).cast("double").as("auc"),
          sum(col("__norm").cast(DecimalType(18, 6))).cast("double").as("auc_norm"))
        .select(col("subject"), (col("w") + 1).as("moving_window"),
          col("auc"), col("auc_norm"))
    }),

    // A10 full: per-segment tonic SCL excluding SCR intervals
    // (EDA.py:311-415, incl. the reference's global-interval-on-local-mask
    // quirk). find_peaks distance pruning is greedy -> kernel, rows-only.
    "q60_tonic_scl" -> ((s, dir) =>
      Scr.tonicScl(SignalFrame.fromEvents(s, dir), FS, SEG)
        .withColumn("tonic_scl", bround(col("tonic_scl"), 6))),

    // K9: cvxEDA-class phasic/tonic decomposition (EDA.py:520-688 model,
    // deterministic FISTA solver). The fixed-iteration trajectory is
    // bit-deterministic, so tools/golden.py replays it in pure Python
    // (same operation order) → full golden oracle; EdaDecomposeSpec
    // separately quantifies the FISTA↔exact-QP distance.
    "q59_cvxeda" -> ((s, dir) =>
      graft.kernels.EdaDecompose.decompose(SignalFrame.fromEvents(s, dir), FS)
        .withColumn("phasic", bround(col("phasic"), 6))
        .withColumn("driver", bround(col("driver"), 6))
        .withColumn("tonic", bround(col("tonic"), 6))),

    // A15 fd: Lomb-Scargle periodogram band powers over the (unevenly
    // sampled) IBI series. Rows-only check (libm trig); spec-validated
    // against a direct implementation.
    "q58_lomb" -> ((s, dir) => {
      val beats = Cardio.ibis(Cardio.beatRows(SignalFrame.fromEvents(s, dir)), FS)
        .filter(col("ibi").isNotNull)
        .select(col("subject"), (col("idx") / FS).as("t_s"), col("ibi").as("y"))
      val freqs = (1 to 100).map(_ * 0.004)
      val psd = HrvFreq.lombScargle(beats, freqs)
      HrvFreq.bandPowers(psd, df = 0.004)
        .select(col("subject"), bround(col("lf_power"), 6).as("lf_power"),
          bround(col("hf_power"), 6).as("hf_power"),
          bround(col("lf_hf_ratio"), 6).as("lf_hf_ratio"))
    })
  )

  private val SIG = SignalFrame.fromEventsSql
  private val EDA_SIG =
    s"""SELECT *, 28.0 + value % 14.0 AS temp FROM ($SIG)"""

  /** Per-segment EDA quality metrics SQL (q38) — reused by the q65 summary
    * oracle. */
  private def edaMetricsSql: String =
    s"""WITH sig AS ($EDA_SIG),
       |seg AS (SELECT *, idx // ${FS * SEG} + 1 AS segment FROM sig),
       |f AS (
       |  SELECT subject, segment, idx, artifact,
       |    CASE WHEN value < ${P.edaMin} OR value > ${P.edaMax} THEN 1 ELSE 0 END AS oor,
       |    CASE WHEN ABS(COALESCE((value - LAG(value) OVER ws) * $FS, 0)) > ${P.maxSlope}
       |      THEN 1 ELSE 0 END AS slp,
       |    CASE WHEN temp < ${P.tempMin} OR temp > ${P.tempMax} THEN 1 ELSE 0 END AS tmp
       |  FROM seg WINDOW ws AS (PARTITION BY subject, segment ORDER BY idx)),
       |g AS (
       |  SELECT *, GREATEST(oor, slp, tmp) AS inv,
       |    MAX(GREATEST(oor, slp, tmp)) OVER (PARTITION BY subject, segment ORDER BY idx
       |      ROWS BETWEEN ${(P.spreadDurS * FS).toInt} PRECEDING
       |               AND ${(P.spreadDurS * FS).toInt} FOLLOWING) AS spread
       |  FROM f),
       |agged AS (
       |  SELECT subject, segment, COUNT(*) AS len, CAST(SUM(spread) AS BIGINT) AS nspr,
       |    CAST(SUM(oor) AS BIGINT) AS n_out_of_range,
       |    CAST(SUM(slp) AS BIGINT) AS n_excessive_slope,
       |    CAST(SUM(tmp) AS BIGINT) AS n_temp_out_of_range, COUNT(artifact) AS n_scrs
       |  FROM g GROUP BY 1, 2)
       |SELECT subject, segment, len - nspr AS n_valid,
       |  round_even((len - nspr)::DOUBLE / len * 100, 2) AS pct_valid,
       |  nspr AS n_invalid, round_even(nspr::DOUBLE / len * 100, 2) AS pct_invalid,
       |  n_out_of_range, round_even(n_out_of_range::DOUBLE / len * 100, 2) AS pct_out_of_range,
       |  n_excessive_slope, round_even(n_excessive_slope::DOUBLE / len * 100, 2) AS pct_excessive_slope,
       |  n_temp_out_of_range, round_even(n_temp_out_of_range::DOUBLE / len * 100, 2) AS pct_temp_out_of_range,
       |  n_scrs
       |FROM agged WHERE len = ${FS * SEG}""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q66_eda_features" -> {
      def st(c: String): String = {
        val s1 = s"CAST(SUM(CAST($c AS DECIMAL(30,8))) AS DOUBLE)"
        val s2 = s"CAST(SUM(CAST($c * $c AS DECIMAL(30,8))) AS DOUBLE)"
        s"""round_even($s1 / COUNT($c), 6) AS ${c}_mean,
           |  round_even(CASE WHEN COUNT($c) > 1
           |    THEN sqrt(($s2 - $s1 * $s1 / COUNT($c)) / CAST(COUNT($c) - 1 AS DOUBLE))
           |  END, 6) AS ${c}_std,
           |  MIN($c) AS ${c}_min, MAX($c) AS ${c}_max""".stripMargin
      }
      s"""WITH sig AS ($SIG),
         |dec0 AS (
         |  SELECT subject, idx, value,
         |    round_even(CAST(SUM(CAST(value AS DECIMAL(24,6))) OVER wf AS DOUBLE)
         |      / COUNT(*) OVER wf, 6) AS tonic
         |  FROM sig WINDOW wf AS (PARTITION BY subject ORDER BY idx
         |    ROWS BETWEEN 8 PRECEDING AND 8 FOLLOWING)),
         |dec AS (
         |  SELECT subject, idx, tonic, round_even(value - tonic, 6) AS phasic
         |  FROM dec0),
         |ex AS (
         |  SELECT *, w FROM dec, unnest(range(
         |    CASE WHEN idx < 120 THEN 0 ELSE (idx - 120) // 40 + 1 END,
         |    idx // 40 + 1)) AS t(w))
         |SELECT subject, w + 1 AS moving_window, COUNT(*) AS n,
         |  ${st("phasic")},
         |  ${st("tonic")}
         |FROM ex GROUP BY subject, w""".stripMargin
    },

    "q68_hrv_stat" ->
      s"""WITH sig AS ($SIG),
         |b AS (
         |  SELECT subject, idx, (idx - LAG(idx) OVER w) / $FS.0 * 1000 AS ibi
         |  FROM sig WHERE beat = 1
         |  WINDOW w AS (PARTITION BY subject ORDER BY idx)),
         |a AS (
         |  SELECT subject, idx // ${FS * 60} + 1 AS win, COUNT(ibi) AS n_ibi,
         |    CAST(SUM(CAST(ibi AS DECIMAL(38,6))) AS DOUBLE) AS s1,
         |    CAST(SUM(CAST(ibi * ibi AS DECIMAL(38,6))) AS DOUBLE) AS s2,
         |    CAST(SUM(CAST(ibi * ibi * ibi AS DECIMAL(38,6))) AS DOUBLE) AS s3,
         |    CAST(SUM(CAST(ibi * ibi * ibi * ibi AS DECIMAL(38,6))) AS DOUBLE) AS s4
         |  FROM b WHERE ibi IS NOT NULL GROUP BY 1, 2),
         |m AS (
         |  SELECT subject, win, n_ibi, s1 / n_ibi AS mu,
         |    s2 / n_ibi - (s1 / n_ibi) * (s1 / n_ibi) AS m2,
         |    s3 / n_ibi - 3.0 * (s1 / n_ibi) * s2 / n_ibi
         |      + 2.0 * (s1 / n_ibi) * (s1 / n_ibi) * (s1 / n_ibi) AS m3,
         |    s4 / n_ibi - 4.0 * (s1 / n_ibi) * s3 / n_ibi
         |      + 6.0 * (s1 / n_ibi) * (s1 / n_ibi) * s2 / n_ibi
         |      - 3.0 * (s1 / n_ibi) * (s1 / n_ibi) * (s1 / n_ibi) * (s1 / n_ibi) AS m4
         |  FROM a WHERE n_ibi > 2)
         |SELECT subject, win, n_ibi, mu AS mean_nni,
         |  CASE WHEN m2 > 0 THEN round_even(m3 / (m2 * sqrt(m2)), 6) END AS skewness,
         |  CASE WHEN m2 > 0 THEN round_even(m4 / (m2 * m2) - 3.0, 6) END AS kurtosis
         |FROM m""".stripMargin,

    "q54_erma" -> KernelQueries.golden("q54_erma"),
    "q58_lomb" -> KernelQueries.golden("q58_lomb"),
    "q60_tonic_scl" -> KernelQueries.golden("q60_tonic_scl"),
    "q59_cvxeda" -> KernelQueries.golden("q59_cvxeda"),

    "q37_eda_quality" ->
      s"""WITH sig AS ($EDA_SIG)
         |SELECT subject, idx, value,
         |  CASE WHEN value < ${P.edaMin} OR value > ${P.edaMax} THEN 1 END AS out_of_range,
         |  CASE WHEN ABS(COALESCE((value - LAG(value) OVER w) * $FS, 0)) > ${P.maxSlope}
         |    THEN 1 END AS excessive_slope,
         |  CASE WHEN temp < ${P.tempMin} OR temp > ${P.tempMax} THEN 1 END AS temp_out_of_range
         |FROM sig WINDOW w AS (PARTITION BY subject ORDER BY idx)""".stripMargin,

    "q38_eda_metrics" -> edaMetricsSql,

    // A14 EDA summary: metrics aggregation + tonic-SCL median from the
    // reference-generated golden fixture (the tonic kernel itself is
    // oracle-checked by q60).
    "q65_eda_summary" ->
      s"""WITH met AS ($edaMetricsSql),
         |ton AS (${KernelQueries.golden("q60_tonic_scl")}),
         |med AS (
         |  SELECT subject, round_even(
         |    CASE WHEN COUNT(CASE WHEN isnan(tonic_scl) THEN 1 END) > 0
         |      THEN 'NaN'::DOUBLE
         |      ELSE MEDIAN(CASE WHEN NOT isnan(tonic_scl) THEN tonic_scl END)
         |    END, 2) AS median_tonic_scl
         |  FROM ton GROUP BY 1),
         |agg AS (
         |  SELECT subject,
         |    round_even(CAST(SUM(n_scrs) AS DOUBLE) / COUNT(*), 2) AS avg_scrs_per_segment,
         |    COUNT(CASE WHEN n_invalid > 0 THEN 1 END) AS n_seg_invalid,
         |    round_even(CAST(SUM(CAST(pct_invalid AS DECIMAL(24,6))) AS DOUBLE)
         |      / COUNT(pct_invalid), 2) AS avg_pct_invalid,
         |    round_even(CAST(SUM(CAST(pct_out_of_range AS DECIMAL(24,6))) AS DOUBLE)
         |      / COUNT(pct_out_of_range), 2) AS avg_pct_out_of_range,
         |    round_even(CAST(SUM(CAST(pct_excessive_slope AS DECIMAL(24,6))) AS DOUBLE)
         |      / COUNT(pct_excessive_slope), 2) AS avg_pct_excessive_slope,
         |    round_even(CAST(SUM(CAST(pct_temp_out_of_range AS DECIMAL(24,6))) AS DOUBLE)
         |      / COUNT(pct_temp_out_of_range), 2) AS avg_pct_temp_out_of_range
         |  FROM met GROUP BY 1)
         |SELECT agg.subject, median_tonic_scl, avg_scrs_per_segment,
         |  n_seg_invalid, avg_pct_invalid, avg_pct_out_of_range,
         |  avg_pct_excessive_slope, avg_pct_temp_out_of_range
         |FROM agg LEFT JOIN med ON agg.subject = med.subject""".stripMargin,

    "q39_hrv_td" ->
      s"""WITH sig AS ($SIG),
         |b AS (
         |  SELECT subject, idx, (idx - LAG(idx) OVER w) / $FS.0 * 1000 AS ibi
         |  FROM sig WHERE beat = 1
         |  WINDOW w AS (PARTITION BY subject ORDER BY idx)),
         |d AS (
         |  SELECT subject, idx, ibi, ibi - LAG(ibi) OVER w AS sd,
         |    idx // ${FS * 60} + 1 AS win
         |  FROM b WHERE ibi IS NOT NULL
         |  WINDOW w AS (PARTITION BY subject ORDER BY idx)),
         |a AS (
         |  SELECT subject, win, COUNT(ibi) AS n_ibi,
         |    CAST(SUM(CAST(ibi AS DECIMAL(30,6))) AS DOUBLE) AS s1,
         |    CAST(SUM(CAST(ibi * ibi AS DECIMAL(30,6))) AS DOUBLE) AS s2,
         |    CAST(SUM(CAST(sd * sd AS DECIMAL(30,6))) AS DOUBLE) AS sd2,
         |    COUNT(sd) AS nsd,
         |    SUM(CASE WHEN ABS(sd) > 50 THEN 1 ELSE 0 END) AS nn50,
         |    SUM(CASE WHEN ABS(sd) > 20 THEN 1 ELSE 0 END) AS nn20,
         |    MIN(ibi) AS min_nni, MAX(ibi) AS max_nni,
         |    MEDIAN(ibi) AS median_nni
         |  FROM d GROUP BY 1, 2)
         |SELECT subject, win, n_ibi, s1 / n_ibi AS mean_nni, median_nni,
         |  max_nni - min_nni AS range_nni, min_nni, max_nni,
         |  CASE WHEN n_ibi > 1 THEN sqrt((s2 - s1 * s1 / n_ibi) / (n_ibi - 1)) END AS sdnn,
         |  CASE WHEN nsd > 0 THEN sqrt(sd2 / nsd) END AS rmssd,
         |  CASE WHEN nsd > 0 THEN nn50::DOUBLE / nsd * 100 END AS pnn50,
         |  CASE WHEN nsd > 0 THEN nn20::DOUBLE / nsd * 100 END AS pnn20,
         |  60000.0 / (s1 / n_ibi) AS mean_hr,
         |  60000.0 / min_nni AS max_hr, 60000.0 / max_nni AS min_hr
         |FROM a""".stripMargin,

    "q40_hrv_nl" ->
      s"""WITH sig AS ($SIG),
         |b AS (
         |  SELECT subject, idx, (idx - LAG(idx) OVER w) / $FS.0 * 1000 AS ibi
         |  FROM sig WHERE beat = 1
         |  WINDOW w AS (PARTITION BY subject ORDER BY idx)),
         |d AS (
         |  SELECT subject, idx, ibi, ibi - LAG(ibi) OVER w AS sd,
         |    idx // ${FS * 60} + 1 AS win
         |  FROM b WHERE ibi IS NOT NULL
         |  WINDOW w AS (PARTITION BY subject ORDER BY idx)),
         |a AS (
         |  SELECT subject, win, COUNT(ibi) AS n_ibi,
         |    CAST(SUM(CAST(ibi AS DECIMAL(30,6))) AS DOUBLE) AS s1,
         |    CAST(SUM(CAST(ibi * ibi AS DECIMAL(30,6))) AS DOUBLE) AS s2,
         |    CAST(SUM(CAST(sd * sd AS DECIMAL(30,6))) AS DOUBLE) AS sd2,
         |    COUNT(sd) AS nsd
         |  FROM d GROUP BY 1, 2),
         |v AS (
         |  SELECT *, (s2 - s1 * s1 / n_ibi) / (n_ibi - 1) AS var_nni, sd2 / nsd AS var_sd
         |  FROM a WHERE n_ibi > 2 AND nsd > 1)
         |SELECT subject, win, n_ibi,
         |  sqrt(var_sd / 2) AS sd1,
         |  CASE WHEN 2.0 * var_nni - var_sd / 2 > 0 THEN sqrt(2.0 * var_nni - var_sd / 2) END AS sd2,
         |  CASE WHEN 2.0 * var_nni - var_sd / 2 > 0 THEN sqrt(2.0 * var_nni - var_sd / 2) END / sqrt(var_sd / 2) AS csi,
         |  ROUND(log10(sqrt(var_sd / 2) * (CASE WHEN 2.0 * var_nni - var_sd / 2 > 0
         |    THEN sqrt(2.0 * var_nni - var_sd / 2) END) * 16), 6) AS cvi
         |FROM v""".stripMargin,

    "q91_sampen" ->
      s"""WITH sig AS ($SIG),
         |b AS (
         |  SELECT subject, idx, (idx - LAG(idx) OVER w) / $FS.0 * 1000 AS ibi
         |  FROM sig WHERE beat = 1
         |  WINDOW w AS (PARTITION BY subject ORDER BY idx)),
         |d AS (
         |  SELECT subject, idx, ibi, idx // ${FS * 60} + 1 AS win
         |  FROM b WHERE ibi IS NOT NULL),
         |t AS (
         |  SELECT subject, win, row_number() OVER w AS k, ibi AS x0,
         |    LEAD(ibi, 1) OVER w AS x1, LEAD(ibi, 2) OVER w AS x2
         |  FROM d WINDOW w AS (PARTITION BY subject, win ORDER BY idx)),
         |tol AS (
         |  SELECT subject, win, COUNT(*) AS n_ibi,
         |    CAST(SUM(CAST(x0 AS DECIMAL(30,6))) AS DOUBLE) AS s1,
         |    CAST(SUM(CAST(x0 * x0 AS DECIMAL(30,6))) AS DOUBLE) AS s2
         |  FROM t GROUP BY 1, 2 HAVING COUNT(*) > 3),
         |tr AS (
         |  SELECT subject, win, n_ibi,
         |    0.2 * sqrt((s2 - s1 * s1 / n_ibi) / n_ibi) AS r FROM tol),
         |agg AS (
         |  SELECT a.subject, a.win, tr.n_ibi,
         |    CAST(SUM(CASE WHEN a.x1 IS NOT NULL AND bb.x1 IS NOT NULL
         |      AND GREATEST(ABS(a.x0 - bb.x0), ABS(a.x1 - bb.x1)) <= tr.r
         |      THEN 1 ELSE 0 END) AS BIGINT) AS b_count,
         |    CAST(SUM(CASE WHEN a.x2 IS NOT NULL AND bb.x2 IS NOT NULL
         |      AND GREATEST(ABS(a.x0 - bb.x0), ABS(a.x1 - bb.x1),
         |        ABS(a.x2 - bb.x2)) <= tr.r THEN 1 ELSE 0 END) AS BIGINT) AS a_count
         |  FROM t a
         |  JOIN t bb ON a.subject = bb.subject AND a.win = bb.win AND bb.k > a.k
         |  JOIN tr ON a.subject = tr.subject AND a.win = tr.win
         |  GROUP BY 1, 2, 3)
         |SELECT subject, win, n_ibi, b_count, a_count,
         |  CASE WHEN a_count > 0 AND b_count > 0
         |    THEN round_even(-ln(a_count::DOUBLE / b_count), 6) END AS sampen
         |FROM agg""".stripMargin,

    "q41_acc_auc" ->
      s"""WITH sig AS ($SIG),
         |m AS (
         |  SELECT subject, idx,
         |    ROUND(sqrt(value * value
         |      + COALESCE(LAG(value) OVER (PARTITION BY subject ORDER BY idx), 0)
         |        * COALESCE(LAG(value) OVER (PARTITION BY subject ORDER BY idx), 0)
         |      + (value % 50.0) * (value % 50.0)), 6) AS mag
         |  FROM sig),
         |s AS (
         |  SELECT subject, idx // $FS AS second,
         |    SUM(CAST(mag AS DECIMAL(24,6))) AS dec
         |  FROM m GROUP BY 1, 2)
         |SELECT subject, second,
         |  CAST(dec AS DOUBLE) * 0.25 AS auc_1s,
         |  CAST(SUM(dec) OVER (PARTITION BY subject ORDER BY second
         |    RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) * 0.25 AS auc_3s
         |FROM s""".stripMargin,

    "q62_acc_windows" ->
      s"""WITH sig AS ($SIG),
         |secs AS (
         |  SELECT subject, idx // $FS AS second,
         |    SUM(CAST(value AS DECIMAL(24,4))) AS dec
         |  FROM sig GROUP BY 1, 2),
         |ex AS (
         |  SELECT subject, second, dec, CAST(dec AS DOUBLE) AS sec_v, w
         |  FROM secs, unnest(range(
         |    CASE WHEN second < 5 THEN 0 ELSE (second - 5) // 2 + 1 END,
         |    second // 2 + 1)) AS t(w)),
         |m AS (
         |  SELECT *, MIN(sec_v) OVER ww AS mn, MAX(sec_v) OVER ww AS mx
         |  FROM ex WINDOW ww AS (PARTITION BY subject, w))
         |SELECT subject, w + 1 AS moving_window,
         |  CAST(SUM(dec) AS DOUBLE) AS auc,
         |  CAST(SUM(CAST(CASE WHEN mx > mn
         |    THEN round_even((sec_v - mn) / (mx - mn), 6) END AS DECIMAL(18,6)))
         |    AS DOUBLE) AS auc_norm
         |FROM m GROUP BY 1, 2""".stripMargin,

    "q53_scr_peaks" -> {
      val m = 20
      val kern = Scr.bartlettKernel(m)
      val off = (m - 1) / 2
      val taps = (0 until m).map { j =>
        val o = off - j
        val v =
          if (o > 0) s"COALESCE(LEAD(dd, $o) OVER w, 0)"
          else if (o < 0) s"COALESCE(LAG(dd, ${-o}) OVER w, 0)"
          else "dd"
        s"${kern(j)} * $v"
      }.mkString(" + ")
      s"""WITH sig AS ($SIG),
         |d AS (
         |  SELECT subject, idx, value,
         |    COALESCE(value - LAG(value) OVER (PARTITION BY subject ORDER BY idx), 0) AS dd
         |  FROM sig),
         |sm AS (
         |  SELECT subject, idx, value, $taps AS s FROM d
         |  WINDOW w AS (PARTITION BY subject ORDER BY idx)),
         |s2 AS (
         |  SELECT *, LEAD(s) OVER (PARTITION BY subject ORDER BY idx) AS snx FROM sm),
         |pos AS (
         |  SELECT subject, idx AS onset, value AS onset_v,
         |    ROW_NUMBER() OVER (PARTITION BY subject ORDER BY idx) AS r
         |  FROM s2 WHERE s < 0 AND snx >= 0),
         |neg AS (
         |  SELECT subject, idx AS offs,
         |    ROW_NUMBER() OVER (PARTITION BY subject ORDER BY idx) AS rn0
         |  FROM s2 WHERE s > 0 AND snx <= 0),
         |fst AS (
         |  SELECT p.subject, CASE WHEN q.fn < p.fp THEN 1 ELSE 0 END AS shift
         |  FROM (SELECT subject, MIN(onset) AS fp FROM pos GROUP BY 1) p
         |  JOIN (SELECT subject, MIN(offs) AS fn FROM neg GROUP BY 1) q USING (subject)),
         |na AS (
         |  SELECT neg.subject, offs, rn0 - shift AS r
         |  FROM neg JOIN fst USING (subject) WHERE rn0 - shift >= 1),
         |pairs AS (
         |  SELECT pos.subject, onset, offs, onset_v
         |  FROM pos JOIN na ON pos.subject = na.subject AND pos.r = na.r),
         |cand AS (
         |  SELECT subject, onset, offs, idx AS peak_idx, value - onset_v AS amp FROM (
         |    SELECT p.subject, p.onset, p.offs, g.idx, g.value, p.onset_v,
         |      ROW_NUMBER() OVER (PARTITION BY p.subject, p.onset
         |        ORDER BY g.value DESC, g.idx) AS pk
         |    FROM pairs p JOIN sig g ON g.subject = p.subject
         |      AND g.idx >= p.onset AND g.idx < p.offs)
         |  WHERE pk = 1)
         |SELECT subject, peak_idx, onset, offs AS "offset", amp FROM (
         |  SELECT *, MAX(amp) OVER (PARTITION BY subject ORDER BY onset
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
         |  FROM cand)
         |WHERE pm IS NULL OR amp >= 0.1 * pm""".stripMargin
    }
  )
}
