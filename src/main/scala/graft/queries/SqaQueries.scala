package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.SignalFrame
import graft.sqa.Cardio

/** Signal-quality-assessment suite — the reference's flagship query surface
  * (SQA.Cardio) over the events-derived signal frame. fs=4 so every IBI is
  * an exact binary multiple of 250 ms (order-independent sums); segSize=10
  * (40 samples) so each subject spans multiple segments at sf>=0.001.
  */
object SqaQueries {

  val FS = 4
  val SEG = 10
  private val SEG_ROWS = FS * SEG // 40
  private val HALF = (SEG * 0.5).toInt // 5 rows

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q17_sqa_artifacts" -> ((s, dir) =>
      Cardio.getArtifacts(SignalFrame.fromEvents(s, dir), FS, SEG)),

    "q18_sqa_missing" -> ((s, dir) =>
      Cardio.getMissing(SignalFrame.fromEvents(s, dir), FS, SEG)),

    "q19_sqa_metrics" -> ((s, dir) =>
      Cardio.computeMetrics(SignalFrame.fromEvents(s, dir), FS, SEG)),

    "q32_sqa_seconds" -> ((s, dir) =>
      Cardio.getSeconds(SignalFrame.fromEvents(s, dir), FS)),

    "q33_hegarty" -> ((s, dir) =>
      Cardio.hegartyArtifacts(
        Cardio.beatRows(SignalFrame.fromEvents(s, dir)), FS)
        .select("subject", "idx", "ibi", "hegarty_artifact")),

    "q42_rolling_metrics" -> ((s, dir) =>
      Cardio.computeMetricsRolling(SignalFrame.fromEvents(s, dir), FS,
        windowS = 20, stepS = 5)),

    // A14 cardiac summary panel (dashboard/utils.py:584-631) over the
    // per-segment metrics, incl. the diff<10 HR-stability filter.
    "q64_cardiac_summary" -> ((s, dir) =>
      graft.sqa.Summary.cardiac(
        Cardio.computeMetrics(SignalFrame.fromEvents(s, dir), FS, SEG))),

    "q43_interp" -> ((s, dir) => {
      import graft.ops.AsofJoin
      val G = 7200000000L // 2-hour grid
      val ev = graft.core.Tables.events(s, dir)
        .select(col("user_id").as("subject"), col("ts_us"), col("value"))
      val grid = ev.groupBy("subject")
        .agg(min(col("ts_us")).as("__lo"), max(col("ts_us")).as("__hi"))
        .withColumn("g", explode(sequence(
          expr(s"(__lo + ${G - 1}) div $G"), expr(s"__hi div $G"))))
        .withColumn("gt", col("g") * G)
        .select("subject", "gt")
      // Both interpolation brackets from ONE union+window pass — two
      // directed as-of calls would re-sort the keyed stream twice.
      val both = AsofJoin.joinBoth(grid, ev, Seq("subject"), "gt", "ts_us",
        backCols = Seq("value" -> "y0"), fwdCols = Seq("value" -> "y1"))
        .withColumnRenamed("ts_us_backward", "t0")
        .withColumnRenamed("ts_us_forward", "t1")
      both
        .filter(col("t0").isNotNull && col("t1").isNotNull)
        .withColumn("interp",
          when(col("t1") === col("t0"), col("y0"))
            .otherwise(col("y0") + (col("y1") - col("y0")) *
              ((col("gt") - col("t0")).cast("double") / (col("t1") - col("t0")))))
        .select("subject", "gt", "t0", "t1", "interp")
    })
  )

  private val SIG = SignalFrame.fromEventsSql

  /** numpy-median over a DuckDB list (null-skipping, interpolating). */
  private def listMedian(l: String): String =
    s"""(CASE WHEN len(list_filter($l, x -> x IS NOT NULL)) = 0 THEN NULL
       | WHEN len(list_filter($l, x -> x IS NOT NULL)) % 2 = 1
       |   THEN list_sort(list_filter($l, x -> x IS NOT NULL))[len(list_filter($l, x -> x IS NOT NULL)) // 2 + 1]
       | ELSE (list_sort(list_filter($l, x -> x IS NOT NULL))[len(list_filter($l, x -> x IS NOT NULL)) // 2]
       |     + list_sort(list_filter($l, x -> x IS NOT NULL))[len(list_filter($l, x -> x IS NOT NULL)) // 2 + 1]) / 2.0
       | END)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q17_sqa_artifacts" ->
      s"""WITH sig AS ($SIG)
         |SELECT subject, idx // $SEG_ROWS + 1 AS segment,
         |  COUNT(beat) AS n_detected, COUNT(artifact) AS n_artifact,
         |  MIN(ts_us) AS first_ts_us,
         |  CASE WHEN COUNT(beat) > 0
         |    THEN round_even(COUNT(artifact)::DOUBLE / COUNT(beat) * 100, 2) END AS pct_artifact
         |FROM sig GROUP BY 1, 2""".stripMargin,

    "q18_sqa_missing" -> missingSql(),

    "q19_sqa_metrics" -> metricsSql(s"sig AS ($SIG)"),

    "q32_sqa_seconds" ->
      s"""WITH sig AS ($SIG),
         |secs AS (
         |  SELECT subject, idx // $FS AS sec, COUNT(beat) AS n_beats,
         |    MIN(ts_us) AS first_ts_us
         |  FROM sig GROUP BY 1, 2),
         |pairs AS (
         |  SELECT subject, idx, LAG(idx) OVER w AS prev_idx,
         |    (idx - LAG(idx) OVER w) / $FS.0 * 1000 AS ibi
         |  FROM sig WHERE beat = 1
         |  WINDOW w AS (PARTITION BY subject ORDER BY idx)),
         |exploded AS (
         |  SELECT subject, s, ibi FROM (
         |    SELECT *, prev_idx // $FS AS pb, idx // $FS AS cb
         |    FROM pairs WHERE ibi IS NOT NULL),
         |  unnest(list_distinct([cb, pb + 1])) AS t(s)
         |  WHERE s >= cb AND s <= pb + 1),
         |pagg AS (
         |  SELECT subject, s AS sec,
         |    CAST(SUM(CAST(ibi AS DECIMAL(24,4))) AS DOUBLE) / COUNT(ibi) AS mean_ibi
         |  FROM exploded GROUP BY 1, 2)
         |SELECT secs.subject, sec + 1 AS second, first_ts_us,
         |  60000.0 / mean_ibi AS mean_hr, mean_ibi, n_beats
         |FROM secs LEFT JOIN pagg USING (subject, sec)""".stripMargin,

    "q33_hegarty" ->
      s"""WITH sig AS ($SIG),
         |b0 AS (
         |  SELECT subject, idx,
         |    (idx - LAG(idx) OVER w) / $FS.0 * 1000 AS ibi,
         |    ROW_NUMBER() OVER w - 2 AS n
         |  FROM sig WHERE beat = 1
         |  WINDOW w AS (PARTITION BY subject ORDER BY idx)),
         |b1 AS (
         |  SELECT *, ABS(ibi - LAG(ibi) OVER w) AS sd
         |  FROM b0 WINDOW w AS (PARTITION BY subject ORDER BY idx)),
         |b2 AS (
         |  SELECT *, CASE WHEN COUNT(sd) OVER wf = 6 THEN AVG(sd) OVER wf END AS ma6
         |  FROM b1 WINDOW wf AS (PARTITION BY subject ORDER BY idx
         |    ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING)),
         |b3 AS (
         |  SELECT *, FIRST_VALUE(CASE WHEN ma6 IS NOT NULL THEN n - 1 END) OVER
         |    (PARTITION BY subject ORDER BY ma6 ASC NULLS LAST, n
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS m
         |  FROM b2),
         |b4 AS (
         |  SELECT *, AVG(CASE WHEN n BETWEEN m AND m + 5 THEN ibi END) OVER
         |    (PARTITION BY subject) AS first_ibi,
         |    list(ibi) OVER (PARTITION BY subject ORDER BY idx
         |      ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING) AS prior6
         |  FROM b3),
         |b5 AS (
         |  SELECT subject, idx, ibi,
         |    CASE WHEN n >= 6 THEN ${listMedian("prior6")}
         |         ELSE ${listMedian("list_prepend(first_ibi, prior6)")} END AS est
         |  FROM b4)
         |SELECT subject, idx, ibi,
         |  CASE WHEN ibi IS NOT NULL AND NOT
         |    (ibi BETWEEN (26.0/32) * est AND (44.0/32) * est) THEN 1 END AS hegarty_artifact
         |FROM b5""".stripMargin,

    "q42_rolling_metrics" -> rollingSql(windowS = 20, stepS = 5),

    "q64_cardiac_summary" ->
      s"""WITH met AS (${metricsSql(s"sig AS ($SIG)")}),
         |v AS (
         |  SELECT subject, n_detected,
         |    LEAD(n_detected) OVER (PARTITION BY subject ORDER BY segment)
         |      - n_detected AS d
         |  FROM met WHERE invalid IS NULL),
         |avgn AS (
         |  SELECT subject,
         |    round_even(CAST(SUM(n_detected) AS DOUBLE) / COUNT(*), 2) AS avg_n_detected
         |  FROM v WHERE d < 10 GROUP BY 1),
         |agg AS (
         |  SELECT subject,
         |    COUNT(CASE WHEN n_missing > 0 THEN 1 END) AS n_seg_missing,
         |    COUNT(CASE WHEN n_artifact > 0 THEN 1 END) AS n_seg_artifact,
         |    COUNT(CASE WHEN invalid = 1 THEN 1 END) AS n_seg_invalid,
         |    round_even(COUNT(CASE WHEN invalid = 1 THEN 1 END)::DOUBLE
         |      / MAX(segment) * 100, 2) AS pct_invalid,
         |    round_even(CAST(SUM(CAST(pct_missing AS DECIMAL(24,6))) AS DOUBLE)
         |      / COUNT(pct_missing), 2) AS avg_pct_missing,
         |    round_even(COALESCE(
         |      CAST(SUM(CAST(CASE WHEN pct_artifact > 0 THEN pct_artifact END
         |        AS DECIMAL(24,6))) AS DOUBLE)
         |      / COUNT(CASE WHEN pct_artifact > 0 THEN pct_artifact END), 0.0), 2)
         |      AS avg_pct_artifact
         |  FROM met GROUP BY 1)
         |SELECT agg.subject, avg_n_detected, n_seg_missing, n_seg_artifact,
         |  n_seg_invalid, pct_invalid, avg_pct_missing, avg_pct_artifact
         |FROM agg LEFT JOIN avgn ON agg.subject = avgn.subject""".stripMargin,

    "q43_interp" -> {
      val G = 7200000000L
      s"""WITH ev AS (
         |  SELECT user_id AS subject, epoch_us(ts) AS ts_us, value FROM events),
         |grid AS (
         |  SELECT subject, unnest(range((MIN(ts_us) + ${G - 1}) // $G, MAX(ts_us) // $G + 1)) * $G AS gt
         |  FROM ev GROUP BY subject)
         |SELECT g.subject, g.gt, b.t0, f.t1,
         |  CASE WHEN f.t1 = b.t0 THEN b.y0
         |    ELSE b.y0 + (f.y1 - b.y0) * (CAST(g.gt - b.t0 AS DOUBLE) / (f.t1 - b.t0)) END AS interp
         |FROM grid g
         |JOIN LATERAL (SELECT ts_us AS t0, value AS y0 FROM ev e
         |  WHERE e.subject = g.subject AND e.ts_us <= g.gt
         |  ORDER BY e.ts_us DESC LIMIT 1) b ON TRUE
         |JOIN LATERAL (SELECT ts_us AS t1, value AS y1 FROM ev e
         |  WHERE e.subject = g.subject AND e.ts_us >= g.gt
         |  ORDER BY e.ts_us ASC LIMIT 1) f ON TRUE""".stripMargin
    }
  )

  private def rollingSql(windowS: Int, stepS: Int): String = {
    val step = FS * stepS
    val win = FS * windowS
    val thr = (40.0 * 60 / 60).toInt
    s"""WITH sig AS ($SIG),
       |b AS (
       |  SELECT subject, idx, (idx - LAG(idx) OVER w) / $FS.0 * 1000 AS ibi
       |  FROM sig WHERE beat = 1
       |  WINDOW w AS (PARTITION BY subject ORDER BY idx)),
       |sj AS (
       |  SELECT s.*, b.ibi FROM sig s
       |  LEFT JOIN b ON s.subject = b.subject AND s.idx = b.idx),
       |ex AS (
       |  SELECT *, w FROM sj, unnest(range(
       |    CASE WHEN idx < $win THEN 0 ELSE (idx - $win) // $step + 1 END,
       |    idx // $step + 1)) AS t(w)),
       |base AS (
       |  SELECT subject, w, COUNT(beat) AS n_detected, COUNT(artifact) AS n_artifact,
       |    MIN(ts_us) AS first_ts_us
       |  FROM ex GROUP BY 1, 2),
       |bm AS (
       |  SELECT subject, w,
       |    COUNT(*) OVER w5 AS cnt5,
       |    (COUNT(artifact) OVER w5 = 0) AS art_free,
       |    MEDIAN(60000.0 / ibi) OVER w5 AS med_hr
       |  FROM ex WHERE beat = 1
       |  WINDOW w5 AS (PARTITION BY subject, w ORDER BY idx
       |    ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING)),
       |er AS (
       |  SELECT subject, w, MEDIAN(med_hr) AS exp_raw
       |  FROM bm WHERE cnt5 = 5 AND art_free GROUP BY 1, 2),
       |m AS (
       |  SELECT base.*, LAST_VALUE(er.exp_raw IGNORE NULLS) OVER
       |    (PARTITION BY base.subject ORDER BY base.w
       |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS exp_hr
       |  FROM base LEFT JOIN er ON base.subject = er.subject AND base.w = er.w)
       |SELECT subject, w + 1 AS moving_window, first_ts_us, n_detected,
       |  CAST(round_even(exp_hr * $windowS / 60.0, 0) AS BIGINT) AS n_expected,
       |  GREATEST(CAST(round_even(exp_hr * $windowS / 60.0, 0) AS BIGINT) - n_detected, 0) AS n_missing,
       |  round_even(GREATEST(CAST(round_even(exp_hr * $windowS / 60.0, 0) AS BIGINT) - n_detected, 0)::DOUBLE
       |    / CAST(round_even(exp_hr * $windowS / 60.0, 0) AS BIGINT) * 100, 2) AS pct_missing,
       |  n_artifact,
       |  CASE WHEN n_detected > 0
       |    THEN round_even(n_artifact::DOUBLE / n_detected * 100, 2) END AS pct_artifact,
       |  CASE WHEN n_detected < $thr OR n_detected > 220 THEN 1 END AS invalid
       |FROM m""".stripMargin
  }

  /** Full per-segment metrics SQL over an arbitrary signal-CTE chain whose
    * final CTE is named `sig` — reused by q19 (raw beats) and q63 (edited
    * beats round-trip). */
  def metricsSql(sigCte: String): String =
    s"""WITH m AS (${missingSql(sigCte)}),
       |a AS (
       |  WITH $sigCte
       |  SELECT subject, idx // $SEG_ROWS + 1 AS segment,
       |    COUNT(artifact) AS n_artifact, MIN(ts_us) AS first_ts_us,
       |    CASE WHEN COUNT(beat) > 0
       |      THEN round_even(COUNT(artifact)::DOUBLE / COUNT(beat) * 100, 2) END AS pct_artifact
       |  FROM sig GROUP BY 1, 2)
       |SELECT m.subject, m.segment, a.first_ts_us, m.n_detected, m.n_expected,
       |  m.n_missing, m.pct_missing, a.n_artifact, a.pct_artifact,
       |  CASE WHEN m.n_detected < ${(40.0 * SEG / 60).toInt} OR m.n_detected > 220
       |    THEN 1 END AS invalid
       |FROM m JOIN a ON m.subject = a.subject AND m.segment = a.segment""".stripMargin

  private def missingSql(sigCte: String = s"sig AS ($SIG)"): String =
    s"""WITH $sigCte,
       |seg AS (
       |  SELECT *, idx // $SEG_ROWS + 1 AS segment, idx % $SEG_ROWS AS pos FROM sig),
       |seglens AS (
       |  SELECT subject, segment, COUNT(*) AS seg_len, COUNT(beat) AS n_detected
       |  FROM seg GROUP BY 1, 2),
       |beats AS (
       |  SELECT s.subject, s.segment, s.pos, s.idx, s.artifact, l.seg_len,
       |    (s.idx - LAG(s.idx) OVER (PARTITION BY s.subject ORDER BY s.idx)) / $FS.0 * 1000 AS ibi
       |  FROM seg s JOIN seglens l ON s.subject = l.subject AND s.segment = l.segment
       |  WHERE s.beat = 1),
       |winmed AS (
       |  SELECT subject, segment,
       |    COUNT(*) OVER w5 AS cnt5,
       |    (MIN(segment) OVER w5 = MAX(segment) OVER w5) AS same_seg,
       |    (COUNT(artifact) OVER w5 = 0) AS art_free,
       |    (MIN(CASE WHEN pos >= seg_len - $HALF THEN 1 ELSE 0 END) OVER w5 = 1) AS in_last_half,
       |    (MIN(CASE WHEN pos < $HALF THEN 1 ELSE 0 END) OVER w5 = 1) AS in_first_half,
       |    MEDIAN(60000.0 / ibi) OVER w5 AS med_hr
       |  FROM beats
       |  WINDOW w5 AS (PARTITION BY subject ORDER BY idx
       |    ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING)),
       |ok AS (SELECT * FROM winmed WHERE cnt5 = 5 AND same_seg AND art_free),
       |segmed AS (SELECT subject, segment, MEDIAN(med_hr) AS exp0 FROM ok GROUP BY 1, 2),
       |h2 AS (SELECT subject, segment, MEDIAN(med_hr) AS half2 FROM ok WHERE in_last_half GROUP BY 1, 2),
       |h1 AS (SELECT subject, segment, MEDIAN(med_hr) AS half1 FROM ok WHERE in_first_half GROUP BY 1, 2),
       |m0 AS (
       |  SELECT l.subject, l.segment, l.seg_len, l.n_detected,
       |    COALESCE(sm.exp0,
       |      LAG(h2.half2) OVER (PARTITION BY l.subject ORDER BY l.segment),
       |      LEAD(h1.half1) OVER (PARTITION BY l.subject ORDER BY l.segment)) AS exp_raw
       |  FROM seglens l
       |  LEFT JOIN segmed sm ON l.subject = sm.subject AND l.segment = sm.segment
       |  LEFT JOIN h2 ON l.subject = h2.subject AND l.segment = h2.segment
       |  LEFT JOIN h1 ON l.subject = h1.subject AND l.segment = h1.segment),
       |m1 AS (
       |  SELECT *, LAST_VALUE(exp_raw IGNORE NULLS) OVER
       |    (PARTITION BY subject ORDER BY segment
       |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS exp_hr,
       |    (segment = MAX(segment) OVER (PARTITION BY subject)) AS is_last
       |  FROM m0),
       |m2 AS (
       |  SELECT *, CAST(round_even(exp_hr * $SEG / 60.0, 0) AS BIGINT) AS n_exp0 FROM m1),
       |m3 AS (
       |  SELECT *, CASE WHEN is_last
       |    THEN CAST(round_even(n_exp0 * (seg_len::DOUBLE / $FS / $SEG), 0) AS BIGINT)
       |    ELSE n_exp0 END AS n_exp1
       |  FROM m2),
       |m4 AS (
       |  SELECT *, COALESCE(n_exp1, FIRST_VALUE(n_exp1 IGNORE NULLS) OVER
       |    (PARTITION BY subject ORDER BY segment
       |     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS n_expected
       |  FROM m3)
       |SELECT subject, segment, n_detected, n_expected,
       |  GREATEST(n_expected - n_detected, 0) AS n_missing,
       |  round_even(GREATEST(n_expected - n_detected, 0)::DOUBLE / n_expected * 100, 2) AS pct_missing
       |FROM m4""".stripMargin
}
