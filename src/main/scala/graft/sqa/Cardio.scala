package graft.sqa

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.SignalFrame

/** Cardiovascular signal-quality assessment — the reference's flagship
  * query surface (pipeline/SQA.py `Cardio`), re-expressed as lazy
  * DataFrame plans over the canonical signal frame
  * (subject, idx, ts_us, value, beat, artifact).
  *
  * All operators share one partitioning — `(subject)` ordered by `idx` — so
  * Catalyst reuses a single exchange across the window chain; the only
  * further shuffle is the final per-segment reduce. At 100 TB, recordings
  * are range-bucketed by idx with halo rows equal to the maximum window
  * lookback (SURVEY §4.3).
  *
  * Numeric parity notes: Python `round()`/pandas `.round()` are
  * HALF_EVEN -> Spark `bround`. Median frames use exact interpolated
  * percentile (`percentile`, not approx).
  */
object Cardio {

  private def wSub = Window.partitionBy("subject").orderBy("idx")

  /** Interbeat intervals at beat rows: (idx - lag(idx)) / fs * 1000
    * (reference physioview.py:977-1020). Input: beat rows only. */
  def ibis(beats: DataFrame, fs: Int): DataFrame =
    beats.withColumn("ibi",
      (col("idx") - lag(col("idx"), 1).over(wSub)).cast("double") / fs * 1000.0)

  /** Beat rows of a signal frame. */
  def beatRows(signal: DataFrame): DataFrame = signal.filter(col("beat") === 1)

  /** ONE per-segment aggregation feeding getArtifacts, getMissing AND
    * computeMetrics: segment length, detected/artifact beat counts, first
    * timestamp. The signal frame is scanned once for all segment-level
    * counts — at 100 TB a second scan of the raw signal is the difference
    * between one pass and two (the reference recomputes these per call:
    * SQA.py:237-277 vs :503-629). */
  private def segBase(signal: DataFrame, fs: Int, segSize: Int): DataFrame =
    signal
      .withColumn("segment", SignalFrame.segment(col("idx"), fs, segSize))
      .groupBy("subject", "segment")
      .agg(
        count(lit(1)).as("__seg_len"),
        count(col("beat")).as("n_detected"),
        count(col("artifact")).as("n_artifact"),
        min(col("ts_us")).as("first_ts_us"))

  /** Per-segment artifact summary (reference SQA.py:237-277).
    * Output: subject, segment, n_detected, n_artifact, pct_artifact,
    * first_ts_us. */
  def getArtifacts(signal: DataFrame, fs: Int, segSize: Int): DataFrame =
    segBase(signal, fs, segSize)
      .select("subject", "segment", "n_detected", "n_artifact", "first_ts_us")
      .withColumn("pct_artifact",
        when(col("n_detected") > 0,
          bround(col("n_artifact").cast("double") / col("n_detected") * 100, 2)))

  /** Hegarty-Craver et al. (2018) artifact classification
    * (reference SQA.py:342-389) in pure window form (SURVEY K12): each IBI
    * is validated against [26/32, 44/32] x a rolling median estimate — the
    * median of the 6 preceding IBIs, seeded for the first 6 beats with an
    * auto initial estimate (mean of the 6 consecutive IBIs with the
    * smallest mean successive difference).
    *
    * Input: beat rows. Output adds `ibi`, `hegarty_artifact` (1/null).
    * The first beat of each subject is valid by definition. */
  def hegartyArtifacts(beats: DataFrame, fs: Int): DataFrame = {
    val withIbi = ibis(beats, fs)
      .withColumn("__n", row_number().over(wSub) - 2) // IBI ordinal n (first beat: -1)
    // successive difference of IBIs; 6-wide valid-mode moving average
    val sd = abs(col("ibi") - lag(col("ibi"), 1).over(wSub))
    val withMa = withIbi
      .withColumn("__sd", sd)
      .withColumn("__ma6",
        when(count(col("__sd")).over(wSub.rowsBetween(0, 5)) === 6,
          avg(col("__sd")).over(wSub.rowsBetween(0, 5))))
    // argmin of the valid MA (first occurrence), then mean of the 6 IBIs
    // starting at that position: rows __n = m+1 .. m+6 (ibis[m..m+5]).
    val wMin = Window.partitionBy("subject")
      .orderBy(col("__ma6").asc_nulls_last, col("__n"))
    val withSeed = withMa
      .withColumn("__m", first(when(col("__ma6").isNotNull, col("__n") - 1)).over(
        wMin.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("__first_ibi",
        avg(when(col("__n").between(col("__m"), col("__m") + 5), col("ibi")))
          .over(Window.partitionBy("subject")))
    // IBI estimate: median of 6 preceding IBIs; first 6 seeded with first_ibi
    val prior6 = collect_list(col("ibi")).over(wSub.rowsBetween(-6, -1))
    val est = when(col("__n") >= 6, arrayMedian(prior6))
      .otherwise(arrayMedian(concat(array(col("__first_ibi")), prior6)))
    withSeed
      .withColumn("__est", est)
      .withColumn("hegarty_artifact",
        when(col("ibi").isNotNull &&
          !(col("ibi").between(lit(26d / 32) * col("__est"), lit(44d / 32) * col("__est"))), 1))
      .drop("__n", "__sd", "__ma6", "__m", "__first_ibi", "__est")
  }

  /** Exact median of an array column (nulls excluded), matching
    * numpy median: middle element, or mean of the two middle elements. */
  def arrayMedian(arr: Column): Column = {
    val a = array_sort(filter(arr, (x: Column) => x.isNotNull))
    val n = size(a)
    when(n === 0, lit(null).cast("double")).otherwise(
      when(n % 2 === 1, element_at(a, (n / 2 + 1).cast("int")).cast("double"))
        .otherwise((element_at(a, (n / 2).cast("int")) +
          element_at(a, (n / 2 + 1).cast("int"))).cast("double") / 2.0))
  }

  /** Per-segment missing-beat summary (reference SQA.py:503-629).
    *
    * Expected HR per segment = median over the artifact-free 5-beat-window
    * median HRs (`_window_medians`, SQA.py:1751-1764), with neighbor-
    * segment half-slice fallback, carry-forward of the last valid estimate,
    * leading backfill, and last-partial-segment rescale.
    *
    * Output: subject, segment, n_detected, n_expected, n_missing,
    * pct_missing. */
  def getMissing(signal: DataFrame, fs: Int, segSize: Int): DataFrame =
    withMissing(signal, fs, segSize)
      .select("subject", "segment", "n_detected", "n_expected", "n_missing", "pct_missing")

  /** Full per-segment frame: segBase counts + expected/missing-beat columns
    * — the single-pass core shared by getMissing and computeMetrics. */
  private def withMissing(signal: DataFrame, fs: Int, segSize: Int): DataFrame = {
    val segRows = fs.toLong * segSize
    val half = (segSize * 0.5).toInt

    val seg = signal.withColumn("segment", SignalFrame.segment(col("idx"), fs, segSize))
      .withColumn("__pos", col("idx") - (col("segment") - 1) * segRows)
    // per-segment counts (last segment may be partial) — one scan for all
    val segLens = segBase(signal, fs, segSize)

    // 5-beat windows over beat rows: medians of 60000/IBI. Segment length
    // rides each row as a window count BEFORE the beat filter — joining
    // the aggregated lengths back would re-evaluate the segment subtree.
    val beats = ibis(beatRows(
      seg.withColumn("__seg_len",
        count(lit(1)).over(Window.partitionBy("subject", "segment")))), fs)
      .withColumn("hr", lit(60000.0) / col("ibi"))
    val w5 = wSub.rowsBetween(0, 4)
    val winMed = beats
      .withColumn("__cnt5", count(lit(1)).over(w5))
      .withColumn("__same_seg", min(col("segment")).over(w5) === max(col("segment")).over(w5))
      .withColumn("__art_free", count(col("artifact")).over(w5) === 0)
      .withColumn("__in_last_half",
        min(when(col("__pos") >= col("__seg_len") - half, 1).otherwise(0)).over(w5) === 1)
      .withColumn("__in_first_half",
        min(when(col("__pos") < half, 1).otherwise(0)).over(w5) === 1)
      .withColumn("__med_hr", percentile(col("hr"), lit(0.5)).over(w5))
      .filter(col("__cnt5") === 5 && col("__same_seg") && col("__art_free"))

    // median of window medians per segment AND per half-slice in ONE
    // aggregation pass (percentile skips nulls, so the half-slice medians
    // are conditional projections) — three separate filtered groupBys
    // would re-evaluate the whole beats subplan three times.
    val segMed = winMed.groupBy("subject", "segment")
      .agg(
        percentile(col("__med_hr"), lit(0.5)).as("__exp0"),
        percentile(when(col("__in_last_half"), col("__med_hr")), lit(0.5)).as("__half2"),
        percentile(when(col("__in_first_half"), col("__med_hr")), lit(0.5)).as("__half1"))

    val wSeg = Window.partitionBy("subject").orderBy("segment")
    val wSegAll = wSeg.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val merged = segLens
      .join(segMed, Seq("subject", "segment"), "left")
      .withColumn("__exp_raw",
        coalesce(col("__exp0"), lag(col("__half2"), 1).over(wSeg),
          lead(col("__half1"), 1).over(wSeg)))
      // carry-forward of the last valid estimate
      .withColumn("__exp_hr",
        last(col("__exp_raw"), ignoreNulls = true)
          .over(wSeg.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__is_last", col("segment") === max(col("segment")).over(wSegAll))
      .withColumn("__n_exp0",
        bround(col("__exp_hr") * segSize / 60.0, 0).cast("long"))
      // last-partial-segment rescale
      .withColumn("n_expected",
        when(col("__is_last"),
          bround(col("__n_exp0") * (col("__seg_len").cast("double") / fs / segSize), 0).cast("long"))
          .otherwise(col("__n_exp0")))
      // leading backfill of un-estimable segments
      .withColumn("n_expected",
        coalesce(col("n_expected"),
          first(col("n_expected"), ignoreNulls = true).over(
            wSeg.rowsBetween(Window.currentRow, Window.unboundedFollowing))))
      .withColumn("n_missing", greatest(col("n_expected") - col("n_detected"), lit(0L)))
      .withColumn("pct_missing",
        bround(col("n_missing").cast("double") / col("n_expected") * 100, 2))
    merged
  }

  /** Segmented SQA metrics (reference SQA.py:161-197): one per-segment
    * aggregation carries detected/artifact counts AND the expected/missing
    * estimates — the signal frame is scanned once (plus the beats-only
    * median subplan), not once per metric family. */
  def computeMetrics(signal: DataFrame, fs: Int, segSize: Int, minHr: Double = 40): DataFrame =
    withMissing(signal, fs, segSize)
      .withColumn("pct_artifact",
        when(col("n_detected") > 0,
          bround(col("n_artifact").cast("double") / col("n_detected") * 100, 2)))
      .withColumn("invalid",
        when(col("n_detected") < (minHr * segSize / 60).toInt ||
          col("n_detected") > 220, 1))
      .select("subject", "segment", "first_ts_us", "n_detected", "n_expected",
        "n_missing", "pct_missing", "n_artifact", "pct_artifact", "invalid")

  /** Rolling-window SQA metrics (reference SQA.py:115-175): windows start
    * every `stepS` seconds, `windowS` seconds wide (possibly truncated at
    * the recording end). Expected HR = median of the artifact-free 5-beat
    * window medians within the slice, with carry-forward of the last valid
    * estimate across windows; no neighbor fallback, rescale, or backfill
    * (those are segmented-path semantics).
    *
    * Relational form: each sample explodes to the <= windowS/stepS windows
    * containing it (bounded), then one grouped aggregation per window and
    * one beats-exploded pass for the 5-beat medians. */
  def computeMetricsRolling(signal: DataFrame, fs: Int, windowS: Int,
      stepS: Int, minHr: Double = 40, segSize: Int = 60): DataFrame = {
    val step = fs.toLong * stepS
    val win = fs.toLong * windowS
    val winOf = (i: Column) => {
      val whi = (i / step).cast("long")
      // lowest containing window needs FLOOR semantics: cast("long") truncates
      // toward zero, which would drop idx in (win-step, win) from window 0.
      // For i >= win the quotient is non-negative, where trunc == floor.
      val wlo = when(i < win, lit(0L))
        .otherwise(((i - win) / step).cast("long") + 1)
      explode(sequence(wlo, whi))
    }
    // IBI as a window expression on the full frame (previous beat's idx via
    // ignoreNulls last) — the beats-frame self-join form evaluated the
    // signal subtree twice before the bounded explode.
    val wPrev = wSub.rowsBetween(Window.unboundedPreceding, -1)
    val withIbi = signal.withColumn("ibi",
      when(col("beat") === 1,
        (col("idx") - last(when(col("beat") === 1, col("idx")),
          ignoreNulls = true).over(wPrev)).cast("double") / fs * 1000.0))
    val exploded = withIbi.withColumn("w", winOf(col("idx")))
    val base = exploded.groupBy("subject", "w")
      .agg(
        count(col("beat")).as("n_detected"),
        count(col("artifact")).as("n_artifact"),
        min(col("ts_us")).as("first_ts_us"))
    // 5-beat medians within each window slice
    val w5 = Window.partitionBy("subject", "w").orderBy("idx").rowsBetween(0, 4)
    val beatsExploded = exploded.filter(col("beat") === 1)
      .withColumn("hr", lit(60000.0) / col("ibi"))
      .withColumn("__cnt5", count(lit(1)).over(w5))
      .withColumn("__art_free", count(col("artifact")).over(w5) === 0)
      .withColumn("__med_hr", percentile(col("hr"), lit(0.5)).over(w5))
      .filter(col("__cnt5") === 5 && col("__art_free"))
    val expRaw = beatsExploded.groupBy("subject", "w")
      .agg(percentile(col("__med_hr"), lit(0.5)).as("__exp_raw"))
    val wW = Window.partitionBy("subject").orderBy("w")
    base.join(expRaw, Seq("subject", "w"), "left")
      .withColumn("__exp_hr", last(col("__exp_raw"), ignoreNulls = true)
        .over(wW.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n_expected",
        bround(col("__exp_hr") * windowS / 60.0, 0).cast("long"))
      .withColumn("n_missing", greatest(col("n_expected") - col("n_detected"), lit(0L)))
      .withColumn("pct_missing",
        bround(col("n_missing").cast("double") / col("n_expected") * 100, 2))
      .withColumn("pct_artifact", when(col("n_detected") > 0,
        bround(col("n_artifact").cast("double") / col("n_detected") * 100, 2)))
      .withColumn("invalid",
        when(col("n_detected") < (minHr * segSize / 60).toInt ||
          col("n_detected") > 220, 1))
      .select(col("subject"), (col("w") + 1).as("moving_window"), col("first_ts_us"),
        col("n_detected"), col("n_expected"), col("n_missing"), col("pct_missing"),
        col("n_artifact"), col("pct_artifact"), col("invalid"))
  }

  /** Second-by-second HR/IBI (Graham 1978; reference SQA.py:631-723).
    * Each 1-s bucket is evaluated over beats in the previous+current+next
    * second (current second only for s=0); mean HR is the harmonic-style
    * mean 1/mean(1/hr) == 60000/mean(ibi).
    *
    * Beat pairs (prev,cur) belong to evaluation windows s in
    * [bucket(cur), bucket(prev)+1] — at most two, so the explode is bounded.
    */
  def getSeconds(signal: DataFrame, fs: Int): DataFrame = {
    val secs = signal
      .withColumn("__sec", (col("idx") / fs).cast("long"))
      .groupBy("subject", "__sec")
      .agg(count(col("beat")).as("n_beats"), min(col("ts_us")).as("first_ts_us"))
    val pairs = ibis(beatRows(signal), fs)
      .withColumn("__prev_idx", lag(col("idx"), 1).over(wSub))
      .filter(col("ibi").isNotNull)
      .withColumn("__prev_sec", (col("__prev_idx") / fs).cast("long"))
      .withColumn("__cur_sec", (col("idx") / fs).cast("long"))
      .withColumn("__s", explode(array_distinct(
        array(col("__cur_sec"), col("__prev_sec") + 1))))
      // pair is in window s iff prev_idx >= (s-1)*fs and cur_idx < (s+1)*fs
      .filter(col("__s") >= col("__cur_sec") && col("__s") <= col("__prev_sec") + 1)
      .groupBy(col("subject"), col("__s").as("__sec"))
      .agg(
        (sum(col("ibi").cast(DecimalType(24, 4))).cast("double") / count(col("ibi")))
          .as("mean_ibi"))
    secs.join(pairs, Seq("subject", "__sec"), "left")
      .select(
        col("subject"), (col("__sec") + 1).as("second"), col("first_ts_us"),
        (lit(60000.0) / col("mean_ibi")).as("mean_hr"),
        col("mean_ibi"), col("n_beats"))
  }
}
