package graft.kernels

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** PPG beat detectors (SURVEY K8).
  *
  * van Gent et al. (2019) adaptive thresholding (reference
  * PPG.py:174-233, via HeartPy): centered 0.75 s moving average (scipy
  * uniform_filter1d, reflect edges) raised by `mean(ma/100)*ma_perc`;
  * contiguous above-threshold runs; per run the FIRST argmax — including
  * HeartPy's slicing quirk where run boundaries land on the LAST sample of
  * the previous contiguous segment (`peakedges` positions are diff-gap
  * indices, so each "run" slice starts at the previous run's final
  * element).
  *
  * Fully relational: the MA is a fixed-offset lag/lead sum (reflect edges
  * resolved against tiny per-subject head/tail arrays), runs are one
  * cumulative window, argmax one row_number. Two shuffles total (subject
  * exchange reused across every window).
  *
  * Determinism pin: the MA is rounded to 9 digits before thresholding so
  * double reassociation can never flip a comparison across engines; the
  * global mean uses exact decimal summation.
  */
object PpgDetectors {

  /** Centered uniform filter of width `w = (windowLenS*fs).toInt` with
    * scipy 'reflect' edges, as `__ma` (rounded to 9 digits). Precondition:
    * every recording has at least `w` samples. */
  def reflectUniformMa(signal: DataFrame, fs: Int,
      windowLenS: Double = 0.75): DataFrame = {
    val w = (windowLenS * fs).toInt
    require(w >= 1, "window must span at least one sample")
    val lo = w / 2
    // Head/tail sample arrays (w values each) resolve reflected edge
    // indices; tiny per-subject rows, broadcast-joined back.
    val wAll = Window.partitionBy("subject")
    val bounds = signal
      .withColumn("__mxw", max(col("idx")).over(wAll))
      .groupBy("subject").agg(
        max(col("idx")).as("__mx"),
        count(lit(1)).as("__n"),
        sort_array(collect_list(when(col("idx") < w,
          struct(col("idx"), col("value"))))).getField("value").as("__head"),
        sort_array(collect_list(when(col("idx") > col("__mxw") - w,
          struct(col("idx"), col("value"))))).getField("value").as("__tail"))
    val df = signal.join(broadcast(bounds), Seq("subject"))
    val wS = Window.partitionBy("subject").orderBy("idx")
    def term(k: Int): Column = {
      val pos = col("idx") + k
      val inRange =
        if (k < 0) lag(col("value"), -k).over(wS)
        else if (k > 0) lead(col("value"), k).over(wS)
        else col("value")
      when(pos < 0, element_at(col("__head"), (-pos).cast("int")))
        .when(pos > col("__mx"),
          element_at(col("__tail"), (col("__n") + w - pos).cast("int")))
        .otherwise(inRange)
    }
    val sumTerms = (-lo until (w - lo)).map(term).reduce(_ + _)
    df.withColumn("__ma", bround(sumTerms / w, 9))
      .drop("__mx", "__n", "__head", "__tail")
  }

  /** van Gent adaptive-threshold beats: (subject, idx, value) per detected
    * pulse peak. */
  def vanGent(signal: DataFrame, fs: Int, maPerc: Double = 20.0): DataFrame = {
    val withMa = reflectUniformMa(signal, fs, 0.75)
    val mn = withMa.groupBy("subject").agg(
      ((sum(col("__ma").cast(DecimalType(28, 10))).cast("double") /
        count(lit(1))) / 100.0 * maPerc).as("__mn"))
    val above = withMa.join(mn, Seq("subject"))
      .filter(col("value") > col("__ma") + col("__mn"))
    val wA = Window.partitionBy("subject").orderBy("idx")
    // HeartPy quirk: a gap AFTER position p makes p the first element of
    // the NEXT slice, so the run id is the INCLUSIVE cumulative gap count.
    val runs = above
      .withColumn("__gap",
        when(lead(col("idx"), 1).over(wA) - col("idx") > 1, 1).otherwise(0))
      .withColumn("__run",
        sum(col("__gap")).over(wA.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wR = Window.partitionBy(col("subject"), col("__run"))
      .orderBy(col("value").desc, col("idx"))
    runs.withColumn("__rn", row_number().over(wR))
      .filter(col("__rn") === 1)
      .select("subject", "idx", "value")
  }
}
