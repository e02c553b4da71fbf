package graft.sqa

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.kernels.Correction

/** Spark surface for the beat-correction FSM (SURVEY K14): per-recording
  * kernel run + the relational per-segment summary
  * (reference `SQA.Cardio.get_corrected`, pipeline/SQA.py:1417-1512).
  */
object Corrected {

  case class BeatIn(subject: Long, idx: Long)
  case class Out(subject: Long, side: Int, pos: Int, ibi_ms: Option[Double],
      ibi: Option[Double], beat: Double, correction: Option[Int],
      flag: Option[String])

  /** Run the FSM per subject over detected-beat sample indices. Output is
    * union-tagged: side 0 = original table, side 1 = corrected table. */
  def correctionRows(beatRows: DataFrame, fs: Int,
      p: Correction.Params = Correction.Params()): DataFrame = {
    val spark = beatRows.sparkSession
    import spark.implicits._
    // beat tables carry no value column; the runner's value slot is unused
    graft.core.KernelRunner.perRecording(beatRows, "idx") { (subj, ix, _) =>
      val beats = ix.map(_.toDouble)
      val (orig, corr) = Correction.correctInterval(fs, p)(beats)
      orig.iterator.map(r =>
        Out(subj, 0, r.pos, r.ibiMs, r.ibi, r.beat, Some(r.correction), None)) ++
        corr.iterator.map(r =>
          Out(subj, 1, r.pos, r.ibiMs, r.ibi, r.beat, None, r.flag))
    }.toDF()
  }

  /** Per-segment flag summary (`get_corrected`'s `combined` frame): counts
    * of each corrected flag + number/percentage of corrected original
    * beats. Segment = ceil(beat / (segSize*fs)); the flag columns are the
    * fixed four-flag superset (the reference pivots only flags present). */
  def summary(rows: DataFrame, fs: Int, segSize: Int): DataFrame = {
    val seg = ceil(col("beat") / (segSize.toLong * fs)).cast("long").as("segment")
    val orig = rows.filter(col("side") === 0)
      .withColumn("segment", seg)
      .groupBy("subject", "segment")
      .agg(
        sum(col("correction")).as("n_corrected"),
        bround(sum(col("correction")).cast("double") / count(lit(1)) * 100, 2)
          .as("pct_corrected"))
    val corr = rows.filter(col("side") === 1)
      .withColumn("segment", seg)
      .groupBy("subject", "segment")
      .pivot("flag", Seq("Correct", "Short", "Long", "Extra Long"))
      .count()
      .na.fill(0L, Seq("Correct", "Short", "Long", "Extra Long"))
      .withColumnRenamed("Correct", "n_correct")
      .withColumnRenamed("Short", "n_short")
      .withColumnRenamed("Long", "n_long")
      .withColumnRenamed("Extra Long", "n_extra_long")
    corr.join(orig, Seq("subject", "segment"))
      .select("subject", "segment", "n_correct", "n_short", "n_long",
        "n_extra_long", "n_corrected", "pct_corrected")
  }
}
