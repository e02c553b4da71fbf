package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Beat-Editor edit application (SURVEY K17/K18).
  *
  * Reference semantics (physioview.py:1690-1832, sample-mapped path):
  * point edits `(x, editType ∈ ADD|DELETE)` are nearest-matched onto the
  * sample grid with tolerance 1 — pandas `merge_asof(samples, edits,
  * nearest, tolerance=1)`, so ONE edit marks every sample within distance
  * 1 (a faithful reference quirk), with backward ties winning. Range edits
  * `(from, to)` mark `Unusable` spans inclusively. Flag application order
  * (last wins): Edited := Beat, then DELETE→null, then Unusable→null,
  * then ADD→1.
  *
  * Spark-first: the point-edit map is [[AsofJoin]] (one shuffle, linear);
  * range edits explode to their covered samples (spans are bounded by the
  * editor's segment length) and equi-join — no range-join explosion.
  */
object BeatEdits {

  /** @param signal (subject, idx, beat, ...) canonical frame
    * @param pointEdits (subject, x LONG, editType) — x unique per subject
    * @param rangeEdits (subject, from LONG, to LONG) unusable spans
    * @return signal columns + edited / deleted_beat / added_beat / unusable
    */
  def applyEdits(signal: DataFrame, pointEdits: DataFrame,
      rangeEdits: DataFrame): DataFrame = {
    // Reference: sort + drop_duplicates(keep='last') per sample, then asof.
    val wDedup = Window.partitionBy("subject", "x")
      .orderBy(col("editType").desc)
    val edits = pointEdits
      .withColumn("__rn", row_number().over(wDedup))
      .filter(col("__rn") === 1)
      .select("subject", "x", "editType")

    val mapped = AsofJoin.join(
      signal, edits,
      keys = Seq("subject"), leftT = "idx", rightT = "x",
      rightCols = Seq("editType" -> "edit_type"),
      tolerance = Some(1L), direction = "nearest")

    // Inclusive [from, to] spans; one row per covered sample, deduplicated
    // so overlapping spans mark once.
    val unusable = rangeEdits
      .select(col("subject"), explode(sequence(col("from"), col("to"))).as("idx"))
      .distinct()
      .withColumn("unusable", lit(1))

    mapped.join(unusable, Seq("subject", "idx"), "left")
      .withColumn("deleted_beat", when(col("edit_type") === "DELETE", 1))
      .withColumn("added_beat", when(col("edit_type") === "ADD", 1))
      .withColumn("edited",
        when(col("edit_type") === "ADD", 1)
          .when(col("edit_type") === "DELETE", lit(null))
          .when(col("unusable") === 1, lit(null))
          .otherwise(col("beat")))
      .drop("x_matched", "edit_type")
  }

  /** Edited-IBI cleanup (reference callbacks.py:2459-2478): recompute IBIs
    * over the final (`edited == 1`) beats, then null the FIRST non-null IBI
    * after each unusable RUN END (run ends = last sample of each contiguous
    * unusable span; the reference's searchsorted walk).
    *
    * Run-end counting is one union-tagged cumulative window — the same
    * shuffle-once shape as the as-of join: an IBI row is nulled iff at
    * least one run end lies in [prev_ibi_row_idx, idx).
    *
    * @param edited output of [[applyEdits]] (needs edited, unusable)
    * @return (subject, idx, ibi_ms) one row per final beat
    */
  def editedIbis(edited: DataFrame, fs: Int): DataFrame = {
    // Unusable rows and final-beat rows are DISJOINT (applyEdits nulls
    // `edited` on unusable samples), so one filtered pass carries both
    // roles — the union-of-two-filters form evaluated the whole
    // edit-application subtree twice. A run end is an unusable sample
    // whose next unusable sample (beats never interrupt a contiguous
    // span) is not idx+1.
    val comb = edited
      .filter(col("unusable") === 1 || col("edited") === 1)
      .select(col("subject"), col("idx"), col("unusable"), col("edited"))
    val wS = Window.partitionBy("subject").orderBy("idx")
    val nextUn = first(when(col("unusable") === 1, col("idx")), ignoreNulls = true)
      .over(wS.rowsBetween(1, Window.unboundedFollowing))
    val isEnd = col("unusable") === 1 &&
      (nextUn.isNull || nextUn > col("idx") + 1)
    // Strictly-preceding frame: a row never counts its OWN end mark. The
    // two roles are not disjoint after all — applyEdits' when-chain puts
    // ADD before Unusable, so an ADD landing on an unusable sample yields
    // edited=1 AND unusable=1; if that sample closes a run, searchsorted
    // side='right' semantics put the end in the NEXT beat's interval, not
    // this one's. __cum only surfaces on beat rows (directly and via lag),
    // so excluding the current row is exactly that semantics.
    val wCum = wS.rowsBetween(Window.unboundedPreceding, -1)
    val withCum = comb
      .withColumn("__cum", sum(when(isEnd, 1L).otherwise(0L)).over(wCum))
      .filter(col("edited") === 1)

    val wB = Window.partitionBy("subject").orderBy("idx")
    val ibi = (col("idx") - lag(col("idx"), 1).over(wB)).cast("double") / fs * 1000.0
    // Threshold = cum at the previous NON-null-IBI row. Non-null rows are
    // all beats but the first, so for the 2nd beat (the first non-null IBI,
    // whose preceding beat is a null-IBI row outside the reference's
    // searchsorted array) the threshold is 0; beyond that, the previous
    // beat is itself non-null and plain lag applies.
    withCum
      .withColumn("__ibi", ibi)
      .withColumn("__rn", row_number().over(wB))
      .withColumn("__thr",
        when(col("__rn") === 2, lit(0L)).otherwise(lag(col("__cum"), 1).over(wB)))
      .withColumn("ibi_ms",
        when(col("__ibi").isNotNull && col("__cum") > col("__thr"), lit(null))
          .otherwise(col("__ibi")))
      .select("subject", "idx", "ibi_ms")
  }
}
