package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.{Decimate, PpgDetectors}
import graft.ops.BeatEdits

class EditSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  /** 20-sample recording, beats at 2, 6, 10, 14, 18. */
  private def signal = {
    import spark.implicits._
    (0L until 20L).map { i =>
      (1L, i, if (i % 4 == 2) Some(1) else None)
    }.toDF("subject", "idx", "beat").withColumn("value", col("idx").cast("double"))
  }

  test("applyEdits: DELETE marks +-1 neighborhood, ADD overrides unusable") {
    import spark.implicits._
    val pe = Seq((1L, 6L, "DELETE"), (1L, 12L, "ADD")).toDF("subject", "x", "editType")
    val re = Seq((1L, 11L, 13L)).toDF("subject", "from", "to")
    val out = BeatEdits.applyEdits(signal, pe, re)
      .collect().map(r => r.getLong(1) ->
        (Option(r.getAs[Any]("edited")), Option(r.getAs[Any]("deleted_beat")),
          Option(r.getAs[Any]("added_beat")), Option(r.getAs[Any]("unusable")))).toMap
    // DELETE at 6 marks samples 5,6,7 (merge_asof nearest tol 1 quirk)
    assert(out(5)._2.contains(1) && out(6)._2.contains(1) && out(7)._2.contains(1))
    assert(out(6)._1.isEmpty) // beat at 6 deleted
    // ADD at 12 marks 11,12,13 added; Edited=1 beats unusable null
    assert(out(12)._3.contains(1) && out(12)._1.contains(1))
    assert(out(11)._4.contains(1) && out(11)._1.contains(1)) // ADD wins over unusable
    // untouched beat keeps Edited = Beat
    assert(out(2)._1.contains(1))
    assert(out(3)._1.isEmpty)
  }

  test("editedIbis nulls the first IBI after an unusable run end") {
    import spark.implicits._
    val pe = spark.emptyDataset[(Long, Long, String)].toDF("subject", "x", "editType")
    val re = Seq((1L, 7L, 8L)).toDF("subject", "from", "to")
    val out = BeatEdits.editedIbis(BeatEdits.applyEdits(signal, pe, re), fs = 4)
      .collect().map(r => r.getLong(1) -> Option(r.getAs[Any]("ibi_ms"))).toMap
    // beats 2,6,10,14,18; unusable run [7,8] ends at 8 -> first IBI row
    // after 8 is beat 10 -> nulled; others intact (1000 ms each)
    assert(out(2).isEmpty) // first beat: no IBI
    assert(out(6).contains(1000.0))
    assert(out(10).isEmpty) // nulled by run end
    assert(out(14).contains(1000.0))
    assert(out(18).contains(1000.0))
  }

  test("editedIbis: ADD landing on an unusable run END nulls the NEXT beat") {
    import spark.implicits._
    // ADD at x=8 marks samples 7,8,9 (merge_asof tol-1 quirk) as added
    // beats; range [6,8] makes 8 a run END that is ALSO a beat row.
    // searchsorted side='right': the end at 8 belongs to the interval of
    // the beat AFTER it, so beat 9's IBI is nulled and beat 8's is kept.
    val pe = Seq((1L, 8L, "ADD")).toDF("subject", "x", "editType")
    val re = Seq((1L, 6L, 8L)).toDF("subject", "from", "to")
    val out = BeatEdits.editedIbis(BeatEdits.applyEdits(signal, pe, re), fs = 4)
      .collect().map(r => r.getLong(1) -> Option(r.getAs[Any]("ibi_ms"))).toMap
    // final beats: 2, 7, 8, 9 (added), 10, 14, 18 (6's beat fell unusable)
    assert(out(2).isEmpty)
    assert(out(7).contains(1250.0))
    assert(out(8).contains(250.0))  // own end mark NOT counted against itself
    assert(out(9).isEmpty)          // first IBI after the run end -> nulled
    assert(out(10).contains(250.0))
    assert(out(14).contains(1000.0) && out(18).contains(1000.0))
  }

  test("vanGent peaks per run, with HeartPy's slicing quirk ported faithfully") {
    import spark.implicits._
    // fs=4 -> MA window 3. Two 2-sample above-threshold runs at {2,3} and
    // {8,9}. HeartPy's peakedges quirk moves each run's LAST element into
    // the NEXT slice, so the slices become {2} and {3,8,9} -> peaks 2 and 9.
    val vals = Array(0.0, 0.0, 6.0, 8.0, 0.0, 0.0, 0.0, 0.0, 7.0, 9.0, 0.0, 0.0, 0.0, 0.0)
    val df = vals.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }
      .toSeq.toDF("subject", "idx", "value")
    val peaks = PpgDetectors.vanGent(df, fs = 4).collect().map(_.getLong(1)).toSet
    assert(peaks == Set(2L, 9L))

    // Isolated single-sample "runs" collapse into one slice -> only the
    // global argmax of the merged slice survives (reference behavior).
    val vals2 = Array(0.0, 0.0, 1.0, 8.0, 2.0, 0.0, 0.0, 0.0, 1.0, 9.0, 3.0, 0.0, 0.0, 0.0)
    val df2 = vals2.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }
      .toSeq.toDF("subject", "idx", "value")
    val peaks2 = PpgDetectors.vanGent(df2, fs = 4).collect().map(_.getLong(1)).toSet
    assert(peaks2 == Set(9L))
  }

  test("tonicSclKernel masks SCR intervals per the reference's global-index quirk") {
    val fs = 4
    // 2 segments of 10 s (40 samples each); baseline 2.0 with one SCR
    // bump rising over samples 8-12 to peak 3.0 at 12
    val x = Array.tabulate(80) { i =>
      if (i >= 8 && i <= 12) 2.0 + (i - 8) * 0.25
      else if (i >= 13 && i <= 16) 3.0 - (i - 12) * 0.25
      else 2.0
    }
    val out = graft.sqa.Scr.tonicSclKernel(fs, 10)(x)
    assert(out.length == 2)
    // segment 1: the rise [8..peak] is masked -> mean of remaining 2.0s
    // plus the (unmasked) decay tail samples
    assert(out(0) > 2.0 && out(0) < 2.2)
    // segment 2 re-applies the same GLOBAL indices locally (reference
    // quirk): positions 8..12 of segment 2 are masked even though flat
    assert(math.abs(out(1) - 2.0) < 1e-12)
  }

  test("firwin: DC gain 1, symmetric, matches scipy head values") {
    val h = Decimate.firwin(129, 0.1125) // cutoff 0.45/4
    assert(math.abs(h.sum - 1.0) < 1e-12)
    assert((0 until 64).forall(i => math.abs(h(i) - h(128 - i)) < 1e-15))
    // center tap of a windowed-sinc lowpass is the largest
    assert(h(64) == h.max && h(64) > 0.1 * 0.8)
  }

  test("decimate rescale: rint half-even + clip + dedupe, IBIs on ds grid") {
    import spark.implicits._
    val sig = (0L until 40L).map(i => (1L, i)).toDF("subject", "idx")
    // beats at 6 (->2), 10 (->2 via 2.5 half-even), 22 (->6), 38 (->10 clip 9)
    val beats = Seq((1L, 6L), (1L, 10L), (1L, 22L), (1L, 38L)).toDF("subject", "idx")
    val marks = Decimate.rescaleIndices(beats, 4, Decimate.dsLengths(sig, 4))
    val got = marks.collect().map(_.getLong(1)).sorted.toSeq
    assert(got == Seq(2L, 6L, 9L)) // 6/4=1.5->2 (half-even), 10/4=2.5->2, dedupe; 38/4=9.5->10 clip->9
    val ibis = Decimate.ibisFromMarks(marks, 250).collect()
      .map(r => r.getLong(1) -> Option(r.getAs[Any]("ibi_ms"))).toMap
    assert(ibis(2).isEmpty && ibis(6).contains(16.0) && ibis(9).contains(12.0))
  }
}
