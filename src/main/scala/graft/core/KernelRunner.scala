package graft.core

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Sorted-group kernel contract (SURVEY §4.3 #2): the engine's single
  * mechanism for the reference's sequential physical operators (IIR
  * filtfilt, beat-detector FSMs, correction FSM, ...).
  *
  * Each recording `(subject)` becomes one idx-sorted in-memory array that a
  * pure Scala kernel transforms — the Spark-native equivalent of a scipy
  * kernel over a numpy array. One shuffle on `subject` (groupByKey); the
  * kernel is a deterministic function, so the operator stays a narrow
  * typed transformation in the plan.
  *
  * Memory contract: one recording per task. At 100 TB, long recordings are
  * range-bucketed by idx with halo rows equal to the kernel's warm-up
  * length (filter padlen / detector refractory window), so no task ever
  * materializes an unbounded group; the bucketed variant reuses these same
  * kernels on each (bucket + halo) slice.
  */
object KernelRunner {

  case class Sample(subject: Long, idx: Long, value: Double)
  case class ValueOut(subject: Long, idx: Long, out: Double)
  case class IdxOut(subject: Long, idx: Long)

  /** Run an array→array kernel per recording (e.g., filtfilt): emits one
    * output value per input sample. Input needs columns
    * (subject, idx, `valueCol`). Output: (subject, idx, `outCol`). */
  def transformValues(signal: DataFrame, valueCol: String, outCol: String)(
      kernel: Array[Double] => Array[Double]): DataFrame = {
    val spark = signal.sparkSession
    import spark.implicits._
    val ds: Dataset[Sample] = signal
      .select(col("subject").cast("long"), col("idx").cast("long"),
        col(valueCol).cast("double").as("value"))
      .as[Sample]
    ds.groupByKey(_.subject)
      .flatMapGroups { (subj, it) =>
        val rows = it.toArray.sortBy(_.idx)
        val out = kernel(rows.map(_.value))
        rows.iterator.zip(out.iterator).map { case (r, v) => ValueOut(subj, r.idx, v) }
      }
      .toDF("subject", "idx", outCol)
  }

  /** Run an array→indices kernel per recording (e.g., a beat detector):
    * emits the sample indices the kernel selects (positions into the
    * idx-sorted array are mapped back to `idx` values). */
  def detectIndices(signal: DataFrame, valueCol: String)(
      kernel: Array[Double] => Array[Int]): DataFrame = {
    val spark = signal.sparkSession
    import spark.implicits._
    val ds: Dataset[Sample] = signal
      .select(col("subject").cast("long"), col("idx").cast("long"),
        col(valueCol).cast("double").as("value"))
      .as[Sample]
    ds.groupByKey(_.subject)
      .flatMapGroups { (subj, it) =>
        val rows = it.toArray.sortBy(_.idx)
        kernel(rows.map(_.value)).iterator.map(p => IdxOut(subj, rows(p).idx))
      }
      .toDF("subject", "idx")
  }
}
