package graft.core

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact-median typed `Aggregator` (SURVEY §4.3 #3 — A7/A9/W4/W5 class).
  *
  * The relational surface uses Spark's built-in exact `percentile`
  * (codegen'd, partial-aggregated); this Aggregator is the typed-Dataset
  * counterpart for `KeyValueGroupedDataset.agg` pipelines, with numpy
  * semantics: null-skipping, interpolating midpoint on even counts, null
  * on empty groups.
  *
  * Buffer is a prepend list (O(1) per row, concat on merge); the sort
  * happens once per group at finish. Memory is bounded by the group size —
  * the same contract as any exact median.
  */
class ExactMedian extends Aggregator[java.lang.Double, List[Double], java.lang.Double] {

  override def zero: List[Double] = Nil

  override def reduce(buf: List[Double], v: java.lang.Double): List[Double] =
    if (v == null) buf else v.doubleValue :: buf

  override def merge(a: List[Double], b: List[Double]): List[Double] = a ::: b

  override def finish(buf: List[Double]): java.lang.Double =
    if (buf.isEmpty) null
    else {
      val s = buf.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }

  override def bufferEncoder: Encoder[List[Double]] = ExpressionEncoder[List[Double]]()

  override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
}

object ExactMedian {
  /** DataFrame-surface form: `df.agg(ExactMedian(col("x")))`. */
  def apply(c: Column): Column = udaf(new ExactMedian, Encoders.DOUBLE).apply(c)
}
