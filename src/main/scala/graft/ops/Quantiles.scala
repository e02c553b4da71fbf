package graft.ops

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Percentile-threshold aggregates with a conf-selectable scale path.
  *
  * The EXACT form (`percentile`, the default) buffers every (value, count)
  * of a group in ONE aggregation task's OpenHashMap — ~16 B per distinct
  * value, so the q180 global revenue threshold over ~1.5M customers at
  * 100× sf0.1 is ~12 MB (fine), but a group with billions of distinct
  * values at true 100 TB scale is a single-task memory wall. The oracle
  * gate needs exactness, so exact stays the default.
  *
  * Setting `spark.graft.percentile.mode=approx` swaps every threshold
  * built through this object to `percentile_approx` (Greenwald–Khanna /
  * QuantileSummaries): rank error ≤ 1/accuracy, memory
  * O(accuracy·log n) INDEPENDENT of group size, mergeable map-side
  * partials — the form a 100 TB run selects. Accuracy defaults to
  * Spark's 10000 (0.01% rank error) and is tunable via
  * `spark.graft.percentile.accuracy`.
  *
  * Semantics note pinned for callers: exact `percentile` interpolates
  * between order statistics (quantile_cont) while `percentile_approx`
  * returns an actual data value near the requested rank — the approx
  * mode is a documented approximation, not a bit-compatible swap.
  */
object Quantiles {

  val ModeConf = "spark.graft.percentile.mode" // "exact" (default) | "approx"
  val AccuracyConf = "spark.graft.percentile.accuracy"

  private def approxOn(s: SparkSession): Boolean =
    s.conf.get(ModeConf, "exact") == "approx"

  private def accuracy(s: SparkSession): Int =
    s.conf.get(AccuracyConf, "10000").toInt

  /** Percentile aggregate at a single fraction `p` ∈ [0, 1]. */
  def pct(s: SparkSession, value: Column, p: Double): Column =
    if (approxOn(s)) percentile_approx(value, lit(p), lit(accuracy(s)))
    else percentile(value, lit(p))

  /** Percentile aggregate at multiple fractions — returns array<double>
    * (exact) / array of the value type (approx). */
  def pcts(s: SparkSession, value: Column, ps: Seq[Double]): Column = {
    val arr = array(ps.map(lit): _*)
    if (approxOn(s)) percentile_approx(value, arr, lit(accuracy(s)))
    else percentile(value, arr)
  }
}
