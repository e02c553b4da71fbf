package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Quantiles

/** The q11/q180 threshold-percentile scale path (VERDICT r12 #4): exact
  * `percentile` (the oracle's semantics) must stay the default, and
  * `spark.graft.percentile.mode=approx` must swap the SAME call sites to
  * the bounded-memory percentile_approx sketch — close in value, sketch-
  * shaped in the plan. */
class QuantilesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()

  /** 10k DENSE distinct values in two groups — dense because exact
    * percentile interpolates (quantile_cont) while the sketch returns an
    * actual data value; a value-level comparison is only meaningful when
    * neighboring order statistics are close. */
  private def df: DataFrame = spark.range(10000)
    .select((col("id") % 2).as("g"), (col("id") / lit(10.0)).as("v"))

  private def grouped: DataFrame =
    df.groupBy("g").agg(
      Quantiles.pct(spark, col("v"), 0.5).as("p50"),
      Quantiles.pcts(spark, col("v"), Seq(0.25, 0.75)).as("qs"))

  private def withMode[A](mode: String)(body: => A): A = {
    spark.conf.set(Quantiles.ModeConf, mode)
    try body finally spark.conf.unset(Quantiles.ModeConf)
  }

  test("default mode is exact percentile (oracle semantics)") {
    val plan = grouped.queryExecution.optimizedPlan.toString
    assert(plan.contains("percentile("),
      "expected exact percentile in:\n" + plan)
    assert(!plan.contains("percentile_approx"),
      "approx must not appear under the default mode")
  }

  test("approx mode swaps in the bounded-memory sketch, values stay close") {
    val exact = grouped.orderBy("g").collect()
    val (approx, plan) = withMode("approx") {
      (grouped.orderBy("g").collect(),
        grouped.queryExecution.optimizedPlan.toString)
    }
    assert(plan.contains("percentile_approx"),
      "expected percentile_approx in:\n" + plan)
    exact.zip(approx).foreach { case (e, a) =>
      assert(math.abs(e.getDouble(1) - a.getDouble(1)) <=
        0.01 * math.max(1.0, math.abs(e.getDouble(1))),
        s"p50 drifted: exact=${e.getDouble(1)} approx=${a.getDouble(1)}")
      val eq = e.getSeq[Double](2); val aq = a.getSeq[Double](2)
      assert(eq.size == 2 && aq.size == 2)
      eq.zip(aq).foreach { case (x, y) =>
        assert(math.abs(x - y) <= 0.01 * math.max(1.0, math.abs(x))) }
    }
  }

  test("accuracy conf reaches the sketch") {
    withMode("approx") {
      spark.conf.set(Quantiles.AccuracyConf, "100")
      try {
        val plan = grouped.queryExecution.optimizedPlan.toString
        assert(plan.contains("100"), "accuracy literal should appear in plan")
        assert(grouped.count() == 2)
      } finally spark.conf.unset(Quantiles.AccuracyConf)
    }
  }
}
