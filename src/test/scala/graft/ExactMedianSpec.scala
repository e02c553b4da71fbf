package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.ExactMedian

class ExactMedianSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  test("exact median: odd/even counts, null skipping, empty group, vs percentile") {
    import spark.implicits._
    val df = Seq[(Int, java.lang.Double)](
      (1, 3.0), (1, 1.0), (1, 2.0), // odd -> 2.0
      (2, 4.0), (2, 1.0), (2, 3.0), (2, 2.0), // even -> 2.5
      (3, 7.5), (3, null), // null skipped -> 7.5
      (4, null) // all null -> null
    ).toDF("k", "v")
    val got = df.groupBy("k").agg(ExactMedian(col("v")).as("med"))
      .collect().map(r => r.getInt(0) -> Option(r.get(1))).toMap
    assert(got(1).contains(2.0))
    assert(got(2).contains(2.5))
    assert(got(3).contains(7.5))
    assert(got(4).isEmpty)

    // agrees with Spark's exact percentile on a larger random-ish set
    val big = (0 until 1000).map(i => (i % 7, (i * 37 % 101).toDouble)).toDF("k", "v")
    val a = big.groupBy("k").agg(ExactMedian(col("v")).as("m")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val b = big.groupBy("k").agg(percentile(col("v"), lit(0.5)).as("m")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(a == b)
  }
}
