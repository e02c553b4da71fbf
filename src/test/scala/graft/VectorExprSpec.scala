package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorExpressions

/** Codegen dot-product expression: bit-identical to the interpreted
  * higher-order-function fold it replaced (same left-to-right double
  * accumulation), null-safe, and tolerant of length mismatch. */
class VectorExprSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  private def hofDot = aggregate(
    transform(sequence(lit(0), size(col("a")) - 1),
      i => element_at(col("a"), (i + 1).cast("int")).cast("double") *
        element_at(col("b"), (i + 1).cast("int")).cast("double")),
    lit(0.0), (acc, v) => acc + v)

  test("bit-identical to the HOF fold on random float vectors") {
    import spark.implicits._
    VectorExpressions.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(100)((
      Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
      .withColumn("hof", hofDot)
      .withColumn("gen", VectorExpressions.dotf(col("a"), col("b")))
    // exact equality: same sequential double fold, different execution path
    assert(df.filter(col("hof") =!= col("gen")).count() == 0)
    assert(df.filter(col("gen").isNull).count() == 0)
  }

  test("null input and mismatched lengths yield null (ragged != prefix score)") {
    import spark.implicits._
    VectorExpressions.register(spark)
    val df = Seq(
      (Some(Array(1f, 2f, 3f)), Some(Array(4f, 5f))),
      (None: Option[Array[Float]], Some(Array(1f))),
      (Some(Array(2f, 3f)), Some(Array(4f, 5f))))
      .toDF("a", "b")
      .withColumn("gen", VectorExpressions.dotf(col("a"), col("b")))
    val got = df.select("gen").collect().map(r => Option(r.get(0)))
    assert(got(0).isEmpty) // length mismatch
    assert(got(1).isEmpty) // null input
    assert(got(2).contains(2.0 * 4 + 3.0 * 5))
  }
}
