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

  /** The ±element_at chain sgsum replaced, for fold-order parity. */
  private def unrolledSum(idxs: Seq[Int], signs: Seq[Int]) = {
    val terms = idxs.zip(signs).map { case (i, sg) =>
      val e = element_at(col("a"), i + 1).cast("double")
      if (sg > 0) e else -e
    }
    if (terms.isEmpty) lit(0.0d) else terms.reduceLeft(_ + _)
  }

  test("sgsum: bit-identical to the unrolled ±element_at chain") {
    import spark.implicits._
    VectorExpressions.register(spark)
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(200)(Array.fill(64)(rnd.nextFloat() * 2 - 1))
    val idxs = (0 until 64).filter(_ % 3 != 1)
    val signs = idxs.map(i => if (i % 2 == 0) 1 else -1)
    val df = rows.toDF("a")
      .withColumn("unrolled", unrolledSum(idxs, signs))
      .withColumn("gen", VectorExpressions.sgsum(col("a"),
        lit(idxs.toArray), lit(signs.toArray)))
    assert(df.filter(col("unrolled") =!= col("gen")).count() == 0)
    assert(df.filter(col("gen").isNull).count() == 0)
    // interpreted path (eval) must agree with codegen: force it through
    // a context where codegen is disabled
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = rows.toDF("a")
        .withColumn("gen", VectorExpressions.sgsum(col("a"),
          lit(idxs.toArray), lit(signs.toArray)))
        .withColumn("unrolled", unrolledSum(idxs, signs))
      assert(interp.filter(col("unrolled") =!= col("gen")).count() == 0)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("sgsum: OOB index and null element poison to null; empty idxs = 0") {
    import spark.implicits._
    VectorExpressions.register(spark)
    val df = Seq(
      (1L, Some(Array(1f, 2f))),
      (2L, None: Option[Array[Float]]))
      .toDF("id", "a")
      .withColumn("oob", VectorExpressions.sgsum(col("a"),
        lit(Array(0, 5)), lit(Array(1, 1))))
      .withColumn("empty", VectorExpressions.sgsum(col("a"),
        lit(Array.empty[Int]), lit(Array.empty[Int])))
      .withColumn("ok", VectorExpressions.sgsum(col("a"),
        lit(Array(1, 0)), lit(Array(1, -1))))
      .orderBy("id")
    val r = df.collect()
    assert(Option(r(0).get(2)).isEmpty)          // index 5 past end -> null
    assert(r(0).getDouble(3) == 0.0)             // empty index list -> 0.0
    assert(r(0).getDouble(4) == 2.0 - 1.0)       // a[1] - a[0]
    assert(Option(r(1).get(2)).isEmpty)          // null array -> null
    assert(Option(r(1).get(3)).isEmpty)          // null array -> null (strict)
  }
}
