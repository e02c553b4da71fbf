package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the embedding dot product.
  *
  * The higher-order-function form (`aggregate(transform(...))`) evaluates
  * INTERPRETED in Spark — measured 10-100x slower than codegen on hot
  * text paths — and the dot product sits inside every similarity
  * verification join. This expression participates in whole-stage codegen:
  * the generated Java is the same left-to-right double fold the HOF form
  * and DuckDB's `list_reduce` perform, so scores stay bit-identical across
  * all three implementations (float -> double widening per element, then
  * IEEE-exact multiply/add in sequence order).
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs are array<float> or array<double> at our call sites
  // (graft-internal function, not user-facing SQL) — each side picks its
  // element getter from the child's type; no ExpectsInputTypes coercion
  // (AbstractDataType is private[sql] in Spark 4.1)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dotf"

  /** "getFloat" / "getDouble" per child; both widen to double, so the
    * fold value is identical to casting the whole array first. */
  private def getter(e: Expression): String = e.dataType match {
    case ArrayType(FloatType, _) => "getFloat"
    case ArrayType(DoubleType, _) => "getDouble"
    case t => throw new IllegalArgumentException(
      s"dotf expects array<float|double>, got $t")
  }
  private lazy val (getL, getR) = (getter(left), getter(right))

  // Length mismatch -> NULL, matching both the HOF form it replaced
  // (element_at past the shorter array poisons the fold with null) and
  // DuckDB's list indexing — a ragged embedding must not yield a
  // plausible-looking prefix score.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    def elem(d: ArrayData, g: String, i: Int): Double =
      if (g == "getFloat") d.getFloat(i).toDouble else d.getDouble(i)
    var s = 0.0
    var i = 0
    while (i < n) {
      s += elem(x, getL, i) * elem(y, getR, i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double ${ev.value}_s = 0.0;
         |  for (int ${ev.value}_i = 0; ${ev.value}_i < $a.numElements(); ${ev.value}_i++) {
         |    ${ev.value}_s += (double) $a.$getL(${ev.value}_i)
         |      * (double) $b.$getR(${ev.value}_i);
         |  }
         |  ${ev.value} = ${ev.value}_s;
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {

  private val ident = new FunctionIdentifier("graft_dotf")

  /** Idempotently register the codegen dot product in the session's
    * function registry so `call_function` resolves it at analysis time. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[DotProductF].getName, "graft_dotf"),
        (exprs: Seq[Expression]) => DotProductF(exprs(0), exprs(1)))
    }
  }

  /** Column form; the owning session must have called [[register]]. */
  def dotf(a: Column, b: Column): Column = call_function("graft_dotf", a, b)
}
