package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, TernaryExpression}
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

/** Signed gather-sum: left-to-right fold of `±emb[idx_k]` over a
  * plan-constant index/sign list — the sparse matrix-vector kernel behind
  * the JL random projection.
  *
  * The unrolled-literal form (`element_at(e,i+1) + element_at(e,j+1) - …`,
  * one chain per output dim) generates O(inDim·outDim) Java and blew
  * Janino's 64 KB method limit already at 64→16 (whole-stage codegen then
  * silently falls back to interpreted eval — observed in the r13 verify
  * log); a realistic 768→128 projection would be hopeless. This expression
  * compiles to ONE ~10-line loop per output dim regardless of dimension,
  * and the runtime fold is the identical IEEE left-to-right ±sum the
  * unrolled form and the DuckDB oracle perform (seed 0.0 vs first-element
  * seeding differ only in the sign of an all-zero sum, which every call
  * site normalizes with `+ 0.0` after rounding).
  *
  * `idxExpr`/`signExpr` must be foldable int-array literals (0-based
  * indices, ascending at our call sites); an index past the array end or a
  * null element yields NULL, matching `element_at` null-poisoning of the
  * unrolled chain. */
case class SignedGatherSumF(emb: Expression, idxExpr: Expression,
    signExpr: Expression) extends TernaryExpression {

  override def first: Expression = emb
  override def second: Expression = idxExpr
  override def third: Expression = signExpr
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sgsum"

  private def constInts(e: Expression): Array[Int] =
    e.eval(null).asInstanceOf[ArrayData].toIntArray()
  @transient private lazy val idxs: Array[Int] = constInts(idxExpr)
  @transient private lazy val signs: Array[Int] = constInts(signExpr)

  private lazy val getEl: String = emb.dataType match {
    case ArrayType(FloatType, _) => "getFloat"
    case ArrayType(DoubleType, _) => "getDouble"
    case t => throw new IllegalArgumentException(
      s"graft_sgsum expects array<float|double>, got $t")
  }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var k = 0
    while (k < idxs.length) {
      val i = idxs(k)
      if (i >= n || x.isNullAt(i)) return null
      val v = if (getEl == "getFloat") x.getFloat(i).toDouble
              else x.getDouble(i)
      s += (if (signs(k) > 0) v else -v)
      k += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val idxRef = ctx.addReferenceObj("sgsumIdxs", idxs, "int[]")
    val signRef = ctx.addReferenceObj("sgsumSigns", signs, "int[]")
    nullSafeCodeGen(ctx, ev, (a, _, _) =>
      s"""
         |double ${ev.value}_s = 0.0;
         |int ${ev.value}_n = $a.numElements();
         |for (int ${ev.value}_k = 0; ${ev.value}_k < $idxRef.length;
         |     ${ev.value}_k++) {
         |  int ${ev.value}_i = $idxRef[${ev.value}_k];
         |  if (${ev.value}_i >= ${ev.value}_n || $a.isNullAt(${ev.value}_i)) {
         |    ${ev.isNull} = true; break;
         |  }
         |  double ${ev.value}_v = (double) $a.$getEl(${ev.value}_i);
         |  ${ev.value}_s += $signRef[${ev.value}_k] > 0
         |    ? ${ev.value}_v : -${ev.value}_v;
         |}
         |if (!${ev.isNull}) { ${ev.value} = ${ev.value}_s; }
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): SignedGatherSumF =
    copy(emb = newFirst, idxExpr = newSecond, signExpr = newThird)
}

object VectorExpressions {

  private val ident = new FunctionIdentifier("graft_dotf")
  private val sgsumIdent = new FunctionIdentifier("graft_sgsum")

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
    if (!registry.functionExists(sgsumIdent)) {
      registry.registerFunction(
        sgsumIdent,
        new ExpressionInfo(classOf[SignedGatherSumF].getName, "graft_sgsum"),
        (exprs: Seq[Expression]) =>
          SignedGatherSumF(exprs(0), exprs(1), exprs(2)))
    }
  }

  /** Column form; the owning session must have called [[register]]. */
  def dotf(a: Column, b: Column): Column = call_function("graft_dotf", a, b)

  /** Signed gather-sum column form: `idxs`/`signs` are int-array literal
    * columns (0-based indices); the session must have called [[register]]. */
  def sgsum(emb: Column, idxs: Column, signs: Column): Column =
    call_function("graft_sgsum", emb, idxs, signs)
}
