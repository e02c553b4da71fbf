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

/** Top-2 cosine cells for one vector against a broadcast centroid
  * array — the IVF assignment kernel (q305 drift, q312 boundary, q313
  * split, streaming arrivals) as ONE whole-stage-codegen expression.
  *
  * Input: the row's embedding (array<float|double>) and the id-ASCENDING
  * centroid struct array `(id: long, e: array<double>, n2c: double)`
  * built by `Similarity.centArray`. Output:
  * `struct(c1: double, id1: long, c2: double)` — best cosine, its cell
  * id, runner-up cosine. Argmax call sites read `.id1`; the boundary
  * audit reads `c1 - c2`.
  *
  * Replaces the interpreted higher-order `aggregate(transform(...))`
  * fold, which walked Catalyst expression trees per (cell, dim) —
  * measured 2.2× slower than even the crossJoin+max_by aggregate it was
  * meant to beat (q305 at sf0.1: HOF 1.96 s vs max_by 0.89 s vs this
  * expression 0.5 s). Semantics are bit-identical to both: per cell in
  * ascending-id order, cc = (Σ x_d·e_d) / sqrt((Σ x_d²)·n2c) with
  * left-to-right double folds (= DotProductF = DuckDB list_reduce);
  * strict > keeps the LOWER centroid id on exact ties; a NaN cosine
  * (zero vector) never beats the accumulator — exactly the HOF fold's
  * if(cc > acc.c1, …) chain. A length-mismatched centroid is skipped
  * (the HOF's zip_with null-poisons that cell's dot to null, which the
  * > comparisons also treat as not-better). Empty centroid array →
  * (−1e300, −1, −1e300), the HOF seed. At 100 TB this is the
  * zero-shuffle assignment path: O(cells·d) compute per row, no
  * row×cell fan-out, no exchange before the nLists-row count. */
case class CellTop2F(emb: Expression, cents: Expression)
    extends BinaryExpression {

  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  override def left: Expression = emb
  override def right: Expression = cents
  override def dataType: DataType = StructType(Seq(
    StructField("c1", DoubleType, nullable = false),
    StructField("id1", LongType, nullable = false),
    StructField("c2", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_celltop2"

  private lazy val getEl: String = emb.dataType match {
    case ArrayType(FloatType, _) => "getFloat"
    case ArrayType(DoubleType, _) => "getDouble"
    case t => throw new IllegalArgumentException(
      s"graft_celltop2 expects array<float|double>, got $t")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val cs = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    var n2 = 0.0
    var j = 0
    while (j < n) {
      val v = if (getEl == "getFloat") x.getFloat(j).toDouble
              else x.getDouble(j)
      n2 += v * v
      j += 1
    }
    var c1 = -1e300; var id1 = -1L; var c2 = -1e300
    var i = 0
    while (i < cs.numElements()) {
      val c = cs.getStruct(i, 3)
      val e = c.getArray(1)
      if (e.numElements() == n) {
        var d = 0.0
        j = 0
        while (j < n) {
          val v = if (getEl == "getFloat") x.getFloat(j).toDouble
                  else x.getDouble(j)
          d += v * e.getDouble(j)
          j += 1
        }
        val cc = d / math.sqrt(n2 * c.getDouble(2))
        if (cc > c1) { c2 = c1; c1 = cc; id1 = c.getLong(0) }
        else if (cc > c2) { c2 = cc }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](c1, id1, c2))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val v = ev.value
      s"""
         |int ${v}_n = $a.numElements();
         |double ${v}_n2 = 0.0;
         |for (int ${v}_j = 0; ${v}_j < ${v}_n; ${v}_j++) {
         |  double ${v}_xv = (double) $a.$getEl(${v}_j);
         |  ${v}_n2 += ${v}_xv * ${v}_xv;
         |}
         |double ${v}_c1 = -1e300; long ${v}_id1 = -1L; double ${v}_c2 = -1e300;
         |for (int ${v}_i = 0; ${v}_i < $b.numElements(); ${v}_i++) {
         |  org.apache.spark.sql.catalyst.InternalRow ${v}_c =
         |    $b.getStruct(${v}_i, 3);
         |  org.apache.spark.sql.catalyst.util.ArrayData ${v}_e =
         |    ${v}_c.getArray(1);
         |  if (${v}_e.numElements() == ${v}_n) {
         |    double ${v}_d = 0.0;
         |    for (int ${v}_j = 0; ${v}_j < ${v}_n; ${v}_j++) {
         |      ${v}_d += (double) $a.$getEl(${v}_j) * ${v}_e.getDouble(${v}_j);
         |    }
         |    double ${v}_cc = ${v}_d / java.lang.Math.sqrt(
         |      ${v}_n2 * ${v}_c.getDouble(2));
         |    if (${v}_cc > ${v}_c1) {
         |      ${v}_c2 = ${v}_c1; ${v}_c1 = ${v}_cc;
         |      ${v}_id1 = ${v}_c.getLong(0);
         |    } else if (${v}_cc > ${v}_c2) { ${v}_c2 = ${v}_cc; }
         |  }
         |}
         |$v = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { ${v}_c1, ${v}_id1, ${v}_c2 });
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CellTop2F =
    copy(emb = newLeft, cents = newRight)
}

object VectorExpressions {

  private val ident = new FunctionIdentifier("graft_dotf")
  private val sgsumIdent = new FunctionIdentifier("graft_sgsum")
  private val celltop2Ident = new FunctionIdentifier("graft_celltop2")

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
    if (!registry.functionExists(celltop2Ident)) {
      registry.registerFunction(
        celltop2Ident,
        new ExpressionInfo(classOf[CellTop2F].getName, "graft_celltop2"),
        (exprs: Seq[Expression]) => CellTop2F(exprs(0), exprs(1)))
    }
  }

  /** Column form; the owning session must have called [[register]]. */
  def dotf(a: Column, b: Column): Column = call_function("graft_dotf", a, b)

  /** Signed gather-sum column form: `idxs`/`signs` are int-array literal
    * columns (0-based indices); the session must have called [[register]]. */
  def sgsum(emb: Column, idxs: Column, signs: Column): Column =
    call_function("graft_sgsum", emb, idxs, signs)

  /** Top-2 IVF cells column form: `struct(c1, id1, c2)` of the row's
    * best / runner-up cosine over a broadcast centroid struct array
    * (see [[CellTop2F]]); the session must have called [[register]]. */
  def celltop2(emb: Column, cents: Column): Column =
    call_function("graft_celltop2", emb, cents)
}
