package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Codegen'd Count-Min-sketch threshold probe over a string column:
  * `estimateCount(value) >= minCount`.
  *
  * `first` is the probed string, `second` a foldable binary literal with
  * a serialized [[org.apache.spark.util.sketch.CountMinSketch]], `third`
  * the long threshold. CMS never under-estimates, so the probe is a
  * SUPERSET filter: every key whose true count meets the threshold
  * passes; over-estimated light keys leak through at the sketch's eps
  * rate and must die in an exact downstream count — the same
  * prune-then-verify contract as [[BloomMightContainF]]. Build and probe
  * both use the UTF-8 byte form of the key. The sketch is deserialized
  * once per plan, not per row. */
case class CmsAtLeastF(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_cms_at_least"

  @transient private lazy val sketch: CountMinSketch =
    CountMinSketch.readFrom(second.eval(null).asInstanceOf[Array[Byte]])

  override def nullSafeEval(v: Any, ignored: Any, t: Any): Any =
    sketch.estimateCount(v.asInstanceOf[UTF8String].getBytes) >=
      t.asInstanceOf[Long]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCms", sketch,
      classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, (a, _, t) =>
      s"${ev.value} = $ref.estimateCount($a.getBytes()) >= $t;")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): CmsAtLeastF =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object CmsExpressions {

  private val ident = new FunctionIdentifier("graft_cms_at_least")

  /** Idempotently register the probe in the session's function registry
    * so `call_function` resolves it at analysis time. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[CmsAtLeastF].getName,
          "graft_cms_at_least"),
        (exprs: Seq[Expression]) => CmsAtLeastF(exprs(0), exprs(1), exprs(2)))
    }
  }

  /** Column form; the owning session must have called [[register]]. */
  def atLeast(value: Column, serialized: Column, minCount: Column): Column =
    call_function("graft_cms_at_least", value, serialized, minCount)
}
