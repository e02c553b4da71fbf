package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-filter membership probe over a string column.
  *
  * `left` is the probed string; `right` is a foldable binary literal
  * holding a serialized [[org.apache.spark.util.sketch.BloomFilter]]
  * (built by the caller, who also controls the put side — both ends use
  * the UTF-8 byte form, so a present key can never probe false). The
  * filter is deserialized ONCE per plan (lazily on the driver at codegen
  * time, then shipped as a codegen reference object), not per row, and
  * the probe participates in whole-stage codegen — the pre-filter adds a
  * branch to the scan loop rather than breaking the codegen span.
  *
  * Public-API surface only: the sketch class is Spark's documented
  * `DataFrameStatFunctions.bloomFilter` return type; this expression
  * exists because the built-in probe counterpart
  * (`BloomFilterMightContain`) is internal to runtime filtering and not
  * registered for user plans. */
case class BloomMightContainF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(right.eval(null).asInstanceOf[Array[Byte]])

  override def nullSafeEval(v: Any, ignored: Any): Any =
    filter.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (a, _) =>
      s"${ev.value} = $ref.mightContainBinary($a.getBytes());")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContainF =
    copy(left = newLeft, right = newRight)
}

object BloomExpressions {

  private val ident = new FunctionIdentifier("graft_bloom_might_contain")

  /** Idempotently register the probe in the session's function registry
    * so `call_function` resolves it at analysis time. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[BloomMightContainF].getName,
          "graft_bloom_might_contain"),
        (exprs: Seq[Expression]) => BloomMightContainF(exprs(0), exprs(1)))
    }
  }

  /** Column form; the owning session must have called [[register]]. */
  def mightContain(value: Column, serialized: Column): Column =
    call_function("graft_bloom_might_contain", value, serialized)
}
