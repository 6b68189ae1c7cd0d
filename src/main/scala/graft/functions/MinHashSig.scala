package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, LongType}

/** Kernel shared by interpreted eval and generated code: K min-hash slots
  * over a set of 64-bit element hashes, slot j = min over elements of
  * xxhash64(element, seed = j). One tight primitive loop — no per-slot
  * expression overhead, no allocation beyond the K-long output. */
object MinHashSigUtil {
  def sig(hashes: ArrayData, k: Int): ArrayData = {
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < k) {
        val m = XXH64.hashLong(h, j.toLong)
        if (m < out(j)) out(j) = m
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `minhash_sig(hashes, K)` — the K-slot MinHash signature of a document's
  * element-hash set, as a single per-row projection.
  *
  * Why an Expression: the aggregate formulation (explode + K min() agg
  * columns) shuffles every element and pays a K-wide codegen compile per
  * plan; the higher-order-function formulation (K nested folds) runs
  * interpreted. This is the [[DotProduct]] lesson applied to signatures:
  * one generated call into a primitive loop, inside whole-stage codegen,
  * zero shuffle. Signature semantics (which pairs share a band bucket)
  * are unchanged in distribution; signatures are internal — correctness
  * rests on the exact-Jaccard verify stage.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) if k > 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects ARRAY<BIGINT> and k > 0, got $t / k=$k")
    }
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(a: Any): Any =
    MinHashSigUtil.sig(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.MinHashSigUtil.sig($a, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def apply(hashes: Column, k: Int): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(hashes), k))
}
