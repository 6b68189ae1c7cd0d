package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Kernel shared by interpreted eval and generated code: the classic
  * SimHash bit-vote over per-token 32-bit hashes — bit j of the
  * fingerprint is set iff more tokens have bit j set than clear
  * (multiplicity counts).
  *
  * The token hash is the first 4 bytes of md5(token-utf8) read big-endian
  * unsigned — bit-identical to "first 8 hex chars of md5 parsed as an
  * unsigned 32-bit value", which is what the DuckDB oracle computes; doing
  * it here skips the hex-format + string-base-conversion round-trip the
  * expression formulation paid per token. */
object SimHashFpUtil {
  val Bits = 32

  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  def fp(tokens: ArrayData): Long = {
    val md = digests.get()
    val counts = new Array[Int](Bits)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      md.reset()
      // null elements hash as the empty string (same policy as winnow_fp)
      val s = tokens.getUTF8String(i)
      val d = md.digest(if (s == null) Array.emptyByteArray else s.getBytes)
      val h = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      var j = 0
      while (j < Bits) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var f = 0L
    var j = 0
    while (j < Bits) {
      if (counts(j) > 0) f |= 1L << j
      j += 1
    }
    f
  }
}

/** `simhash_fp(tokens)` — 32-bit SimHash fingerprint of a document's token
  * array in one per-row projection (same rationale as [[MinHashSig]]: the
  * aggregate formulation explodes every token through a shuffle into a
  * 32-buffer hash aggregate; this is a primitive loop inside whole-stage
  * codegen, zero shuffle, and hashes tokens without intermediate hex
  * strings). */
case class SimHashFp(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_fp expects ARRAY<STRING>, got $t")
    }
  override def prettyName: String = "simhash_fp"

  override protected def nullSafeEval(a: Any): Any =
    SimHashFpUtil.fp(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SimHashFpUtil.fp($a)")

  override protected def withNewChildInternal(newChild: Expression): SimHashFp =
    copy(child = newChild)
}

object SimHashFp {
  def apply(tokens: Column): Column =
    GraftBridge.column(SimHashFp(GraftBridge.expression(tokens)))
}
