package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03)
  * over a token array — the rolling-hash fingerprinting family of a
  * training-data pipeline: near-identical documents share most selected
  * hashes, so fingerprint overlap is a cheap containment/plagiarism
  * signal without storing the text.
  *
  * Pipeline per row (one primitive loop, zero shuffle):
  *  1. token hash = first 4 bytes of md5(token) read big-endian unsigned —
  *     the same 32-bit token hash the SimHash oracle uses (bit-identical
  *     to `'0x' || substring(md5(tok),1,8)` parsed as unsigned).
  *  2. k-gram rolling hash over K=3 consecutive token hashes:
  *     `(t0·4) ⊕ (t1·2) ⊕ t2` — exact int64 arithmetic, reproducible in
  *     SQL (no overflow: inputs < 2^32).
  *  3. winnowing: per window of W=4 consecutive k-gram hashes (truncated
  *     at the tail), select the minimum; the fingerprint is the distinct
  *     ascending set of selected hashes.
  *
  * Documents with fewer than K tokens fingerprint to the empty array.
  */
object WinnowFingerprintUtil {
  val K = 3
  val W = 4

  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  def fp(tokens: ArrayData): ArrayData = {
    val m = tokens.numElements()
    if (m < K) return new GenericArrayData(Array.emptyLongArray)
    val md = digests.get()
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      md.reset()
      // a null element (reachable via the SQL-registered winnow_fp over
      // user arrays with containsNull) hashes as the empty string — a
      // deterministic value, not an NPE (ADVICE r3); split() output, the
      // normal path, never contains nulls
      val s = tokens.getUTF8String(i)
      val d = md.digest(if (s == null) Array.emptyByteArray else s.getBytes)
      th(i) = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      i += 1
    }
    val nk = m - K + 1
    val kg = new Array[Long](nk)
    i = 0
    while (i < nk) {
      kg(i) = (th(i) * 4L) ^ (th(i + 1) * 2L) ^ th(i + 2)
      i += 1
    }
    val sels = new Array[Long](nk)
    i = 0
    while (i < nk) {
      var mn = kg(i)
      var j = i + 1
      val end = math.min(i + W, nk)
      while (j < end) { if (kg(j) < mn) mn = kg(j); j += 1 }
      sels(i) = mn
      i += 1
    }
    java.util.Arrays.sort(sels)
    var uniq = 1
    i = 1
    while (i < nk) { if (sels(i) != sels(i - 1)) uniq += 1; i += 1 }
    val out = new Array[Long](uniq)
    out(0) = sels(0)
    var o = 1
    i = 1
    while (i < nk) {
      if (sels(i) != sels(i - 1)) { out(o) = sels(i); o += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `winnow_fp(tokens)` — distinct ascending winnowing-selected hashes of
  * a token array (see [[WinnowFingerprintUtil]]). */
case class WinnowFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_fp expects ARRAY<STRING>, got $t")
    }
  override def prettyName: String = "winnow_fp"

  override protected def nullSafeEval(a: Any): Any =
    WinnowFingerprintUtil.fp(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.WinnowFingerprintUtil.fp($a)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

object WinnowFingerprint {
  def apply(tokens: Column): Column =
    GraftBridge.column(WinnowFingerprint(GraftBridge.expression(tokens)))
}
