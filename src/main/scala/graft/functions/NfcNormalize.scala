package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `nfc_normalize(text)` — Unicode canonical composition (NFC).
  *
  * Dedup canonicalization needs it: "café" arrives both composed (U+00E9)
  * and decomposed (U+0065 U+0301) in real web corpora, and every
  * byte-keyed stage (exact dedup l1, minhash shingles, fingerprints)
  * treats them as different documents. Spark has no normalization
  * builtin; a Scala UDF would fall out of whole-stage codegen, so this is
  * a native `Expression` whose generated code is one static call —
  * SURVEY §7.3's extension ladder, rung (b).
  *
  * The fast path matters at corpus scale: `Normalizer.isNormalized` is a
  * cheap scan (trivially true for ASCII, which dominates), and only
  * already-denormalized strings pay the rebuild — the common row costs a
  * check, not an allocation.
  */
object NfcNormalizeUtil {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"nfc_normalize expects STRING, got $t")
  }
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(s: Any): Any =
    NfcNormalizeUtil.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.NfcNormalizeUtil.nfc($s)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def apply(text: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(text)))
}
