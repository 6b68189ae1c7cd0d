package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_trigram_md5(text)` — the DISTINCT md5 hex hashes of a string's
  * word trigrams, in one pass over the raw bytes.
  *
  * Byte-identical to the composed plan
  * `md5(concat_ws(' ', slice(split(text, ' '), i+1, 3)))` over every
  * position (the l42/l63/m33 KMV gram domain, whose oracles derive the
  * estimate from the k-th md5 — the hash must stay md5, so unlike l43 it
  * cannot ride [[CharNgramHashes]]' rolling hash): with single-space
  * splitting, the trigram string "wᵢ wᵢ₊₁ wᵢ₊₂" is EXACTLY the original
  * text's byte span from token i's start to token i+2's end (empty tokens
  * from repeated spaces included, same as `split`), and UTF-8 multibyte
  * sequences never contain 0x20 — so the kernel scans for space bytes and
  * digests byte slices in place. The composed plan it replaces built each
  * gram through an interpreted HOF lambda (CodegenFallback `transform` +
  * `slice` + `concat_ws` — a fresh array slice and string per position)
  * before a separate md5 projection; this is one codegen call per row.
  *
  * Output is sorted-distinct PER DOCUMENT (the callers' next step is a
  * corpus-level DISTINCT, so per-doc dedup only shrinks the explode —
  * multiplicity is not part of any consumer's contract). Null text → null
  * (explodes to zero rows, same as the composed plan's empty array).
  */
object WordTrigramMd5Util {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val Hex = "0123456789abcdef".getBytes

  def hashes(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    var spaces = 0
    var i = 0
    while (i < n) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val ntok = spaces + 1
    if (ntok < 3) return new GenericArrayData(Array.empty[Any])
    // starts(t) = byte offset of token t; sentinel starts(ntok) = n + 1
    // makes "end of token t = starts(t+1) - 1" hold for the last token too
    val starts = new Array[Int](ntok + 1)
    var t = 1
    i = 0
    while (i < n) { if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }; i += 1 }
    starts(ntok) = n + 1
    val digest = md.get()
    val out = new Array[UTF8String](ntok - 2)
    var g = 0
    while (g < ntok - 2) {
      val off = starts(g)
      val end = starts(g + 3) - 1 // token g+2's end (exclusive)
      digest.update(bytes, off, end - off)
      val d = digest.digest() // digest() also resets for the next gram
      val hex = new Array[Byte](32)
      var j = 0
      while (j < 16) {
        hex(2 * j) = Hex((d(j) >> 4) & 0xf)
        hex(2 * j + 1) = Hex(d(j) & 0xf)
        j += 1
      }
      out(g) = UTF8String.fromBytes(hex)
      g += 1
    }
    java.util.Arrays.sort(out.asInstanceOf[Array[AnyRef]])
    var uniq = 1
    i = 1
    while (i < out.length) { if (!out(i).equals(out(i - 1))) uniq += 1; i += 1 }
    if (uniq == out.length) return new GenericArrayData(out.asInstanceOf[Array[Any]])
    val ded = new Array[UTF8String](uniq)
    ded(0) = out(0)
    var o = 1
    i = 1
    while (i < out.length) {
      if (!out(i).equals(out(i - 1))) { ded(o) = out(i); o += 1 }
      i += 1
    }
    new GenericArrayData(ded.asInstanceOf[Array[Any]])
  }
}

case class WordTrigramMd5(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_trigram_md5 expects STRING, got $t")
    }
  override def prettyName: String = "word_trigram_md5"

  override protected def nullSafeEval(s: Any): Any =
    WordTrigramMd5Util.hashes(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.WordTrigramMd5Util.hashes($s)")

  override protected def withNewChildInternal(newChild: Expression): WordTrigramMd5 =
    copy(child = newChild)
}

object WordTrigramMd5 {
  def apply(text: Column): Column =
    GraftBridge.column(WordTrigramMd5(GraftBridge.expression(text)))
}
