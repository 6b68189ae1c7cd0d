package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `cm_cells(tok)` — a token's count-min cell coordinates, all `depth`
  * rows in one digest pass.
  *
  * Byte-identical to the composed plan
  * `pmod(conv(substring(md5(concat('r:', tok)), 1, 15), 16, 10)
  *  .cast(long), width)` evaluated for r = 0..depth−1 (the l64/m34 cell
  * derivation): the digest input is the decimal row index, ':', then the
  * token's UTF-8 bytes — exactly `concat(lit(s"$r:"), tok)` — and the
  * first 15 hex chars of an md5 are its big-endian top-64-bit word with
  * the 16th nibble dropped, i.e. `word >>> 4` (60 bits, always positive,
  * so `conv → cast(long) → pmod` is plain `% width`). The composed plan
  * built, per token and per row, a concat'd UTF8String, a 32-char hex
  * string, a substring, and `conv`'s radix string round-trip — four md5
  * expression trees of per-query generated code; this kernel is one
  * codegen call per token reusing a thread-local digest, no intermediate
  * strings (the [[WordTrigramMd5]] library-kernel pattern).
  *
  * Null token → null (explodes to zero rows). The composed plan instead
  * produced depth rows with null `cell` for a null token — no caller can
  * hit that: every consumer feeds tokens from `explode(split(text, ' '))`
  * (never null) and the count-min estimate's probe tokens are group keys.
  */
object CmCellsUtil {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The shared per-row digest: md5 over ("$r:" + tok bytes), top 60 bits
    * mod `width` — the exact conv(substring(md5,1,15),16,10) % width. */
  private def cell(digest: java.security.MessageDigest, bytes: Array[Byte],
      r: Int, width: Long): Long = {
    val prefix = java.lang.Integer.toString(r)
    var i = 0
    while (i < prefix.length) { digest.update(prefix.charAt(i).toByte); i += 1 }
    digest.update(':'.toByte)
    digest.update(bytes)
    val d = digest.digest() // digest() also resets for the next row
    var x = 0L
    var j = 0
    while (j < 8) { x = (x << 8) | (d(j) & 0xffL); j += 1 }
    (x >>> 4) % width // first 15 hex chars, as a 60-bit non-negative long
  }

  def cells(tok: UTF8String, depth: Int, width: Long): ArrayData = {
    val bytes = tok.getBytes
    val digest = md.get()
    val out = new Array[Any](depth)
    var r = 0
    while (r < depth) {
      out(r) = new GenericInternalRow(Array[Any](r, cell(digest, bytes, r, width)))
      r += 1
    }
    new GenericArrayData(out)
  }

  /** Flat variant for the bloom faces (l65/m36): just the nh positions,
    * no row index — `bloomPos(i, fp, bits)` for i = 0..nh−1, same digest
    * derivation, one kernel call per fingerprint. */
  def positions(fp: UTF8String, nh: Int, bits: Long): ArrayData = {
    val bytes = fp.getBytes
    val digest = md.get()
    val out = new Array[Long](nh)
    var r = 0
    while (r < nh) { out(r) = cell(digest, bytes, r, bits); r += 1 }
    new GenericArrayData(out)
  }
}

case class CmCells(child: Expression, depth: Int, width: Long)
    extends UnaryExpression {
  require(depth >= 1, s"cm_cells needs depth >= 1, got $depth")
  require(width >= 1, s"cm_cells needs width >= 1, got $width")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("r", IntegerType, nullable = false),
    StructField("cell", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cm_cells expects STRING, got $t")
    }
  override def prettyName: String = "cm_cells"

  override protected def nullSafeEval(s: Any): Any =
    CmCellsUtil.cells(s.asInstanceOf[UTF8String], depth, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.CmCellsUtil.cells($s, $depth, ${width}L)")

  override protected def withNewChildInternal(newChild: Expression): CmCells =
    copy(child = newChild)
}

object CmCells {
  def apply(tok: Column, depth: Int, width: Int): Column =
    GraftBridge.column(CmCells(GraftBridge.expression(tok), depth, width.toLong))
}

/** `bloom_positions(fp)` — the nh md5-derived bit positions of a bloom
  * fingerprint, flat array<long>. Same digest derivation as [[CmCells]]
  * (see CmCellsUtil.cell); replaces nh separate
  * md5+substring+conv+pmod trees per fingerprint in the l65/m36 plans. */
case class BloomPositions(child: Expression, nh: Int, bits: Long)
    extends UnaryExpression {
  require(nh >= 1, s"bloom_positions needs nh >= 1, got $nh")
  require(bits >= 1, s"bloom_positions needs bits >= 1, got $bits")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_positions expects STRING, got $t")
    }
  override def prettyName: String = "bloom_positions"

  override protected def nullSafeEval(s: Any): Any =
    CmCellsUtil.positions(s.asInstanceOf[UTF8String], nh, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.CmCellsUtil.positions($s, $nh, ${bits}L)")

  override protected def withNewChildInternal(newChild: Expression): BloomPositions =
    copy(child = newChild)
}

object BloomPositions {
  def apply(fp: Column, nh: Int, bits: Int): Column =
    GraftBridge.column(BloomPositions(GraftBridge.expression(fp), nh, bits.toLong))
}
