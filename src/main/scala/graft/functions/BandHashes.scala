package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `band_hashes(sig)` — the B per-band bucket keys of a MinHash signature,
  * band b hashing slots `[b·R, (b+1)·R)` together with b itself (so equal
  * slices in different bands never share a bucket).
  *
  * Replaces the
  * `transform(sequence(0, B-1), b -> named_struct(..., hash(sig[bR], …)))`
  * formulation, whose Catalyst tree carries B·(R+1) getItem/hash nodes —
  * measurable analysis + whole-stage-codegen compile cost on the cold
  * first run of every dedup query — with one reference-object loop.
  * Bucket keys are internal (only equality matters), so the mix is a free
  * choice: an xxhash-style avalanche over the R slots. Pairs with
  * `posexplode` → (band_idx, band_hash).
  */
object BandHashesUtil {
  private val P1 = 0x9E3779B97F4A7C15L
  private val P2 = 0xC2B2AE3D27D4EB4FL

  def hashes(sig: ArrayData, bands: Int, rows: Int): ArrayData = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = P1 * (b + 1)
      var r = 0
      while (r < rows) {
        h = java.lang.Long.rotateLeft(h ^ (sig.getLong(b * rows + r) * P2), 27) * P1
        r += 1
      }
      h ^= h >>> 33
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }
}

case class BandHashes(child: Expression, bands: Int, rows: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) if bands >= 1 && rows >= 1 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"band_hashes expects ARRAY<BIGINT> signature and bands/rows >= 1, got $t")
    }
  override def prettyName: String = "band_hashes"

  override protected def nullSafeEval(a: Any): Any =
    BandHashesUtil.hashes(a.asInstanceOf[ArrayData], bands, rows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.BandHashesUtil.hashes($a, $bands, $rows)")

  override protected def withNewChildInternal(newChild: Expression): BandHashes =
    copy(child = newChild)
}

object BandHashes {
  def apply(sig: Column, bands: Int, rows: Int): Column =
    GraftBridge.column(BandHashes(GraftBridge.expression(sig), bands, rows))
}
