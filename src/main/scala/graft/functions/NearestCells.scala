package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** `nearest_cells(v)` — the `nprobe` nearest IVF cells of a vector, by
  * squared-L2 distance to a fixed centroid matrix, ties broken by cell id.
  *
  * The centroid matrix rides along as a codegen reference object instead
  * of literal column trees (an 8×64 matrix expanded to `lit` expressions
  * twice per plan made IVF planning/codegen the dominant cost, not the
  * data). Distance uses the argmin-equivalent `|c|² − 2·v·c` with the
  * same sequential fold the DuckDB oracle computes, so cell assignment is
  * bit-identical across engines. */
case class NearestCells(
    child: Expression,
    centroids: Array[Array[Double]],
    nprobe: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) if nprobe >= 1 && nprobe <= centroids.length =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_cells expects ARRAY<DOUBLE> and 1 <= nprobe <= ${centroids.length}, got $t / $nprobe")
    }
  override def prettyName: String = "nearest_cells"

  /** |c|² per centroid, sequential sum-of-squares fold (oracle order). */
  @transient private lazy val c2: Array[Double] =
    centroids.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    }

  /** Entry point used by both interpreted eval and generated code. */
  def nearest(v: ArrayData): ArrayData = {
    val k = centroids.length
    val d = new Array[Double](k)
    var ci = 0
    while (ci < k) {
      val c = centroids(ci)
      var dot = 0.0
      var i = 0
      while (i < c.length) { dot += v.getDouble(i) * c(i); i += 1 }
      d(ci) = c2(ci) - 2.0 * dot
      ci += 1
    }
    val out = new Array[Int](nprobe)
    val taken = new Array[Boolean](k)
    var r = 0
    while (r < nprobe) {
      var best = -1
      var ci2 = 0
      while (ci2 < k) {
        if (!taken(ci2) && (best < 0 || d(ci2) < d(best))) best = ci2
        ci2 += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any =
    nearest(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nc", this, "graft.functions.NearestCells")
    defineCodeGen(ctx, ev, v => s"$ref.nearest($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

object NearestCells {
  def apply(v: Column, centroids: Array[Array[Double]], nprobe: Int): Column =
    GraftBridge.column(NearestCells(GraftBridge.expression(v), centroids, nprobe))
}
