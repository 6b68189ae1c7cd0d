package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV k-minima as a first-class typed AGGREGATE (the SURVEY §2.2 UDAF
  * surface): `kmv_minima(h)` folds hash strings into their k smallest
  * DISTINCT values — the same sketch the l42/l63/m33 operators build with
  * the two-phase window tournament, packaged as an `Aggregator` so SQL and
  * typed pipelines can `GROUP BY source` and aggregate directly
  * (registered by [[graft.GraftFunctions.registerAll]]).
  *
  * The buffer is a sorted distinct array bounded at k: `reduce` is a
  * binary-search insert that drops anything not below the current k-th
  * minimum, `merge` a bounded sorted set-union — both associative and
  * commutative, which is the mergeability that lets Spark run this
  * map-side (partial aggregation), shipping ≤ k hashes per (group ×
  * partition) through the exchange. Since r16 this IS the operators'
  * execution path (TextStats.kMinima): the old two-phase window
  * tournament re-shuffled and sorted the whole gram frame and paid
  * WindowExec's per-task evaluator-factory codegen — the sketch
  * family's measured CPU driver at gate scale. Equivalence to the
  * tournament, and exactness under ObjectHashAggregate's sort-based
  * fallback, are pinned in SketchExprSpec.
  */
final class KmvMinima(k: Int)
    extends Aggregator[String, Array[String], Array[String]] {
  require(k >= 1, s"kmv_minima needs k >= 1, got $k")

  def zero: Array[String] = Array.empty

  def reduce(buf: Array[String], h: String): Array[String] = {
    if (h == null) return buf
    val i = java.util.Arrays.binarySearch(
      buf.asInstanceOf[Array[AnyRef]], h)
    if (i >= 0) buf // already present (set semantics)
    else {
      val ins = -i - 1
      if (ins >= k) buf // not below the k-th minimum
      else {
        val n = math.min(buf.length + 1, k)
        val out = new Array[String](n)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  def merge(a: Array[String], b: Array[String]): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](k)
    var i = 0
    var j = 0
    while (out.length < k && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) a(i) else b(j)
      if (takeA) i += 1 else j += 1
      if (out.isEmpty || out(out.length - 1) != v) out += v
    }
    out.toArray
  }

  def finish(r: Array[String]): Array[String] = r

  def bufferEncoder: Encoder[Array[String]] = ExpressionEncoder[Array[String]]()

  def outputEncoder: Encoder[Array[String]] = ExpressionEncoder[Array[String]]()
}

object KmvMinima {
  /** Default sketch width, matching the operators (k = 256). */
  val DefaultK = 256

  /** Column-API face: `KmvMinima.minima(col("h"))`. */
  def minima(h: org.apache.spark.sql.Column,
      k: Int = DefaultK): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(new KmvMinima(k), Encoders.STRING)
      .apply(h)
}
