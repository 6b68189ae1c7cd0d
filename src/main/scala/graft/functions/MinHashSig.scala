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

/** Kernel for [[TrigramHashes]]: distinct 64-bit hashes of the word
  * trigrams of a token array, chained per element with XXH64 (seeded by
  * position offset within the window, so ("a b", "c") and ("a", "b c")
  * differ). Dedup via sort — windows are small. */
object TrigramHashesUtil {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  def hashes(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    if (n < 3) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      // null elements (user arrays via SQL) hash as the empty string —
      // deterministic, never an NPE (same policy as winnow_fp, ADVICE r3)
      val s = tokens.getUTF8String(i)
      th(i) = XXH64.hashUTF8String(
        if (s == null) org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8 else s, 42L)
      i += 1
    }
    val out = new Array[Long](n - 2)
    i = 0
    while (i < n - 2) {
      out(i) = XXH64.hashLong(th(i + 2), XXH64.hashLong(th(i + 1), th(i)))
      i += 1
    }
    java.util.Arrays.sort(out)
    var uniq = 1
    i = 1
    while (i < out.length) {
      if (out(i) != out(i - 1)) { out(uniq) = out(i); uniq += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, uniq))
  }
}

/** `trigram_hashes(tokens)` — the distinct word-trigram hash set of a
  * token array, replacing shingle *string* construction (three-way concat
  * per window, then a hash of the concatenated bytes) with direct hash
  * chaining. Shingle equality is preserved (equal trigrams hash equal;
  * distinct ones collide with ~2^-64 probability), which is all the
  * MinHash/Jaccard pipeline needs — the oracle compares only the
  * exact-verified output pairs. */
case class TrigramHashes(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.StringType

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"trigram_hashes expects ARRAY<STRING>, got $t")
    }
  override def prettyName: String = "trigram_hashes"

  override protected def nullSafeEval(a: Any): Any =
    TrigramHashesUtil.hashes(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TrigramHashesUtil.hashes($a)")

  override protected def withNewChildInternal(newChild: Expression): TrigramHashes =
    copy(child = newChild)
}

object TrigramHashes {
  def apply(tokens: Column): Column =
    GraftBridge.column(TrigramHashes(GraftBridge.expression(tokens)))
}

/** [[TrigramHashesUtil]] generalized to word n-grams: the same per-token
  * xxhash64 + left-fold chain (n = 3 reproduces trigram_hashes
  * bit-for-bit), distinct ascending. Used by the decontamination op,
  * where the standard n is 8–13. */
object NGramHashesUtil {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  /** Raw per-occurrence gram hashes in POSITION order (index i = the gram
    * starting at token i) — the alignment [[hashesPos]] exposes so gram
    * strings and hashes can be zipped row-side. */
  private def build(tokens: ArrayData, n: Int): Array[Long] = {
    val m = tokens.numElements()
    if (m < n) return Array.emptyLongArray
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      // null elements hash as the empty string (same policy as winnow_fp)
      val s = tokens.getUTF8String(i)
      th(i) = XXH64.hashUTF8String(
        if (s == null) org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8 else s, 42L)
      i += 1
    }
    val out = new Array[Long](m - n + 1)
    i = 0
    while (i < out.length) {
      var h = th(i)
      var j = 1
      while (j < n) { h = XXH64.hashLong(th(i + j), h); j += 1 }
      out(i) = h
      i += 1
    }
    out
  }

  /** Position-ordered n-gram hash sequence WITH duplicates — element i is
    * the hash of the gram starting at token i, so `zip_with` against the
    * same row's gram strings aligns exactly. */
  def hashesPos(tokens: ArrayData, n: Int): ArrayData =
    new GenericArrayData(build(tokens, n))

  /** Sorted n-gram hash sequence WITH duplicates — one hash per gram
    * occurrence. Sorted so multiplicity consumers (run-length mode,
    * duplicate-gram fractions) get equal grams adjacent without a second
    * per-row sort. */
  def hashesAll(tokens: ArrayData, n: Int): ArrayData = {
    val out = build(tokens, n)
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  def hashes(tokens: ArrayData, n: Int): ArrayData = {
    val sorted = hashesAll(tokens, n)
    val len = sorted.numElements()
    if (len == 0) return sorted
    val out = new Array[Long](len)
    var i = 0
    while (i < len) { out(i) = sorted.getLong(i); i += 1 }
    var uniq = 1
    i = 1
    while (i < len) {
      if (out(i) != out(i - 1)) { out(uniq) = out(i); uniq += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, uniq))
  }
}

/** `ngram_hashes(tokens, n)` — distinct word-n-gram hash set (see
  * [[NGramHashesUtil]]). */
case class NGramHashes(child: Expression, n: Int) extends UnaryExpression {
  import org.apache.spark.sql.types.StringType

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if n > 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ngram_hashes expects ARRAY<STRING> and n > 0, got $t / n=$n")
    }
  override def prettyName: String = "ngram_hashes"

  override protected def nullSafeEval(a: Any): Any =
    NGramHashesUtil.hashes(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.NGramHashesUtil.hashes($a, $n)")

  override protected def withNewChildInternal(newChild: Expression): NGramHashes =
    copy(child = newChild)
}

object NGramHashes {
  def apply(tokens: Column, n: Int): Column =
    GraftBridge.column(NGramHashes(GraftBridge.expression(tokens), n))
}

/** `ngram_hashes_all(tokens, n)` — the multiplicity-preserving sibling of
  * [[NGramHashes]]: every gram occurrence keeps its hash, sorted ascending
  * (equal grams adjacent). Repetition-signal consumers derive gram counts,
  * mode, and duplicate fractions from this in one codegen'd kernel + one
  * linear fold, with no per-row string n-gram materialization. */
case class NGramHashesAll(child: Expression, n: Int) extends UnaryExpression {
  import org.apache.spark.sql.types.StringType

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if n > 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ngram_hashes_all expects ARRAY<STRING> and n > 0, got $t / n=$n")
    }
  override def prettyName: String = "ngram_hashes_all"

  override protected def nullSafeEval(a: Any): Any =
    NGramHashesUtil.hashesAll(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.NGramHashesUtil.hashesAll($a, $n)")

  override protected def withNewChildInternal(newChild: Expression): NGramHashesAll =
    copy(child = newChild)
}

object NGramHashesAll {
  def apply(tokens: Column, n: Int): Column =
    GraftBridge.column(NGramHashesAll(GraftBridge.expression(tokens), n))
}

/** `ngram_hashes_pos(tokens, n)` — position-ordered sibling of
  * [[NGramHashesAll]] (element i = hash of the gram starting at token i,
  * same hash chain, no sort): `zip_with` it against the row's gram
  * strings to carry (gram, hash) pairs without re-hashing strings. */
case class NGramHashesPos(child: Expression, n: Int) extends UnaryExpression {
  import org.apache.spark.sql.types.StringType

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if n > 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ngram_hashes_pos expects ARRAY<STRING> and n > 0, got $t / n=$n")
    }
  override def prettyName: String = "ngram_hashes_pos"

  override protected def nullSafeEval(a: Any): Any =
    NGramHashesUtil.hashesPos(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.NGramHashesUtil.hashesPos($a, $n)")

  override protected def withNewChildInternal(newChild: Expression): NGramHashesPos =
    copy(child = newChild)
}

object NGramHashesPos {
  def apply(tokens: Column, n: Int): Column =
    GraftBridge.column(NGramHashesPos(GraftBridge.expression(tokens), n))
}
