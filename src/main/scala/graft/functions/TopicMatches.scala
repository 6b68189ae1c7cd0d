package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.unsafe.types.UTF8String

import graft.model.Topic

/** Parsed-pattern cache + match kernel shared by interpreted eval and
  * generated code. Patterns are usually query-constant, so parse-once
  * matters; topics are per-row and parsed with a cheap split that avoids
  * the full [[Topic.parse]] option machinery.
  */
object TopicMatchUtil {
  private final val MaxCache = 4096
  private val cache = new ConcurrentHashMap[String, (Array[String], Boolean)]()

  /** Invalid marker: a topic that failed to parse matches nothing. At scale
    * one malformed row must degrade to "no match", not abort the job. */
  private val Invalid: (Array[String], Boolean) = (null, false)

  private[graft] def parsed(s: String): (Array[String], Boolean) = {
    val hit = cache.get(s)
    if (hit != null) return hit
    val v =
      try {
        val t = Topic.parse(s)
        (t.parts.toArray, t.multi)
      } catch { case _: IllegalArgumentException => Invalid }
    if (cache.size < MaxCache) cache.putIfAbsent(s, v)
    v
  }

  private val SingleU = UTF8String.fromString(Topic.Single)

  /** Is this part the single-level wildcard `*`? */
  def isSingle(s: UTF8String): Boolean = SingleU == s

  def matchParts(a: Array[String], aMulti: Boolean,
                 b: Array[String], bMulti: Boolean): Boolean = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val x = a(i); val y = b(i)
      if (!(x == y || x == Topic.Single || y == Topic.Single)) return false
      i += 1
    }
    if (a.length == b.length) true
    else if (a.length < b.length) aMulti
    else bMulti
  }

  /** Entry point referenced from generated Java code. Malformed topics or
    * patterns simply match nothing. */
  def matchUTF8(topic: UTF8String, pattern: UTF8String): Boolean = {
    val (tp, tm) = parsed(topic.toString)
    if (tp == null) return false
    val (pp, pm) = parsed(pattern.toString)
    if (pp == null) return false
    matchParts(tp, tm, pp, pm)
  }
}

/** `topic_matches(topic, pattern)` — bidirectional wildcard topic match
  * (SURVEY §2.3; reference semantics trie.go:156-188, db_test.go:288-318).
  *
  * Catalyst `Predicate` with real `doGenCode` so it stays inside
  * whole-stage codegen; `CodegenFallback` would break the codegen span of
  * every scan that filters on topics.
  */
case class TopicMatches(left: Expression, right: Expression)
    extends BinaryExpression with Predicate {

  override def nullable: Boolean = left.nullable || right.nullable
  override def foldable: Boolean = left.foldable && right.foldable
  override def prettyName: String = "topic_matches"

  override protected def nullSafeEval(topic: Any, pattern: Any): Any =
    TopicMatchUtil.matchUTF8(
      topic.asInstanceOf[UTF8String], pattern.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, p) =>
      s"graft.functions.TopicMatchUtil.matchUTF8($t, $p)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopicMatches =
    copy(left = newLeft, right = newRight)
}

object TopicMatches {
  /** Column-API form: `topic_matches($"topic", lit("a.*.c"))`. */
  def apply(topic: Column, pattern: Column): Column =
    GraftBridge.column(TopicMatches(
      GraftBridge.expression(topic), GraftBridge.expression(pattern)))

  /** Register `topic_matches` for SQL use in the given session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topic_matches",
      exprs => TopicMatches(exprs.head, exprs(1)),
      "built-in")
}

/** Pre-parsed variant for the store read path: matches the *stored*
  * `topic_parts ARRAY<STRING>` + `is_multi BOOLEAN` columns against a
  * pattern frozen at plan time. Unlike [[TopicMatches]], no topic string
  * is parsed per row — with millions of distinct topics the
  * [[TopicMatchUtil]] cache would thrash, while this walks the array the
  * writer already materialized (SURVEY §2.3's "parse once at write").
  */
case class TopicPartsMatches(parts: Expression, isMulti: Expression,
    patternKey: String) extends BinaryExpression with Predicate {

  override def left: Expression = parts
  override def right: Expression = isMulti
  override def nullable: Boolean = parts.nullable || isMulti.nullable
  override def prettyName: String = "topic_parts_matches"

  /** Pattern parts as UTF8String, parsed once per plan (invalid pattern ⇒
    * matches nothing, same degradation contract as [[TopicMatchUtil]]). */
  @transient lazy val patternParts: Array[UTF8String] = {
    val (p, _) = TopicMatchUtil.parsed(patternKey)
    if (p == null) null else p.map(UTF8String.fromString)
  }
  @transient lazy val patternMulti: Boolean = TopicMatchUtil.parsed(patternKey)._2

  /** Two-pointer walk shared by interpreted eval and generated code. */
  def matchStored(a: org.apache.spark.sql.catalyst.util.ArrayData,
      aMulti: Boolean): Boolean = {
    val b = patternParts
    if (b == null) return false
    val an = a.numElements()
    val n = math.min(an, b.length)
    var i = 0
    while (i < n) {
      val x = a.getUTF8String(i); val y = b(i)
      if (!(x == y || TopicMatchUtil.isSingle(x) || TopicMatchUtil.isSingle(y)))
        return false
      i += 1
    }
    if (an == b.length) true
    else if (an < b.length) aMulti
    else patternMulti
  }

  override protected def nullSafeEval(a: Any, m: Any): Any =
    matchStored(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      m.asInstanceOf[Boolean])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tpm", this,
      "graft.functions.TopicPartsMatches")
    defineCodeGen(ctx, ev, (a, m) => s"$ref.matchStored($a, $m)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopicPartsMatches =
    copy(parts = newLeft, isMulti = newRight)
}

object TopicPartsMatches {
  /** Column-API form over stored part arrays. */
  def apply(parts: Column, isMulti: Column, patternKey: String): Column =
    GraftBridge.column(TopicPartsMatches(
      GraftBridge.expression(parts), GraftBridge.expression(isMulti), patternKey))
}
