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
