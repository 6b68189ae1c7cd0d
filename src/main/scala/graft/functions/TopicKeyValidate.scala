package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.model.TopicKey

/** `topic_key_valid(key, topic, contract)` — the S5 key check
  * ([[TopicKey.validate]]: base32 decode + permission bits + salted
  * target-hash compare, reference key.go:123-140,188-192) as a native
  * Expression, so the subscribe resolution plan stays inside whole-stage
  * codegen instead of dropping to a Scala UDF (the one UDF the r8 audit
  * found in the streaming path). Pure bit math over the operands — safe
  * to mark foldable-when-constant and run distributively at any scale. */
object TopicKeyValidateUtil {
  def check(key: UTF8String, topic: UTF8String, flag: Int,
      contract: Long): Boolean =
    TopicKey.validate(
      if (key == null) "" else key.toString,
      if (topic == null) "" else topic.toString,
      flag, contract)
}

case class TopicKeyValidate(first: Expression, second: Expression,
    third: Expression, flag: Int) extends TernaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "topic_key_valid"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"topic_key_valid expects (STRING, STRING, BIGINT), got $t")
    }

  override protected def nullSafeEval(k: Any, t: Any, c: Any): Any =
    TopicKeyValidateUtil.check(k.asInstanceOf[UTF8String],
      t.asInstanceOf[UTF8String], flag, c.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (k, t, c) =>
      s"graft.functions.TopicKeyValidateUtil.check($k, $t, $flag, $c)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): TopicKeyValidate =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object TopicKeyValidate {
  def apply(key: Column, topic: Column, contract: Column, flag: Int): Column =
    GraftBridge.column(TopicKeyValidate(GraftBridge.expression(key),
      GraftBridge.expression(topic), GraftBridge.expression(contract), flag))
}
