package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-reference jq text micro-kernels (round-17 VERDICT
  * directive 3 — the `when(c.isNull, …).otherwise(f(c))` audit).
  *
  * A null guard whose scrutinee reappears in the otherwise branch
  * splices the input tree TWICE, and Catalyst's subexpression
  * elimination never unifies a conditional branch with its predicate
  * (only predicate-side occurrences are CSE-eligible) — over a
  * HOF-fed input the doubled splice measured +40% on q220. The date/
  * timestamp render sites guarded on null ONLY to keep the quote-
  * stripping arithmetic from corrupting to_json's "null" text
  * ("null" → "ul"). These kernels make the null case a data case
  * instead: one reference, one compiled call, total over to_json's
  * output space.
  *
  * jq semantics served (the reference pipes records through the jq
  * binary, ext/jq/connector.go:101-127):
  *   - [[JqUnquote]]: a date/timestamp value is a JSON STRING on
  *     jq's side, and interpolation/tostring render strings RAW —
  *     strip the quotes from the to_json text; a null value's "null"
  *     text passes through, exactly the bytes jq prints for null.
  *   - [[JqStrLen]]: jq `length` over a string counts code points;
  *     over null it is 0 — to_json's quoted text has numChars-2 of
  *     them, and its "null" text maps to 0.
  */
object JqText {
  def unquote(s: UTF8String): UTF8String = {
    val n = s.numChars()
    if (n >= 2 && s.getByte(0) == '"') s.substring(1, n - 1) else s
  }

  def strLen(s: UTF8String): Int = {
    val n = s.numChars()
    if (n >= 2 && s.getByte(0) == '"') n - 2 else 0
  }

  private[functions] val builders: Seq[(String, Seq[Expression] => Expression)] =
    Seq(
      "graft_jq_unquote" -> (es => JqUnquote(es.head)),
      "graft_jq_strlen" -> (es => JqStrLen(es.head)))

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "built-in")
    }
}

/** Strip the JSON quotes from a to_json scalar text; unquoted text
  * (the "null" of a null value) passes through. Null-propagating. */
case class JqUnquote(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_jq_unquote"

  override def nullSafeEval(input: Any): Any =
    JqText.unquote(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.JqText.unquote($c)")

  override protected def withNewChildInternal(newChild: Expression): JqUnquote =
    copy(child = newChild)
}

/** jq string length (code points) of a to_json scalar text: quoted
  * text counts its content, the "null" of a null value counts 0. */
case class JqStrLen(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_jq_strlen"

  override def nullSafeEval(input: Any): Any =
    JqText.strLen(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.JqText.strLen($c)")

  override protected def withNewChildInternal(newChild: Expression): JqStrLen =
    copy(child = newChild)
}
