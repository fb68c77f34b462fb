package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType}

/** jq's STRICT numeric operators `- * /` for render-destined
  * arithmetic (the round-18 null-operand hunt).
  *
  * jq errors on a null operand of `- * /` ("null (null) and number
  * (2) cannot be multiplied", jv_aux) and on a zero divisor — where
  * the compiled SQL operators null-propagate, so a null operand
  * SILENTLY rendered "null" bytes (and x/0 rendered the clamped
  * max-double print) on records jq errors out of the stream. Per the
  * reject-rather-than-guess convention these raise at RUNTIME, like
  * the 2^53 composite guard: the value is data.
  *
  * A single-reference kernel, not a `when(isNull, raise)` guard —
  * that shape re-splices its operand trees (the directive-3 audit
  * class). Codegen evaluates each child once and passes its null
  * flag explicitly.
  *
  * `+` needs no kernel: jq treats null as the identity there
  * (`null + 1` is 1), which `coalesce(a + b, a, b)` expresses with
  * lazy single-evaluation on the common path.
  *
  * Applied only under the compiler's doubleArith (render) positions;
  * STRUCTURAL arithmetic keeps SQL null-propagation — the typed
  * DataFrame is the output contract there (see Jq.Env.doubleArith).
  */
object JqArith {
  val SUB = 0
  val MUL = 1
  val DIV = 2
  val MOD = 3

  private val verbs = Array("subtracted", "multiplied", "divided",
    "divided (remainder)")

  def compute(op: Int, lNull: Boolean, l: Double,
      rNull: Boolean, r: Double): Double = {
    if (lNull || rNull)
      throw new ArithmeticException(
        "graft jq: a null operand cannot be " + verbs(op) +
          " (jq errors this record) — use the JqEscapeHatch")
    op match {
      case SUB => l - r
      case MUL => l * r
      case DIV =>
        if (r == 0.0d)
          throw new ArithmeticException(
            "graft jq: division by zero (jq errors this record) — " +
              "use the JqEscapeHatch")
        l / r
      case MOD =>
        // jq's % truncates BOTH operands to integers — of the DOUBLE
        // values it parsed (5.7 % 2.9 is 5 % 2 = 1, and
        // 9007199254740993 % 10 is 2, the mod of the rounded …992,
        // where long-space arithmetic says 3); a zero truncated
        // modulus errors
        val li = l.toLong
        val ri = r.toLong
        if (ri == 0L)
          throw new ArithmeticException(
            "graft jq: modulus by zero (jq errors this record) — " +
              "use the JqEscapeHatch")
        (li % ri).toDouble
    }
  }

  private[functions] val builders: Seq[(String, Seq[Expression] => Expression)] =
    Seq(
      "graft_jq_sub" -> (es => JqStrictArith(SUB,
        Cast(es(0), DoubleType), Cast(es(1), DoubleType))),
      "graft_jq_mul" -> (es => JqStrictArith(MUL,
        Cast(es(0), DoubleType), Cast(es(1), DoubleType))),
      "graft_jq_div" -> (es => JqStrictArith(DIV,
        Cast(es(0), DoubleType), Cast(es(1), DoubleType))),
      "graft_jq_mod" -> (es => JqStrictArith(MOD,
        Cast(es(0), DoubleType), Cast(es(1), DoubleType))))

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "built-in")
    }
}

case class JqStrictArith(op: Int, left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String =
    Seq("graft_jq_sub", "graft_jq_mul", "graft_jq_div", "graft_jq_mod")(op)

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    JqArith.compute(op,
      l == null, if (l == null) 0d else l.asInstanceOf[Double],
      r == null, if (r == null) 0d else r.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    ev.copy(
      code = code"""
        ${l.code}
        ${r.code}
        double ${ev.value} = graft.functions.JqArith.compute(
          $op, ${l.isNull}, ${l.value}, ${r.isNull}, ${r.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JqStrictArith =
    copy(left = newLeft, right = newRight)
}
