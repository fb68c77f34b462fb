package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression reproducing the reference's CSV float
  * formatting (internal/ext/fileconverter/json2csv.go:125-134): whole
  * numbers render without a decimal part (`%.0f`), other floats in Go's
  * shortest round-trip form (`strconv.FormatFloat(f, 'f', -1, 64)`).
  *
  * Implemented as a codegen'd `UnaryExpression` (not a Scala UDF): the
  * generated code calls the static formatter, so the projection stays
  * inside whole-stage codegen with no closure/serialization overhead —
  * the preferred extension path when byte-compatible scalar behavior is
  * required (SURVEY §7.3).
  */
case class GoFloatString(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "go_float_str"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(GoFloatString.format(input.asInstanceOf[Double]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.GoFloatString.format($c))")

  override protected def withNewChildInternal(newChild: Expression): GoFloatString =
    copy(child = newChild)
}

object GoFloatString {
  /** Go-compatible rendering: `%.0f` for integral values, shortest
    * round-trip decimal otherwise ('f' format, no exponent).
    */
  def format(d: Double): String = {
    if (d == Math.floor(d) && !d.isInfinite && Math.abs(d) < 1e15) {
      java.lang.String.format(java.util.Locale.ROOT, "%.0f",
        java.lang.Double.valueOf(d))
    } else {
      // Double.toString already emits the same shortest round-trip digits
      // Go's strconv.FormatFloat(f,'f',-1,64) picks; only the exponent
      // notation differs. Expand scientific form to plain 'f' via
      // BigDecimal(String), which is exact for decimal strings (unlike
      // BigDecimal(double), whose binary expansion cannot round up).
      val s = java.lang.Double.toString(d)
      if (s.indexOf('E') < 0) s
      else {
        val plain = new java.math.BigDecimal(s).toPlainString
        // Strip trailing fractional zeros Go would not print. toPlainString
        // keeps the mantissa's digit count, so '1.0E-4' expands to '0.00010'
        // (and '1.0E16' to '10000000000000000.0' never — but the generic
        // trim covers both): drop trailing '0's after the point, then a
        // bare trailing '.'.
        if (plain.indexOf('.') < 0) plain
        else {
          var end = plain.length
          while (end > 0 && plain.charAt(end - 1) == '0') end -= 1
          if (end > 0 && plain.charAt(end - 1) == '.') end -= 1
          plain.substring(0, end)
        }
      }
    }
  }

  /** Register as SQL function `go_float_str` for `expr()`/`spark.sql`.
    * The argument is cast to double at registration (in place of an
    * `ExpectsInputTypes` mixin, whose types are `private[sql]`).
    */
  private[functions] val builders
      : Seq[(String, Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
    "go_float_str" -> (exprs =>
      GoFloatString(org.apache.spark.sql.catalyst.expressions.Cast(
        exprs.head, org.apache.spark.sql.types.DoubleType))))

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "built-in")
    }
}
