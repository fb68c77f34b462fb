package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Evaluation barrier: a pass-through that reports itself
  * NON-deterministic so the optimizer cannot duplicate the wrapped
  * expression across operators.
  *
  * Why it exists: `df.select(expensive.as("x")).filter($"x" >= y)`
  * looks like it evaluates `expensive` once, but
  * `PushPredicateThroughNonJoin` substitutes the defining expression
  * into the pushed-down predicate, so every row pays for `expensive`
  * twice — once in the Filter below the Project and again in the
  * Project (Catalyst has no cross-operator common-subexpression
  * elimination). Wrapping the projected column in `graft_once(...)`
  * pins the Filter above the Project (the pushdown rule requires all
  * project fields to be deterministic), so the kernel runs once and the
  * filter reads the column. The value is still deterministic in
  * reality — the flag is only an optimizer fence.
  *
  * Cost of the fence: predicates on OTHER columns also stop being
  * pushed through that projection, so apply cheap scan-level filters
  * BEFORE the projection that uses the barrier.
  */
case class EvalOnce(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override lazy val deterministic: Boolean = false
  override def prettyName: String = "graft_once"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): EvalOnce =
    copy(child = newChild)
}

object EvalOnce {
  private[functions] val builders: Seq[(String, Seq[Expression] => Expression)] =
    Seq("graft_once" -> (es => EvalOnce(es.head)))

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "built-in")
    }
}
