package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for expressions that carry non-literal
  * state (e.g. a broadcast model) and therefore cannot ride the
  * `FunctionRegistry` → `call_function` path, whose builders only see
  * child `Expression`s.
  *
  * Spark 4 moved the converters behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so this one-file
  * shim lives under `org.apache.spark.sql` — the standard extension
  * seam used by Spark-native libraries; everything referenced is
  * public Spark API at the bytecode level and stable across the 4.x
  * line.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
