package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

object NormalizeKernels {
  /** Unicode NFC (canonical composition) — the canonicalization pass
    * that runs before content digests so visually-identical texts
    * ('é' vs 'e'+U+0301) dedup together.
    */
  def nfc(t: UTF8String): UTF8String = {
    val s = t.toString
    // the common case (ASCII and already-composed text) is a no-op:
    // isNormalized avoids allocating a copy per row
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) t
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}

/** Compiled scan-stage NFC normalization. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(t: Any): Any =
    NormalizeKernels.nfc(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.NormalizeKernels.nfc($t)")

  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}
