package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, ByteType, DataType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

object BloomKernels {
  def containsLong(v: Long, bf: Broadcast[BloomFilter]): Boolean =
    bf.value.mightContainLong(v)
  def containsUtf8(v: UTF8String, bf: Broadcast[BloomFilter]): Boolean =
    bf.value.mightContainBinary(v.getBytes)
}

/** Scan-stage membership probe against a broadcast Bloom filter — the
  * semi-join-reduction primitive: rows failing the probe never reach
  * the join exchange. No false negatives (every true match passes);
  * false positives are culled by the exact join that follows.
  * Integral keys probe `mightContainLong` (matching
  * `DataFrameStatFunctions.bloomFilter`'s put side); strings probe
  * their UTF-8 bytes.
  */
case class BloomMightContain(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom probe supports integral and string keys, got $other")
    }

  private def isString: Boolean = child.dataType == StringType

  override def nullSafeEval(v: Any): Any =
    if (isString) BloomKernels.containsUtf8(v.asInstanceOf[UTF8String], bloom)
    else BloomKernels.containsLong(v.asInstanceOf[Number].longValue(), bloom)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloomFilter", bloom,
      classOf[Broadcast[_]].getName)
    if (isString)
      defineCodeGen(ctx, ev, v =>
        s"graft.functions.BloomKernels.containsUtf8($v, $bf)")
    else
      defineCodeGen(ctx, ev, v =>
        s"graft.functions.BloomKernels.containsLong((long) $v, $bf)")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}
