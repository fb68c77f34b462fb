package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Frozen ordered-bucket boundaries for [[BucketSearch]]: `bucketOf`
  * is the upper-bound binary search "how many boundaries are ≤ key"
  * under Spark's NATURAL ROW ORDER (nulls first, NaN last — exactly
  * the order the device's window sort uses, so bucket assignment is
  * monotone in sort order by construction, null and NaN keys
  * included).
  *
  * Why an expression and not a `when`-tree of struct-literal
  * comparisons: the tree's generated code GROWS with the boundary
  * count — at 128 buckets Janino pays ~0.7 s compiling it on every
  * fresh plan (measured round 12, the q195 regression), and a
  * 1000-executor configuration would want thousands of buckets. Here
  * the generated code is ONE kernel call regardless of boundary
  * count; the boundaries ride along as a reference object, and the
  * comparator is the interpreted natural-ascending row ordering
  * (log₂(buckets) small-struct comparisons per row — measured
  * indistinguishable from the codegen'd tree on warm runs, without
  * the compile cliff).
  */
final class BucketBounds(
    val bounds: Array[InternalRow],
    val fieldTypes: Array[DataType]) extends Serializable {

  @transient private lazy val ord: Ordering[InternalRow] =
    RowOrdering.createNaturalAscendingOrdering(fieldTypes.toIndexedSeq)

  def bucketOf(key: InternalRow): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ord.compare(bounds(mid), key) <= 0) lo = mid + 1 else hi = mid
    }
    lo
  }
}

/** `graft_bucket(struct(keys...))` → INT bucket id in
  * [0, bounds.length] — see [[BucketBounds]]. The child is a
  * `CreateNamedStruct` of the ordering keys, never null, so the
  * default null-intolerant eval path applies.
  */
case class BucketSearch(child: Expression, model: BucketBounds)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_bucket"

  override def nullSafeEval(k: Any): Any =
    model.bucketOf(k.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bucketBounds", model,
      classOf[BucketBounds].getName)
    defineCodeGen(ctx, ev, k =>
      s"$m.bucketOf((org.apache.spark.sql.catalyst.InternalRow)$k)")
  }

  override protected def withNewChildInternal(c: Expression): BucketSearch =
    copy(child = c)
}
