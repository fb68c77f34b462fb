package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.Collect
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.DataType

/** `collect_list` with a hard per-group buffer bound: the aggregation
  * buffer stops growing at `cap + 1` elements (update AND merge), so a
  * hot key can never materialize an unbounded array in one
  * aggregation buffer — the 100 TB skew/memory hazard of the bucket
  * shape (guide §2.5/§5). The `+ 1` sentinel keeps over-cap groups
  * DETECTABLE: a group whose true size exceeds `cap` evals to exactly
  * `cap + 1` elements, so the caller's existing
  * `size(ids) BETWEEN 2 AND cap` filter (LSH/winnow: drop boilerplate
  * buckets) or `size(ids) > cap → raise_error` guard (prefix-filter:
  * completeness contract) fires exactly as it did over an unbounded
  * `collect_list`, while the memory per group is O(cap) instead of
  * O(group size).
  *
  * Which elements survive in an over-cap buffer is arrival-order
  * dependent and deliberately unspecified: every caller either drops
  * or raises on such groups, so the contents are never read. Under-cap
  * groups collect EVERY element — results are bit-identical to
  * `collect_list` (callers sort the array or consume it
  * order-insensitively, same as before).
  *
  * Extends Spark's own [[Collect]] so null-skipping, buffer element
  * copying, and partial-aggregation serialization are exactly
  * `collect_list`'s (same ObjectHashAggregate execution), and the
  * bound shows up in `explain` as `graft_bounded_collect_list` — the
  * pre-prune is plan-visible.
  */
case class BoundedCollectList(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends Collect[mutable.ArrayBuffer[Any]]
  with UnaryLike[Expression] {

  require(cap >= 1 && cap < Int.MaxValue,
    s"graft_bounded_collect_list: cap must be in [1, 2^31-2], got $cap")

  override lazy val bufferElementType: DataType = child.dataType

  override def convertToBufferElement(value: Any): Any =
    InternalRow.copyValue(value)

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty

  override def update(
      buffer: mutable.ArrayBuffer[Any],
      input: InternalRow): mutable.ArrayBuffer[Any] =
    if (buffer.length > cap) buffer else super.update(buffer, input)

  override def merge(
      buffer: mutable.ArrayBuffer[Any],
      other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    val room = cap + 1 - buffer.length
    if (room <= 0) buffer else buffer ++= other.take(room)
  }

  override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buffer.toArray)

  override def prettyName: String = "graft_bounded_collect_list"

  override def withNewMutableAggBufferOffset(n: Int): BoundedCollectList =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BoundedCollectList =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(
      newChild: Expression): BoundedCollectList = copy(child = newChild)
}

/** `collect_set` with the same hard bound: the buffer is a hash set
  * that stops admitting NEW distinct elements at `cap + 1` — the
  * [[BoundedCollectList]] contract for set semantics (the
  * crossGroupOverlap digest-shared-by-every-group hazard). Under-cap
  * groups hold exactly their distinct element set; over-cap groups
  * eval to `cap + 1` distinct elements so the caller's raise/drop
  * guard fires unchanged.
  */
case class BoundedCollectSet(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends Collect[mutable.HashSet[Any]]
  with UnaryLike[Expression] {

  require(cap >= 1 && cap < Int.MaxValue,
    s"graft_bounded_collect_set: cap must be in [1, 2^31-2], got $cap")

  override lazy val bufferElementType: DataType = child.dataType

  override def convertToBufferElement(value: Any): Any =
    InternalRow.copyValue(value)

  override def createAggregationBuffer(): mutable.HashSet[Any] =
    mutable.HashSet.empty

  override def update(
      buffer: mutable.HashSet[Any],
      input: InternalRow): mutable.HashSet[Any] =
    if (buffer.size > cap) buffer else super.update(buffer, input)

  override def merge(
      buffer: mutable.HashSet[Any],
      other: mutable.HashSet[Any]): mutable.HashSet[Any] = {
    val it = other.iterator
    while (buffer.size <= cap && it.hasNext) buffer += it.next()
    buffer
  }

  override def eval(buffer: mutable.HashSet[Any]): Any =
    new GenericArrayData(buffer.toArray)

  override def prettyName: String = "graft_bounded_collect_set"

  override def withNewMutableAggBufferOffset(n: Int): BoundedCollectSet =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BoundedCollectSet =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(
      newChild: Expression): BoundedCollectSet = copy(child = newChild)
}
