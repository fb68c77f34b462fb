package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** The COMPLETE frozen key table of a small stratified-rank input —
  * the degenerate-size fast path of the prefix device
  * ([[graft.ops.Prefix]]): when the device's order-independent
  * boundary sample returns FEWER rows than its limit, the sample IS
  * the whole table, and rank / stratum-size / exclusive-prefix-sum
  * become pure map-side lookups against this model — no repartition,
  * no window, no side-table join, no extra jobs. The distributed
  * two-phase device remains the path above the sample limit, so
  * nothing here caps scale; this only removes the machinery where
  * the machinery is pure overhead (measured: the q189 RFM cascade of
  * three rank devices over a 1 500-row per-user table spent >2 s in
  * per-stage sample/shuffle/join fixed costs, round 12).
  *
  * Keys are sorted by Spark's natural ascending row order (nulls
  * first, NaN last — identical to the window sort) and must be
  * UNIQUE (the device's callers all order by a unique tiebreak;
  * [[graft.ops.Prefix]] falls back to the distributed path when the
  * sample contains a duplicate, preserving the window's semantics
  * for tied rows). Rank within stratum therefore equals
  * `row_number()` exactly; `prefix` mirrors the window's
  * null-skipping exclusive running sum (null value → null prefix,
  * does not advance). Sums use `Math.addExact` so a driver-side
  * overflow throws like ANSI engine sums instead of wrapping.
  *
  * Like [[BucketBounds]], the model rides the plan as a reference
  * object: generated code is ONE kernel call whatever the table
  * size, so codegen cost is constant (the q195 when-tree lesson).
  */
final class KeyTable(
    val keys: Array[InternalRow],
    val fieldTypes: Array[DataType],
    val stratumFields: Int,
    val rk: Array[Long],
    val n: Array[Long],
    val prefix: Array[Long],
    val prefixNull: Array[Boolean]) extends Serializable {

  @transient private lazy val ord: Ordering[InternalRow] =
    RowOrdering.createNaturalAscendingOrdering(fieldTypes.toIndexedSeq)

  private def indexOf(key: InternalRow): Int = {
    var lo = 0
    var hi = keys.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = ord.compare(keys(mid), key)
      if (c == 0) return mid
      else if (c < 0) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  /** mode 0 = rank (1-based within stratum), 1 = stratum size,
    * 2 = exclusive prefix sum (nullable). A key absent from the
    * table (only possible if the input is nondeterministic — the
    * same condition under which the window path is undefined)
    * yields NULL rather than a wrong value. */
  def lookup(key: InternalRow, mode: Int): java.lang.Long = {
    val i = indexOf(key)
    if (i < 0) null
    else if (mode == 0) java.lang.Long.valueOf(rk(i))
    else if (mode == 1) java.lang.Long.valueOf(n(i))
    else if (prefixNull(i)) null
    else java.lang.Long.valueOf(prefix(i))
  }
}

object KeyTable {
  /** Builds the model from the complete sample, or None if any two
    * full keys are equal (tied rows are only well-defined through
    * the window path's arbitrary-but-consistent numbering). `vals`
    * is aligned with `sortedKeys` (null slot = NULL value) and may
    * be empty when no prefix sums are needed.
    */
  def build(
      sortedKeys: Array[InternalRow],
      fieldTypes: Array[DataType],
      stratumFields: Int,
      vals: Array[java.lang.Long]): Option[KeyTable] = {
    val m = sortedKeys.length
    val full = RowOrdering.createNaturalAscendingOrdering(
      fieldTypes.toIndexedSeq)
    val strat = RowOrdering.createNaturalAscendingOrdering(
      fieldTypes.take(stratumFields).toIndexedSeq)
    val rk = new Array[Long](m)
    val n = new Array[Long](m)
    val withVals = vals.nonEmpty
    val prefix = new Array[Long](if (withVals) m else 0)
    val prefixNull = new Array[Boolean](if (withVals) m else 0)
    var i = 0
    var segStart = 0
    var running = 0L
    while (i < m) {
      if (i > 0) {
        if (full.compare(sortedKeys(i - 1), sortedKeys(i)) == 0)
          return None // duplicate full key → distributed path
        if (strat.compare(sortedKeys(i - 1), sortedKeys(i)) != 0) {
          val size = (i - segStart).toLong
          var j = segStart
          while (j < i) { n(j) = size; j += 1 }
          segStart = i
          running = 0L
        }
      }
      rk(i) = (i - segStart + 1).toLong
      if (withVals) {
        val v = vals(i)
        if (v == null) prefixNull(i) = true
        else { prefix(i) = running; running = Math.addExact(running, v.longValue()) }
      }
      i += 1
    }
    if (m > 0) {
      val size = (m - segStart).toLong
      var j = segStart
      while (j < m) { n(j) = size; j += 1 }
    }
    Some(new KeyTable(sortedKeys, fieldTypes, stratumFields, rk, n,
      prefix, prefixNull))
  }
}

/** `graft_keytable(struct(keys...))` → LONG rank / stratum size /
  * exclusive prefix, looked up in the frozen [[KeyTable]]. The child
  * is a `CreateNamedStruct`, never null.
  */
case class KeyTableLookup(child: Expression, model: KeyTable, mode: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_keytable"

  override def nullSafeEval(k: Any): Any =
    model.lookup(k.asInstanceOf[InternalRow], mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("keyTable", model, classOf[KeyTable].getName)
    nullSafeCodeGen(ctx, ev, k => {
      s"""
         |java.lang.Long ${ev.value}_r = $m.lookup(
         |  (org.apache.spark.sql.catalyst.InternalRow)$k, $mode);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.longValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): KeyTableLookup =
    copy(child = c)
}
