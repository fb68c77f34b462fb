package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed form of an add-one-smoothed bigram LM (CCNet-style quality
  * scoring, Wenzek et al. 2020): unigram and bigram counts from the
  * reference slice, keyed by UTF-8 token bytes.
  *
  * Shipped to executors ONCE via a `Broadcast` held by [[BigramNll]];
  * the hash maps are `@transient lazy` and rebuilt per executor from
  * the serialized key/count arrays, so lookup is O(1) per bigram where
  * the `typedlit`-map form this replaces paid a linear scan per lookup
  * (Catalyst's `GetMapValue` over `ArrayBasedMapData` walks the
  * entries — tokens × |model| comparisons per document, the round-8
  * scale-killer on q84).
  */
final class BigramLmModel(
    uniKeys: Array[Array[Byte]], uniCounts: Array[Long],
    biKeys: Array[Array[Byte]], biCounts: Array[Long]) extends Serializable {
  /** Vocabulary size — the add-one smoothing denominator offset. */
  val v: Long = uniKeys.length.toLong

  private def build(keys: Array[Array[Byte]], counts: Array[Long])
      : java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](keys.length * 2)
    var i = 0
    while (i < keys.length) {
      m.put(UTF8String.fromBytes(keys(i)), counts(i))
      i += 1
    }
    m
  }

  @transient lazy val uniMap: java.util.HashMap[UTF8String, java.lang.Long] =
    build(uniKeys, uniCounts)
  @transient lazy val biMap: java.util.HashMap[UTF8String, java.lang.Long] =
    build(biKeys, biCounts)
}

/** Compiled per-document bigram-NLL scorer: one pass over the text,
  * O(1) hashed model lookups, returning
  * `struct(n_bigrams BIGINT, nll DOUBLE, avg_nll DOUBLE)`.
  *
  * Arithmetic reproduces the round-6-LN DECIMAL ladder exactly (each
  * term rounded half-up to 6 decimals, summed as scale-6 fixed-point,
  * decimal→double cast, final round-6), so results hash-match the
  * previous expression form and the DuckDB oracle bit-for-bit.
  */
case class BigramNll(child: Expression, model: Broadcast[BigramLmModel])
    extends UnaryExpression {
  override def dataType: DataType = BigramNll.schema
  override def prettyName: String = "graft_bigram_nll"

  override def nullSafeEval(t: Any): Any =
    TextKernels.bigramNll(t.asInstanceOf[UTF8String], model.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bigramLmModel", model,
      classOf[Broadcast[_]].getName)
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.TextKernels.bigramNll($t, " +
        s"(graft.functions.BigramLmModel)$m.value())")
  }

  override protected def withNewChildInternal(c: Expression): BigramNll =
    copy(child = c)
}

object BigramNll {
  val schema: StructType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("nll", DoubleType, nullable = true),
    StructField("avg_nll", DoubleType, nullable = true)))
}
