package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Compiled vector kernels for the similarity/ANN operators.
  *
  * The naive Spark expression for a dot product —
  * `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` — runs the lambda
  * INTERPRETED per element (higher-order functions have no codegen),
  * which measured ~µs/element and dominated every pairwise-similarity
  * query. These expressions evaluate the whole vector in one compiled
  * loop (same left-to-right summation order as the fold, so results are
  * bit-identical to the HOF form and to DuckDB's `list_inner_product`
  * used by the oracle).
  *
  * Null handling: a null element, a zero norm, or a DIMENSION MISMATCH
  * yields NaN in the kernel, surfaced as SQL NULL (the HOF form padded
  * the shorter vector with nulls via `zip_with`, which nulled the fold —
  * a partial dot over min(len) would silently hide a dimension bug).
  * Known conflation: a vector whose ELEMENTS contain NaN also surfaces
  * as SQL NULL here (the HOF form returned NaN); similarity over NaN
  * coordinates is meaningless either way, and NULL keeps it out of
  * top-k/threshold results on both engines.
  */
object VectorKernels {
  /** Left-to-right dot product; NaN if lengths differ or any element is null. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    if (a.numElements() != b.numElements()) return Double.NaN
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return Double.NaN
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  /** cos(a,b) = dot / (||a|| * ||b||), all three sums accumulated
    * left-to-right in one pass (identical values to separate folds).
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    if (a.numElements() != b.numElements()) return Double.NaN
    val n = a.numElements()
    var sab = 0.0; var saa = 0.0; var sbb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return Double.NaN
      val x = a.getDouble(i); val y = b.getDouble(i)
      sab += x * y; saa += x * x; sbb += y * y
      i += 1
    }
    sab / (math.sqrt(saa) * math.sqrt(sbb))
  }

  /** Squared L2 distance (IVF cell assignment). */
  def l2sq(a: ArrayData, b: ArrayData): Double = {
    if (a.numElements() != b.numElements()) return Double.NaN
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return Double.NaN
      val d = a.getDouble(i) - b.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  /** Johnson–Lindenstrauss random projection to `k` dims with an
    * Achlioptas ±1 sign matrix derived ON THE FLY from xxhash64 of
    * (row, col, seed): out_f = Σ_j sign(f,j) · v_j / √k. No k×d matrix
    * is ever materialized or shipped — the "matrix" is a hash function,
    * so executors need only (k, seed) and results are deterministic
    * across reruns/engines. One compiled k·d loop per vector; null
    * elements yield a null output vector.
    */
  def randomProject(v: ArrayData, k: Int, seed: Long): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val d = v.numElements()
    val out = new Array[Double](k)
    val inv = 1.0 / math.sqrt(k.toDouble)
    var j = 0
    while (j < d) {
      if (v.isNullAt(j)) return null
      val x = v.getDouble(j)
      var f = 0
      while (f < k) {
        val h = XXH64.hashLong(j.toLong * 2654435761L + f, seed)
        if ((h & 1L) == 0L) out(f) += x else out(f) -= x
        f += 1
      }
      j += 1
    }
    var f = 0
    while (f < k) { out(f) *= inv; f += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  protected def kernel: String // static method name on VectorKernels

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = kernel match {
      case "dot" => VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      case "cosine" => VectorKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      case "l2sq" => VectorKernels.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    }
    if (java.lang.Double.isNaN(r)) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = graft.functions.VectorKernels.$kernel($a, $b);
      if (Double.isNaN(${ev.value})) { ${ev.isNull} = true; }
    """)
}

case class CosineSim(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "graft_cosine"
  override protected def kernel: String = "cosine"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

case class DotProd(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "graft_dot"
  override protected def kernel: String = "dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProd =
    copy(left = l, right = r)
}

case class L2Sq(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "graft_l2sq"
  override protected def kernel: String = "l2sq"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2Sq =
    copy(left = l, right = r)
}

case class RandomProject(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_random_project"
  override def nullSafeEval(v: Any, k: Any, seed: Any): Any =
    VectorKernels.randomProject(v.asInstanceOf[ArrayData],
      k.asInstanceOf[Int], seed.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, k, seed) => s"""
      ${ev.value} = graft.functions.VectorKernels.randomProject($v, $k, $seed);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): RandomProject =
    copy(first = f, second = s, third = t)
}

object VectorExprs {
  private def asDoubleArray(e: Expression): Expression =
    Cast(e, ArrayType(DoubleType))

  /** Register graft_cosine / graft_dot / graft_l2sq; arguments are cast
    * to array<double> (float embeddings upcast once at the source scan,
    * not per pair).
    */
  private[functions] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cosine" -> (es => CosineSim(asDoubleArray(es(0)), asDoubleArray(es(1)))),
    "graft_dot" -> (es => DotProd(asDoubleArray(es(0)), asDoubleArray(es(1)))),
    "graft_l2sq" -> (es => L2Sq(asDoubleArray(es(0)), asDoubleArray(es(1)))),
    "graft_random_project" -> (es => RandomProject(asDoubleArray(es(0)),
      Cast(es(1), org.apache.spark.sql.types.IntegerType),
      Cast(es(2), org.apache.spark.sql.types.LongType))))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }
}
