package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed trigram-profile language-ID model: per language, the top-k
  * character n-grams learned from the labeled slice. Shipped to
  * executors ONCE via `Broadcast` held by [[LangOverlap]]; the
  * gram → language-indices map is `@transient lazy`, rebuilt per
  * executor, so classifying a document is ONE pass over its distinct
  * grams with O(1) lookups — where the `array_intersect`-per-language
  * form rebuilt a hash set per (row × language) call (the q55 3.4 s
  * residual at sf0.1).
  *
  * `langs` must be sorted ascending: argmax keeps the FIRST max, which
  * then matches the encoded-greatest tie-break (alphabetically-first
  * language) of the expression form and the DuckDB oracle.
  */
final class LangIdModel(
    val langs: Array[String],
    gramKeys: Array[Array[Byte]],
    gramLangs: Array[Array[Int]],
    val n: Int) extends Serializable {

  @transient lazy val map: java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]](gramKeys.length * 2)
    var i = 0
    while (i < gramKeys.length) {
      m.put(UTF8String.fromBytes(gramKeys(i)), gramLangs(i))
      i += 1
    }
    m
  }
}

object LangIdModel {
  /** Build from (lang → profile grams); langs sorted ascending. */
  def apply(byLang: Seq[(String, Seq[String])], n: Int): LangIdModel = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val langs = byLang.map(_._1).toArray
    val gramToLangs = new java.util.LinkedHashMap[String, java.util.ArrayList[Integer]]()
    byLang.zipWithIndex.foreach { case ((_, tris), i) =>
      tris.foreach { g =>
        var l = gramToLangs.get(g)
        if (l == null) { l = new java.util.ArrayList[Integer](); gramToLangs.put(g, l) }
        l.add(i)
      }
    }
    val keys = new Array[Array[Byte]](gramToLangs.size)
    val vals = new Array[Array[Int]](gramToLangs.size)
    val it = gramToLangs.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      keys(i) = e.getKey.getBytes(utf8)
      val al = e.getValue
      val a = new Array[Int](al.size)
      var j = 0
      while (j < al.size) { a(j) = al.get(j); j += 1 }
      vals(i) = a
      i += 1
    }
    new LangIdModel(langs, keys, vals, n)
  }
}

/** Compiled language classifier: `struct(lang STRING, score BIGINT)` —
  * the language whose profile shares the most DISTINCT character
  * n-grams with the document (ties → first/alphabetical), "und" with
  * score 0 when nothing overlaps. One pass per document.
  */
case class LangOverlap(child: Expression, model: Broadcast[LangIdModel])
    extends UnaryExpression {
  override def dataType: DataType = LangOverlap.schema
  override def prettyName: String = "graft_lang_overlap"

  override def nullSafeEval(t: Any): Any =
    TextKernels.langOverlap(t.asInstanceOf[UTF8String], model.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("langIdModel", model,
      classOf[Broadcast[_]].getName)
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.TextKernels.langOverlap($t, " +
        s"(graft.functions.LangIdModel)$m.value())")
  }

  override protected def withNewChildInternal(c: Expression): LangOverlap =
    copy(child = c)
}

object LangOverlap {
  val schema: StructType = StructType(Seq(
    StructField("lang", StringType, nullable = false),
    StructField("score", LongType, nullable = false)))
}
