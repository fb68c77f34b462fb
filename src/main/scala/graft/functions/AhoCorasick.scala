package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick multi-pattern automaton (Aho & Corasick 1975) over
  * code points — the blocklist-gate primitive: one pass per document
  * finds every keyword occurrence where k separate `contains` probes
  * would re-scan the text k times. Positions are 1-based code-point
  * indices, matching SQL `position(k IN text)` semantics.
  *
  * The keyword list is the model (config-sized); the automaton is
  * `@transient lazy`, rebuilt once per executor from the serialized
  * keywords.
  */
final class AcModel(val keywords: Array[String]) extends Serializable {
  require(keywords.nonEmpty && keywords.forall(_.nonEmpty),
    "AcModel: keywords must be non-empty strings")
  require(keywords.distinct.length == keywords.length,
    "AcModel: duplicate keywords would double-count n_kw")

  @transient lazy val kwCp: Array[Array[Int]] = keywords.map(_.codePoints().toArray)

  /** goto maps, fail links, and per-node completed keyword indices. */
  @transient lazy val (next, fail, out) = {
    val nxt = mutable.ArrayBuffer(new java.util.HashMap[Integer, Integer]())
    val outs = mutable.ArrayBuffer(mutable.ArrayBuffer[Int]())
    // trie
    var k = 0
    while (k < kwCp.length) {
      var node = 0
      for (cp <- kwCp(k)) {
        val hop = nxt(node).get(cp)
        node = if (hop != null) hop.intValue
        else {
          nxt += new java.util.HashMap[Integer, Integer]()
          outs += mutable.ArrayBuffer[Int]()
          nxt(node).put(cp, nxt.length - 1)
          nxt.length - 1
        }
      }
      outs(node) += k
      k += 1
    }
    // BFS fail links; merge suffix outputs
    val fl = Array.fill(nxt.length)(0)
    val queue = mutable.Queue[Int]()
    nxt(0).forEach((_, v) => queue.enqueue(v.intValue))
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      nxt(u).forEach { (cp, v) =>
        var f = fl(u)
        while (f != 0 && nxt(f).get(cp) == null) f = fl(f)
        val tgt = nxt(f).get(cp)
        fl(v) = if (tgt != null && tgt.intValue != v.intValue) tgt.intValue else 0
        outs(v) ++= outs(fl(v))
        queue.enqueue(v.intValue)
      }
    }
    (nxt.map(m => m).toArray, fl, outs.map(_.toArray).toArray)
  }
}

object AcKernels {

  private def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** One automaton pass: `(n_kw, first_pos, first_kw)` — count of
    * DISTINCT keywords present, the earliest (1-based, code-point)
    * match start, and its keyword (position tie → smallest keyword in
    * UTF-8 byte order, the binary-collation `ORDER BY p, k`).
    */
  def scan(t: UTF8String, model: AcModel): InternalRow = {
    val text = t.toString
    val hit = new Array[Boolean](model.keywords.length)
    var nHit = 0L
    var minPos = Long.MaxValue
    var bestKw: String = null
    var node = 0
    var pos = 0L
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      i += Character.charCount(cp)
      pos += 1
      // follow fail links to a node with a cp transition (or root)
      var hop = model.next(node).get(cp)
      while (node != 0 && hop == null) {
        node = model.fail(node)
        hop = model.next(node).get(cp)
      }
      node = if (hop != null) hop.intValue else 0
      val outs = model.out(node)
      var oi = 0
      while (oi < outs.length) {
        val k = outs(oi)
        if (!hit(k)) { hit(k) = true; nHit += 1 }
        val start = pos - model.kwCp(k).length + 1
        if (start < minPos ||
          (start == minPos && (bestKw == null ||
            utf8Less(model.keywords(k), bestKw)))) {
          minPos = start
          bestKw = model.keywords(k)
        }
        oi += 1
      }
    }
    if (bestKw == null) InternalRow(nHit, null, null)
    else InternalRow(nHit, minPos, UTF8String.fromString(bestKw))
  }
}

/** Compiled blocklist scan:
  * `struct(n_kw BIGINT, first_pos BIGINT, first_kw STRING)`.
  */
case class BlocklistScan(child: Expression, model: AcModel)
    extends UnaryExpression {
  override def dataType: DataType = BlocklistScan.schema
  override def prettyName: String = "graft_blocklist_scan"

  override def nullSafeEval(t: Any): Any =
    AcKernels.scan(t.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("acModel", model, classOf[AcModel].getName)
    defineCodeGen(ctx, ev, t => s"graft.functions.AcKernels.scan($t, $m)")
  }

  override protected def withNewChildInternal(c: Expression): BlocklistScan =
    copy(child = c)
}

object BlocklistScan {
  val schema: StructType = StructType(Seq(
    StructField("n_kw", LongType, nullable = false),
    StructField("first_pos", LongType, nullable = true),
    StructField("first_kw", StringType, nullable = true)))
}
