package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** A learned BPE merge table (rank order) compiled for per-document
  * encoding. Config-sized (the merge list is the model), so it ships
  * inside the expression tree itself — no broadcast needed.
  */
final class BpeMergeModel(val lefts: Array[String], val rights: Array[String])
    extends Serializable {
  require(lefts.length == rights.length, "merge table arity")
}

object BpeKernels {

  /** One pass over a document: whitespace words, each encoded by
    * applying the merge table in rank order (each merge greedy
    * leftmost non-overlapping over the word's code points — the
    * training-replay semantics of [[graft.ops.Bpe.learnMerges]]).
    * Returns `(n_tokens, n_chars)`; chars count code points, so
    * supplementary-plane characters count once (SQL `len` parity).
    * Repeated words hit a per-document memo instead of re-encoding.
    */
  def encodeStats(t: UTF8String, model: BpeMergeModel): InternalRow = {
    val text = t.toString.trim
    var ntok = 0L
    var nchar = 0L
    if (text.nonEmpty) {
      val words = text.split("\\s+")
      val memo = new java.util.HashMap[String, java.lang.Long]()
      var wi = 0
      while (wi < words.length) {
        val w = words(wi)
        val boxed = memo.get(w)
        val packed =
          if (boxed == null) {
            val p = encodeWord(w, model); memo.put(w, p); p
          } else boxed.longValue
        // packed (tokens << 32 | codepoints)
        ntok += (packed >>> 32)
        nchar += (packed & 0xffffffffL)
        wi += 1
      }
    }
    InternalRow(ntok, nchar)
  }

  /** Packed `(tokenCount << 32 | codePointCount)` for one word. */
  private def encodeWord(w: String, model: BpeMergeModel): Long = {
    val toks = mutable.ArrayBuffer[String]()
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      toks += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    val ncp = toks.length
    var m = 0
    var cur = toks.toArray
    while (m < model.lefts.length) {
      val l = model.lefts(m); val r = model.rights(m)
      val out = mutable.ArrayBuffer[String]()
      var j = 0
      while (j < cur.length) {
        if (j + 1 < cur.length && cur(j) == l && cur(j + 1) == r) {
          out += l + r; j += 2
        } else { out += cur(j); j += 1 }
      }
      cur = out.toArray
      m += 1
    }
    (cur.length.toLong << 32) | ncp.toLong
  }
}

/** Compiled per-document BPE encoding statistics:
  * `struct(n_tokens BIGINT, n_chars BIGINT)` in one scan-stage pass.
  */
case class BpeEncodeStats(child: Expression, model: BpeMergeModel)
    extends UnaryExpression {
  override def dataType: DataType = BpeEncodeStats.schema
  override def prettyName: String = "graft_bpe_encode_stats"

  override def nullSafeEval(t: Any): Any =
    BpeKernels.encodeStats(t.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bpeMergeModel", model,
      classOf[BpeMergeModel].getName)
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.BpeKernels.encodeStats($t, $m)")
  }

  override protected def withNewChildInternal(c: Expression): BpeEncodeStats =
    copy(child = c)
}

object BpeEncodeStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))
}
