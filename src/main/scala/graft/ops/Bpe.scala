package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning (Sennrich et al. 2016) — the
  * tokenizer-induction pass of an LLM data pipeline: iteratively merge
  * the most frequent adjacent symbol pair over the word-frequency
  * table, recording the merge table that defines the subword
  * vocabulary. Word-internal variant (no end-of-word marker); merges
  * apply greedily left-to-right, non-overlapping, ties on the count
  * break to the smallest (left, right) under UTF-8 byte order.
  *
  * Scale shape: the ONLY corpus-scale step is the word-frequency
  * aggregation (one map-side-combined shuffle to a vocab-sized
  * table, `maxVocab` fail-fast) — exactly how production BPE trains
  * (on the vocab × freq table, not the raw corpus). The merge loop
  * runs driver-side on that bounded table: `iters` passes over ≤
  * maxVocab short words is millions of cheap operations, not a
  * distributed job, and the result is a config-sized model (the
  * engine's model-state rule).
  */
object Bpe {

  /** Unsigned UTF-8 byte comparison — the tie-break must sort the way
    * a SQL engine's binary collation does; JVM String ordering
    * (UTF-16 code units) ranks supplementary-plane characters
    * (surrogates, 0xD800+) BELOW U+E000..U+FFFF, where UTF-8 bytes
    * rank them above.
    */
  private def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    var c = 0
    while (i < n && c == 0) {
      c = (x(i) & 0xff) - (y(i) & 0xff)
      i += 1
    }
    if (c != 0) c else x.length - y.length
  }

  /** Returns `(merge_rank, left, right, pair_count)`, one row per
    * learned merge (fewer if the vocabulary runs out of pairs).
    */
  def learnMerges(
      df: DataFrame,
      textCol: String,
      iters: Int = 5,
      maxVocab: Int = 100000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    learnMergeList(df, textCol, iters, maxVocab)
      .toDF("merge_rank", "lhs", "rhs", "pair_count")
  }

  /** Driver-side merge table: `(rank, left, right, pair_count)`. The
    * model for [[encodeStats]] — config-sized by construction (≤
    * `iters` rows).
    */
  def learnMergeList(
      df: DataFrame,
      textCol: String,
      iters: Int = 5,
      maxVocab: Int = 100000): Seq[(Long, String, String, Long)] = {
    require(iters >= 1 && iters <= 64, "learnMerges: iters in [1, 64]")
    val vocabRows = df
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .limit(maxVocab + 1).collect()
    require(vocabRows.length <= maxVocab,
      s"learnMerges: vocabulary exceeds maxVocab=$maxVocab — BPE trains " +
        "on a bounded vocab table; raise the cap or pre-filter")
    // split on code points (matches SQL substr's character semantics)
    def codePoints(w: String): Array[String] = {
      val out = mutable.ArrayBuffer[String]()
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        out += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      out.toArray
    }
    var vocab: Array[(Array[String], Long)] = vocabRows
      .map(r => (codePoints(r.getString(0)), r.getLong(1)))
    def mergePair(toks: Array[String], l: String, r: String): Array[String] = {
      val out = mutable.ArrayBuffer[String]()
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
          out += l + r; i += 2
        } else { out += toks(i); i += 1 }
      }
      out.toArray
    }
    val merges = mutable.ArrayBuffer[(Long, String, String, Long)]()
    var k = 1
    var exhausted = false
    while (k <= iters && !exhausted) {
      val counts = mutable.HashMap[(String, String), Long]()
      vocab.foreach { case (toks, f) =>
        var i = 0
        while (i + 1 < toks.length) {
          val key = (toks(i), toks(i + 1))
          counts.update(key, counts.getOrElse(key, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((l, r), c) = counts.min(Ordering.fromLessThan[((String, String), Long)] {
          case (((l1, r1), c1), ((l2, r2), c2)) =>
            if (c1 != c2) c1 > c2
            else {
              val lc = utf8Compare(l1, l2)
              if (lc != 0) lc < 0 else utf8Compare(r1, r2) < 0
            }
        })
        merges += ((k.toLong, l, r, c))
        vocab = vocab.map { case (toks, f) => (mergePair(toks, l, r), f) }
        k += 1
      }
    }
    merges.toSeq
  }

  /** Per-document encoding statistics under a learned merge table:
    * `(id, n_tokens, n_chars, compression)` where `n_tokens` counts
    * subword tokens after applying the merges in rank order (greedy
    * leftmost per word), `n_chars` counts code points, and
    * `compression = round(n_chars / n_tokens, 6)` (NULL for empty
    * docs).
    *
    * Scale shape: map-only — the merge table is config-sized and
    * rides inside the compiled [[graft.functions.BpeEncodeStats]]
    * kernel, so encoding is one scan-stage pass per document with a
    * per-doc word memo; no join against the vocab table, no shuffle.
    */
  def encodeStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val model = new graft.functions.BpeMergeModel(
      merges.map(_._1).toArray, merges.map(_._2).toArray)
    val stats = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.BpeEncodeStats(
        org.apache.spark.sql.graft.ColumnBridge.expression(
          coalesce(col(textCol).cast("string"), lit(""))), model))
    df.select(col(idCol), TextOps.once(stats).as("__s"))
      .select(col(idCol),
        col("__s").getField("n_tokens").as("n_tokens"),
        col("__s").getField("n_chars").as("n_chars"))
      .withColumn("compression",
        when(col("n_tokens") > 0,
          round(col("n_chars").cast("double") / col("n_tokens"), 6)))
  }
}
