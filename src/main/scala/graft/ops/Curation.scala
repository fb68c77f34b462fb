package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.TextOps.{once, tokenCountArith, tokens}

/** Corpus-assembly operators above the single-document gates: per-source
  * health reporting and DSIR-style importance weighting. Both follow the
  * engine's model-state rule: anything learned from the corpus is either
  * a bounded driver-side table compiled into the scan or a broadcast —
  * the corpus itself is never re-shuffled to score it.
  */
object Curation {

  /** Per-source curation report — the "which domains do we keep"
    * table a corpus assembler reviews before mixing (RefinedWeb §3
    * runs exactly this loop over Common Crawl domains): document and
    * token counts, the fraction of documents whose leading `segLen`
    * tokens are shared with any other document (a cheap cross-corpus
    * near-dup signal: template/boilerplate sources score high), and a
    * keep gate combining the dup rate with a minimum-volume floor.
    *
    * Scale shape: one shuffle on a 16-byte leading-segment digest
    * (never the text) to find shared segments, then one aggregation
    * keyed by source. Source cardinality is domains (≤ millions) —
    * the aggregate is map-side-combined to a tiny table; a 100 TB
    * single source is ONE output row but its partials combine in
    * parallel. The dup join broadcasts when the dup-segment set is
    * small (AQE), and carries digests only.
    */
  def sourceMixReport(
      df: DataFrame,
      textCol: String = "text",
      srcCol: String = "source",
      segLen: Int = 10,
      minDocs: Long = 10L,
      maxNeardupFrac: Double = 0.3): DataFrame = {
    val seg = df
      .select(col(srcCol), once(tokens(col(textCol))).as("__ws"))
      .select(col(srcCol), size(col("__ws")).cast("long").as("__n"),
        md5(concat_ws(" ", slice(col("__ws"), 1, segLen))).as("__sd"))
    val dup = seg.groupBy("__sd").agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= 2).select(col("__sd"), lit(true).as("__nd"))
    val nd = sum(when(col("__nd"), 1L).otherwise(0L))
    seg.join(dup, Seq("__sd"), "left")
      .groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__n")).cast("long").as("n_tokens"),
        nd.cast("long").as("neardup_docs"),
        // engine-proof micro ratios (the q271 hazard class); the
        // keep gate compares the INTEGER micro value so the
        // threshold decision can never straddle a rounding flip
        Parity.microRatio(nd, count(lit(1))).as("__ndm"),
        Parity.round6Ratio(sum(col("__n")), count(lit(1)))
          .as("mean_tokens"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("neardup_docs"),
        (col("__ndm").cast("double") / lit(1e6)).as("neardup_frac"),
        col("mean_tokens"),
        (col("__ndm") <= lit((maxNeardupFrac * 1e6).round) &&
          col("n_docs") >= minDocs).as("keep"))
  }

  /** Per-source document quota (the "at most N pages per domain" gate
    * of CommonCrawl-style curation): rank every document inside its
    * source by quality (token count desc, id asc — deterministic) and
    * admit the top `cap`. Returns the per-source admission report:
    * `(source, n_docs, n_kept, n_dropped, min_kept_tokens)` where
    * `min_kept_tokens` is the admission threshold actually applied.
    *
    * Scale shape: rides [[Rank.stratifiedRank]] — ONE range shuffle of
    * the corpus, partition-local ranking, a (partition × source) count
    * table as the only twice-exchanged data; never one-task-per-source
    * (a 100 TB mega-domain ranks across partitions), never a corpus
    * window. The report aggregate is map-side-combined to
    * source-cardinality rows.
    */
  def capPerSource(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      srcCol: String = "source",
      cap: Long = 10L): DataFrame = {
    require(cap >= 1L, "capPerSource: cap >= 1")
    val scored = df
      .select(col(srcCol), col(idCol),
        once(tokenCountArith(col(textCol))).as("__nt"))
      .withColumn("__negt", -col("__nt"))
    val ranked = Rank.stratifiedRank(scored, srcCol, Seq("__negt", idCol))
    ranked.groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(when(col("rk") <= cap, 1L).otherwise(0L)).cast("long")
          .as("n_kept"),
        sum(when(col("rk") > cap, 1L).otherwise(0L)).cast("long")
          .as("n_dropped"),
        min(when(col("rk") <= cap, col("__nt"))).cast("long")
          .as("min_kept_tokens"))
  }

  /** Portable token→bucket hash shared with the DuckDB oracle:
    * first 4 hex chars of md5 parsed base-16, mod `buckets` —
    * `('0x' || substr(md5(t), 1, 4))::INT % B` on the other side.
    */
  private def bucketOf(t: Column, buckets: Int): Column =
    pmod(conv(substring(md5(t), 1, 4), 16, 10).cast("int"), lit(buckets))

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): estimate target and
    * raw unigram distributions over `buckets` hashed features, then
    * score every document with the summed log-ratio
    * `Σ_tokens ln p_target(bucket) − ln p_raw(bucket)` (add-one
    * smoothing). High-weight documents look like the target slice;
    * the resampling step is the existing deterministic machinery
    * (top-fraction by weight via [[Rank.stratifiedRank]], or
    * gumbel-free md5 draws as in q63/q68).
    *
    * Rows whose `targetPred` is NULL count toward neither
    * distribution (matching SQL `CASE WHEN` on both engines).
    *
    * Determinism/parity: each per-bucket log-ratio rounds to 6
    * decimals (HALF_UP) and per-document terms sum as DECIMAL(18,6)
    * — order-independent exact addition, the round-6-LN ladder.
    *
    * Scale shape: the model is ONE aggregation over the exploded
    * token stream — map-side partials cap every task's output at
    * `buckets` rows, so the shuffle is buckets × partitions
    * regardless of corpus size — collected (bounded by `buckets`,
    * which `require`s ≤ 2^20) and compiled into the scan as an
    * ARRAY literal: indexed O(1) access, NOT a map literal (a
    * `typedlit` map is a linear scan per lookup — the q84 lesson).
    * Scoring is a map-only projection; the corpus never shuffles.
    */
  def dsirWeights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      targetPred: Column,
      buckets: Int = 1024): DataFrame = {
    require(buckets > 0 && buckets <= (1 << 20),
      s"dsirWeights: buckets must be in (0, 2^20], got $buckets — the " +
        "model is compiled into the plan and must stay config-sized")
    val cnts = df
      .select(explode(tokens(col(textCol))).as("__t"), targetPred.as("__tp"))
      .select(bucketOf(col("__t"), buckets).as("__b"), col("__tp"))
      .groupBy("__b")
      .agg(sum(when(col("__tp"), 1L).otherwise(0L)).as("__tc"),
        sum(when(not(col("__tp")), 1L).otherwise(0L)).as("__rc"))
      .collect()
    val tArr = new Array[Long](buckets)
    val rArr = new Array[Long](buckets)
    cnts.foreach { r =>
      tArr(r.getInt(0)) = r.getLong(1)
      rArr(r.getInt(0)) = r.getLong(2)
    }
    val nt = tArr.sum
    val nr = rArr.sum
    val lam: Seq[Double] = Array.tabulate(buckets) { b =>
      BigDecimal(
        math.log((tArr(b) + 1.0) / (nt + buckets)) -
          math.log((rArr(b) + 1.0) / (nr + buckets)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toSeq
    val lamLit = typedlit(lam)
    val terms = transform(col("__ws"),
      t => element_at(lamLit, bucketOf(t, buckets) + 1).cast("decimal(18,6)"))
    val s = aggregate(terms, lit(BigDecimal(0)).cast("decimal(18,6)"),
      (a, x) => (a + x).cast("decimal(18,6)"))
    df.select(col(idCol), once(tokens(col(textCol))).as("__ws"))
      .select(col(idCol), size(col("__ws")).cast("long").as("n_tokens"),
        once(s).as("__s"))
      .select(col(idCol), col("n_tokens"),
        round(col("__s").cast("double"), 6).as("logw"),
        // signed exact-decimal ratio → the q271 half-up micro device;
        // both engines round half-away-from-zero, so the negative
        // branch negates through the non-negative device (the 10×
        // gate caught the round(double,6) form flipping a boundary)
        when(col("__s") < 0,
          -graft.ops.Parity.round6Ratio(-col("__s"), col("n_tokens")))
          .otherwise(graft.ops.Parity.round6Ratio(col("__s"),
            col("n_tokens"))).as("avg_logw"))
  }
}
