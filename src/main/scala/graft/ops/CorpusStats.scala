package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.TextOps.{once, tokens}

/** Corpus-level lexical statistics: collocation mining and
  * vocabulary-distribution health. Both reduce the corpus to a
  * vocab-sized table in ONE gram-keyed shuffle (map-side combined) and
  * do every subsequent step on that tiny relation — the corpus itself
  * is read once and never re-shuffled or self-joined.
  */
object CorpusStats {

  /** Inverted-index build: `(term, df, postings)` where `postings` is
    * the first `cap` doc ids per term (ascending, comma-joined) — the
    * retrieval-side artifact a BM25/search pipeline materializes.
    *
    * Scale shape: per-doc term dedup + df counting is one shuffle
    * keyed (term, doc); the per-term cap rides
    * [[Rank.stratifiedRank]] (one range shuffle, never
    * one-task-per-term — a stopword's 10⁹-doc posting list ranks
    * across partitions and only `cap` rows survive to the
    * `collect_list`, which is therefore bounded by construction).
    */
  def invertedIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      cap: Int = 8,
      minDf: Long = 2L): DataFrame = {
    require(cap >= 1 && minDf >= 1, "invertedIndex: cap and minDf >= 1")
    val td = df
      .select(col(idCol).as("__doc"),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .distinct()
    val ranked = Rank.stratifiedRank(td, "term", Seq("__doc"))
    ranked
      .filter(col("rk") <= cap && col("n_stratum") >= minDf)
      .groupBy("term")
      .agg(max(col("n_stratum")).cast("long").as("df"),
        // numeric sort FIRST, string cast after (lexicographic order
        // would put doc 10 before doc 2)
        array_join(transform(sort_array(collect_list(col("__doc"))),
          _.cast("string")), ",").as("postings"))
  }

  /** Per-source distribution drift: KL(source ‖ corpus) over unigram
    * distributions — `Σ_w p_s(w) · ln(p_s(w) / p_c(w))`. No smoothing
    * needed: every source token is a corpus token, so p_c(w) > 0
    * wherever p_s(w) > 0. High KL flags template/boilerplate or
    * off-domain sources; 0 means the source looks like the corpus.
    *
    * Scale shape: ONE corpus-scale map-side-combined shuffle to the
    * (source, word) count table; source totals, corpus word counts and
    * the grand total all derive from that table (vocab/domain-sized,
    * AQE-broadcast joins). Terms are round-6 doubles summed exactly as
    * DECIMAL(18,6) — the round-6-LN ladder.
    */
  def sourceKl(
      df: DataFrame,
      srcCol: String,
      textCol: String): DataFrame = {
    val tok = df
      .select(col(srcCol).as("source"),
        explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
    val sw = tok.groupBy("source", "w").agg(count(lit(1)).as("cs"))
    val st = sw.groupBy("source").agg(sum(col("cs")).as("ts"))
    val cw = tok.groupBy("w").agg(count(lit(1)).as("cc"))
    val ct = cw.agg(sum(col("cc")).as("tc"))
    val term = sw.join(st, "source").join(cw, "w").crossJoin(ct)
      .select(col("source"),
        round((col("cs").cast("double") / col("ts")) *
          log((col("cs").cast("double") * col("tc")) /
            (col("ts").cast("double") * col("cc"))), 6)
          .cast("decimal(18,6)").as("t"))
    term.groupBy("source")
      .agg(round(sum(col("t")).cast("double"), 6).as("kl"))
  }

  /** Population stability index between a reference slice and the
    * rest: `PSI = Σ_buckets (p_b − q_b)·ln(p_b/q_b)` over bucketed
    * value distributions, the ML-ops drift gate (PSI < 0.1 stable,
    * 0.1–0.25 drifting, > 0.25 shifted by the usual rule of thumb).
    * Complements [[sourceKl]]: KL is asymmetric and unsmoothed; PSI
    * is symmetric in sign contribution and Laplace-smoothed (+1 per
    * observed bucket), so empty-on-one-side buckets stay finite.
    *
    * Scale shape: ONE map-side-combined aggregate keyed by the bucket
    * (output is bucket-count-sized), a 1-row total broadcast back over
    * that tiny relation, and a ≤buckets-row exact DECIMAL(18,6) term
    * sum — the round-6-LN ladder, so the statistic hash-matches
    * across engines. Rows where `isRef` is NULL count in neither
    * slice (3VL: both conditional sums skip them); NULL buckets group
    * together and count like any bucket.
    */
  def psi(df: DataFrame, isRef: Column, bucket: Column): DataFrame = {
    val b = df.select(bucket.as("bucket"), isRef.as("__r"))
      .groupBy("bucket")
      .agg(sum(when(col("__r"), 1L).otherwise(0L)).as("cr"),
        sum(when(!col("__r"), 1L).otherwise(0L)).as("cc"))
    val n = b.agg(sum(col("cr")).as("nr"), sum(col("cc")).as("nc"),
      count(lit(1)).as("nb"))
    val withN = b.crossJoin(broadcast(n))
    val p = (col("cr") + lit(1L)).cast("double") /
      (col("nr") + col("nb")).cast("double")
    val q = (col("cc") + lit(1L)).cast("double") /
      (col("nc") + col("nb")).cast("double")
    val term = round((p - q) * log(p / q), 6).cast("decimal(18,6)")
    withN.select(col("nr"), col("nc"), col("nb"), term.as("t"))
      .groupBy("nr", "nc", "nb")
      .agg(round(sum(col("t")).cast("double"), 6).as("psi"))
      .select(col("nr").cast("long").as("n_ref"),
        col("nc").cast("long").as("n_cur"),
        col("nb").cast("long").as("n_buckets"), col("psi"))
  }

  /** Weight-of-evidence encoding table for a binary label over value
    * buckets: `WOE_b = ln( (good_b/goods) / (bad_b/bads) )` with the
    * same +1-per-observed-bucket Laplace smoothing as [[psi]] — the
    * credit-scoring / feature-engineering transform that replaces a
    * categorical or bucketed feature by its evidence weight (positive
    * WOE ⇔ bucket over-represents the good class). The information
    * value `IV = Σ (p_b − q_b)·WOE_b` is exactly [[psi]] with the
    * slices set to good/bad — run both off the same bucket expression.
    *
    * Same scale shape as [[psi]]: one bucket-keyed map-side-combined
    * aggregate, one 1-row total broadcast over the bucket-sized
    * relation; WOE is a single `ln` of a ratio of two fixed divisions,
    * rounded to 6 — no double summation, so no ladder needed.
    */
  def woe(df: DataFrame, isGood: Column, bucket: Column): DataFrame = {
    val b = df.select(bucket.as("bucket"), isGood.as("__g"))
      .groupBy("bucket")
      .agg(sum(when(col("__g"), 1L).otherwise(0L)).as("cg"),
        sum(when(!col("__g"), 1L).otherwise(0L)).as("cb"))
    val n = b.agg(sum(col("cg")).as("ng"), sum(col("cb")).as("nbad"),
      count(lit(1)).as("nb"))
    b.crossJoin(broadcast(n))
      .select(col("bucket"), col("cg").cast("long").as("n_good"),
        col("cb").cast("long").as("n_bad"),
        round(log(((col("cg") + lit(1L)).cast("double") /
          (col("ng") + col("nb")).cast("double")) /
          ((col("cb") + lit(1L)).cast("double") /
            (col("nbad") + col("nb")).cast("double"))), 6).as("woe"))
  }

  /** Top collocations by pointwise mutual information:
    * `pmi(x,y) = ln( p(xy) / (p(x) p(y)) )` over whitespace bigrams,
    * restricted to pairs seen at least `minCount` times (PMI is
    * unstable on rare pairs), top `topK` by (pmi desc, gram asc) —
    * the phrase-mining pass a tokenizer- or vocab-construction
    * pipeline runs over a corpus.
    *
    * Scale shape: bigram and unigram counts are each ONE map-side-
    * combined shuffle keyed by the gram (distinct-gram-sized output,
    * not corpus-sized); the `minCount` filter prunes the bigram table
    * BEFORE it joins the unigram counts (heavy-hitter join inputs
    * only), totals ride 1-row broadcasts, and the top-k is a
    * distributed TakeOrdered — no full sort. The PMI arithmetic is a
    * fixed left-associated double expression so the rounded values
    * are engine-portable.
    */
  def pmiCollocations(
      df: DataFrame,
      textCol: String,
      minCount: Long = 5L,
      topK: Int = 50): DataFrame = {
    require(minCount >= 1 && topK >= 1,
      "pmiCollocations: minCount and topK must be positive")
    val ws = col("__ws")
    val toks = df.select(once(tokens(col(textCol))).as("__ws"))
    val uni = toks.select(explode(ws).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
    val bigrams = toks.select(explode(when(size(ws) >= 2,
      transform(sequence(lit(1), size(ws) - 1),
        i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1))))
      .otherwise(array().cast("array<string>"))).as("gram"))
    val bcAll = bigrams.groupBy("gram").agg(count(lit(1)).as("cxy"))
    // totals BEFORE the heavy-hitter filter: PMI normalizes by the
    // whole corpus, not the surviving pairs
    val nUni = uni.agg(sum(col("c")).as("n_uni"))
    val nBi = bcAll.agg(sum(col("cxy")).as("n_bi"))
    val bc = bcAll.filter(col("cxy") >= minCount)
      // tokens are whitespace-split, so the gram splits back losslessly
      .withColumn("x", split(col("gram"), " ").getItem(0))
      .withColumn("y", split(col("gram"), " ").getItem(1))
    val ux = uni.select(col("term").as("x"), col("c").as("cx"))
    val uy = uni.select(col("term").as("y"), col("c").as("cy"))
    bc.join(ux, "x").join(uy, "y")
      .crossJoin(broadcast(nUni)).crossJoin(broadcast(nBi))
      .select(col("gram"), col("cxy").as("n_pair"),
        round(log(col("cxy").cast("double") * col("n_uni") * col("n_uni") /
          (col("n_bi").cast("double") * col("cx") * col("cy"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("gram").asc)
      .limit(topK)
  }

  /** BM25 retrieval scoring of a fixed term query against the corpus
    * (Robertson–Spärck Jones): per-document
    * `Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))` with
    * `idf = ln((N − df + 0.5)/(df + 0.5) + 1)` (the Lucene form —
    * non-negative). Term frequencies use the compiled
    * [[graft.functions.TextKernels.wordHits]] kernel (exact,
    * adjacent-repeat-correct). Top `topK` by (score desc, id asc).
    *
    * Parity: idf and each term's contribution round to 6 decimals
    * (round-6-LN device), contributions sum as DECIMAL(18,6) —
    * engine-exact; `avgdl` stays the single division
    * `total_tokens / N` so both engines compute the same double.
    *
    * Scale shape: corpus statistics (N, total length, per-term doc
    * freq) are ONE map-side-combined aggregate producing a single row,
    * broadcast back with a cross join; scoring is a map-only
    * projection (one compiled wordHits pass per term), and selection
    * is a distributed TakeOrdered — the corpus is scanned twice (once
    * for stats, once for scores) and never shuffled.
    */
  def bm25(
      df: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 20): DataFrame = {
    require(terms.nonEmpty && terms.distinct.size == terms.size,
      "bm25: terms must be non-empty and distinct")
    val dl = TextOps.tokenCountArith(col(textCol))
    val statCols =
      Seq(count(lit(1)).as("__n"), sum(dl).as("__tdl")) ++
        terms.zipWithIndex.map { case (t, i) =>
          sum(when(TextOps.wordHits(col(textCol), t) > 0, 1L).otherwise(0L))
            .as(s"__df$i")
        }
    val stats = df.agg(statCols.head, statCols.tail: _*)
    val avgdl = col("__tdl").cast("double") / col("__n")
    val contribs = terms.zipWithIndex.map { case (t, i) =>
      val tf = TextOps.wordHits(col(textCol), t).cast("double")
      val idf = round(log((col("__n") - col(s"__df$i") + 0.5) /
        (col(s"__df$i") + 0.5) + 1.0), 6)
      when(tf > 0,
        round(idf * (tf * lit(k1 + 1.0)) /
          (tf + lit(k1) * (lit(1.0 - b) + lit(b) *
            (dl.cast("double") / avgdl))), 6))
        .otherwise(lit(0.0))
        .cast("decimal(18,6)")
    }
    df.crossJoin(broadcast(stats))
      .select(col(idCol),
        contribs.reduce(_ + _).cast("decimal(18,6)").cast("double")
          .as("score"))
      .filter(col("score") > 0d)
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(topK)
  }

  /** Batch BM25 retrieval: score the corpus against MANY queries in
    * one pass and return the per-query top-k. Same scoring + parity
    * devices as [[bm25]] (round-6-LN idf, per-term round-6
    * contributions summed as DECIMAL(18,6)); ranks break ties
    * (score desc, id asc).
    *
    * Scale shape: this is why retrieval batches — corpus statistics
    * for the UNION of query terms are ONE map-side-combined aggregate
    * (a single broadcast row), every query's score is computed in the
    * SAME scan (term tf kernels shared across queries via common
    * subexpressions), and the per-query top-k rides
    * [[Rank.stratifiedRank]]'s range shuffle over only the
    * positive-scoring (id, query, score) rows. q queries cost one
    * corpus scan + one slim shuffle, not q scans — per-query
    * TakeOrdered would re-read the corpus per query.
    */
  def bm25Batch(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queries: Seq[(String, Seq[String])],
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 20): DataFrame =
    graft.ops.Robust.withPersisted(
      bm25BatchScored(df, idCol, textCol, queries, k1, b),
      maxRows = queries.size.toLong * topK)(
      bm25BatchRank(_, idCol, topK))

  /** The scoring stage of [[bm25Batch]]: one corpus scan computes
    * every query's score against a single broadcast stats row and
    * explodes to the positive-scoring (id, query, score) pairs.
    * Exposed lazily for the plan-shape pins; [[bm25Batch]] wraps it
    * in the structural persist scope. */
  private[graft] def bm25BatchScored(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queries: Seq[(String, Seq[String])],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty && queries.map(_._1).distinct.size == queries.size,
      "bm25Batch: queries must be non-empty with distinct ids")
    queries.foreach { case (q, ts) =>
      require(ts.nonEmpty && ts.distinct.size == ts.size,
        s"bm25Batch: query '$q' terms must be non-empty and distinct")
    }
    val allTerms = queries.flatMap(_._2).distinct
    val dl = TextOps.tokenCountArith(col(textCol))
    val statCols =
      Seq(count(lit(1)).as("__n"), sum(dl).as("__tdl")) ++
        allTerms.zipWithIndex.map { case (t, i) =>
          sum(when(TextOps.wordHits(col(textCol), t) > 0, 1L).otherwise(0L))
            .as(s"__df$i")
        }
    val stats = df.agg(statCols.head, statCols.tail: _*)
    val avgdl = col("__tdl").cast("double") / col("__n")
    val termIdx = allTerms.zipWithIndex.toMap
    def score(terms: Seq[String]): Column =
      terms.map { t =>
        val i = termIdx(t)
        val tf = TextOps.wordHits(col(textCol), t).cast("double")
        val idf = round(log((col("__n") - col(s"__df$i") + 0.5) /
          (col(s"__df$i") + 0.5) + 1.0), 6)
        when(tf > 0,
          round(idf * (tf * lit(k1 + 1.0)) /
            (tf + lit(k1) * (lit(1.0 - b) + lit(b) *
              (dl.cast("double") / avgdl))), 6))
          .otherwise(lit(0.0))
          .cast("decimal(18,6)")
      }.reduce(_ + _).cast("decimal(18,6)").cast("double")
    // temp score columns are indexed by POSITION — a query id is only
    // ever carried as a literal in the exploded struct, so ids with
    // '.', backticks or other column-path metacharacters can't
    // misparse or collide at analysis time (round-9 review)
    val scored = df.crossJoin(broadcast(stats))
      .select(col(idCol) +:
        queries.zipWithIndex.map { case ((_, ts), i) =>
          score(ts).as(s"__s_$i")
        }: _*)
      .select(col(idCol), explode(array(queries.zipWithIndex.map {
        case ((q, _), i) =>
          struct(lit(q).as("query_id"), col(s"__s_$i").as("score"))
      }: _*)).as("__qs"))
      .select(col(idCol),
        col("__qs").getField("query_id").as("query_id"),
        col("__qs").getField("score").as("score"))
    // the rank device reads this 2-3× (boundary sample + row side
    // [+ side table]); this scored relation is the expensive part —
    // a corpus scan running |terms|+1 compiled kernels per row —
    // while its OUTPUT is ≤ |queries|·topK rows, hence bm25Batch's
    // structural persist scope around it.
    scored
      .filter(col("score") > 0d)
      .withColumn("__negs", -col("score"))
  }

  /** The rank stage of [[bm25Batch]] (shared with the plan-shape
    * pins, which need the LAZY plan the eager scope hides). */
  private[graft] def bm25BatchRank(
      scored: DataFrame, idCol: String, topK: Int): DataFrame =
    Rank.stratifiedRank(scored, "query_id", Seq("__negs", idCol))
      .filter(col("rk") <= topK)
      .select(col("query_id"), col(idCol), col("score"),
        col("rk").cast("long").as("rank"))

  /** Zipf's-law fit over the top `topV` vocabulary terms: least-squares
    * slope and intercept of `ln(freq)` on `ln(rank)` (rank by count
    * desc, term asc). A healthy natural-language corpus sits near
    * slope −1; template/boilerplate-dominated or synthetic corpora
    * flatten — a one-row corpus-health gate.
    *
    * Scale shape: term counts are one map-side-combined shuffle; the
    * top-V cut is a distributed TakeOrdered, and the rank window runs
    * over AT MOST `topV` rows (bounded by the parameter, never the
    * corpus). Sums use the round-6-ln DECIMAL ladder so the closed-form
    * slope is order-independent and engine-portable.
    */
  def zipfSlope(
      df: DataFrame,
      textCol: String,
      topV: Int = 500): DataFrame = {
    require(topV >= 2, "zipfSlope: need at least 2 ranks to fit a line")
    val toks = df.select(once(tokens(col(textCol))).as("__ws"))
    val uni = toks.select(explode(col("__ws")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
    val top = uni.orderBy(col("c").desc, col("term").asc).limit(topV)
      // bounded single-partition window: at most topV rows reach it
      .withColumn("rk",
        row_number().over(Window.orderBy(col("c").desc, col("term").asc)))
    val d6 = "decimal(18,6)"
    val pts = top.select(
      round(log(col("rk").cast("double")), 6).cast(d6).as("x"),
      round(log(col("c").cast("double")), 6).cast(d6).as("y"))
    val s = pts.agg(
      count(lit(1)).as("n"),
      sum(col("x")).cast("double").as("sx"),
      sum(col("y")).cast("double").as("sy"),
      sum(col("x") * col("y")).cast("double").as("sxy"),
      sum(col("x") * col("x")).cast("double").as("sxx"))
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) / den
    s.select(col("n").cast("long").as("n_terms"),
      when(den === 0d, lit(null).cast("double"))
        .otherwise(round(slope, 6)).as("slope"),
      when(den === 0d, lit(null).cast("double"))
        .otherwise(round((col("sy") - slope * col("sx")) / col("n"), 6))
        .as("intercept"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR '09):
    * merge several ranked retrieval runs — lexical BM25, dense ANN,
    * metadata filters — into one list by
    * `score(d) = Σ_runs 1 / (k + rank_run(d))`, the standard hybrid-
    * search combiner (rank-based, so incomparable scores across
    * systems never need calibration; k=60 per the paper).
    *
    * Each input must carry (`idCol`, `rank`) with rank 1-based. Output:
    * `(idCol, rrf_score, n_runs)`, top `topK` by (score desc, id asc).
    *
    * Parity: each term is `1/(k+rank)` rounded to 9 decimals and
    * summed as DECIMAL(18,9) — exact, order-independent — then the
    * total rounds to 6 as a double.
    *
    * Scale shape: the inputs are already top-k run outputs (bounded —
    * runs × k rows total), so the union + one aggregate here is
    * negligible next to the retrieval itself; the expensive parts
    * (BM25 corpus scan, ANN probe) keep their own documented shapes.
    */
  def reciprocalRankFusion(
      runs: Seq[DataFrame],
      idCol: String,
      k: Int = 60,
      topK: Int = 20): DataFrame = {
    require(runs.size >= 2, "reciprocalRankFusion needs at least 2 runs")
    require(k >= 0 && topK >= 1, "reciprocalRankFusion: k >= 0, topK >= 1")
    val terms = runs.map(_.select(col(idCol),
      round(lit(1.0) / (lit(k) + col("rank").cast("double")), 9)
        .cast("decimal(18,9)").as("__t")))
    terms.reduce(_ unionAll _)
      .groupBy(idCol)
      .agg(round(sum(col("__t")).cast("double"), 6).as("rrf_score"),
        count(lit(1)).cast("long").as("n_runs"))
      .orderBy(col("rrf_score").desc, col(idCol).asc)
      .limit(topK)
  }

  /** Pearson chi-square test of independence between two categorical
    * columns (the corpus-composition gate: "is language independent
    * of source?" — a significant statistic means some source is
    * skewing the language mix). Returns one row:
    * `(chi2, dof, n_rows, n_cols, n)`.
    *
    * Arithmetic is a fixed portable chain: observed counts are exact
    * longs; `expected = (rowTotal · colTotal) / N` as doubles (the
    * long product overflows BIGINT once marginals pass ~3·10⁹, so
    * both engines multiply in IEEE — two exact-until-2^53 ops);
    * per-cell contributions round to 6 and sum as DECIMAL(18,6).
    *
    * Scale shape: ONE map-side-combined count aggregate keyed by the
    * cell (output is cells-sized — categorical × categorical, not
    * corpus-sized); marginals derive from the cell table; the final
    * statistic is a cells-sized exact sum. Rows with a NULL in either
    * category are excluded (a NULL join key would silently drop out
    * of the marginal joins anyway — excluding up front makes the
    * contract explicit).
    */
  def chiSquare(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    val observed = df
      .filter(col(rowCol).isNotNull && col(colCol).isNotNull)
      .groupBy(col(rowCol).as("__r"), col(colCol).as("__c"))
      .agg(count(lit(1)).as("__o"))
    val rt = observed.groupBy("__r").agg(sum(col("__o")).as("__rt"))
    val ct = observed.groupBy("__c").agg(sum(col("__o")).as("__ct"))
    // dense completion: a structural ZERO cell still contributes its
    // expected count to χ² ((0−e)²/e = e) — summing observed cells
    // only understates χ² on sparse tables. The cross join is
    // marginal×marginal (nr·nc rows), never data-sized.
    val cells = rt.crossJoin(broadcast(ct))
      .join(observed, Seq("__r", "__c"), "left")
      .withColumn("__o", coalesce(col("__o"), lit(0L)))
    val n = observed.agg(sum(col("__o")).as("__n"),
      countDistinct(col("__r")).as("__nr"),
      countDistinct(col("__c")).as("__nc"))
    val term = cells.crossJoin(broadcast(n))
      .select(
        round(
          (col("__o").cast("double") -
            col("__rt").cast("double") * col("__ct") / col("__n")) *
          (col("__o").cast("double") -
            col("__rt").cast("double") * col("__ct") / col("__n")) /
          (col("__rt").cast("double") * col("__ct") / col("__n")), 6)
          .cast("decimal(18,6)").as("__t"),
        col("__nr"), col("__nc"), col("__n"))
    term.groupBy("__nr", "__nc", "__n")
      .agg(round(sum(col("__t")).cast("double"), 6).as("chi2"))
      .select(col("chi2"),
        ((col("__nr") - 1) * (col("__nc") - 1)).cast("long").as("dof"),
        col("__nr").cast("long").as("n_rows"),
        col("__nc").cast("long").as("n_cols"),
        col("__n").cast("long").as("n"))
  }

  /** Cramér's V over a [[chiSquare]] contingency readout: the
    * [0, 1]-normalized association strength
    * `√(χ² / (n · min(r−1, c−1)))` (Cramér 1946) — χ² grows with n,
    * V answers "how strongly" so different-sized tables compare.
    * Parity: χ² is already a round-6 double with a decimal term sum;
    * V adds one division and a correctly-rounded √ of exact scalars.
    * Output: `(chi2, dof, n, v)`, one row.
    */
  def cramersV(df: DataFrame, rowCol: String, colCol: String): DataFrame =
    chiSquare(df, rowCol, colCol)
      .select(col("chi2"), col("dof"), col("n"),
        when(col("n") > 0 && least(col("n_rows"), col("n_cols")) > 1,
          round(sqrt(col("chi2") /
            (col("n").cast("double") *
              (least(col("n_rows"), col("n_cols")) - 1).cast("double"))), 6))
          .as("v"))

  /** Vocabulary profile per group: token count, type (distinct-word)
    * count, type–token ratio, and hapax-legomena share (words seen
    * once) — the vocabulary-richness readout next to q96's Zipf slope
    * (a boilerplate-heavy source shows low TTR and low hapax share
    * long before a dedup pass names the culprit). Whitespace
    * tokenization (the q48/q65 device).
    *
    * Parity: counts only; the two closing ratios are single double
    * divisions, rounded 6. Scale shape: one (group, word) map-side-
    * combined aggregate — vocabulary-sized, not corpus-sized — then a
    * group fold.
    */
  def vocabStats(df: DataFrame, groupCol: String, textCol: String)
      : DataFrame = {
    val toks = df.select(col(groupCol).as("__g"),
      explode(TextOps.tokens(col(textCol))).as("__w"))
    toks.groupBy("__g", "__w").agg(count(lit(1)).as("__c"))
      .groupBy("__g").agg(
        sum(col("__c")).cast("long").as("n_tokens"),
        count(lit(1)).as("__types"),
        sum(when(col("__c") === 1, 1L).otherwise(0L)).as("__hapax"))
      .select(col("__g").as(groupCol), col("n_tokens"),
        col("__types").cast("long").as("n_types"),
        col("__hapax").cast("long").as("n_hapax"),
        round(col("__types").cast("double") /
          col("n_tokens").cast("double"), 6).as("ttr"),
        round(col("__hapax").cast("double") /
          col("__types").cast("double"), 6).as("hapax_share"))
  }

  /** Jensen–Shannon divergence of each source's unigram distribution
    * against the REST of the corpus — the symmetric, bounded
    * ([0, ln 2]) complement of [[sourceKl]]: KL explodes on
    * source-only words and is asymmetric; JSD compares against the
    * mixture `M = (P+Q)/2`, so it is finite even when the other side
    * has zero mass (a source full of vocabulary nobody else uses
    * scores near ln 2 instead of ∞).
    *
    * `JSD = ½ Σ p·ln(p/m) + ½ Σ q·ln(q/m)`, zero-mass terms dropped
    * (x·ln(x/m) → 0 as x → 0). Terms are round-6 doubles summed as
    * DECIMAL(18,6) — the round-6-LN ladder of q96/q118/q166.
    *
    * Scale shape: identical to [[sourceKl]] — ONE corpus-scale
    * map-side-combined shuffle to the (source, word) count table;
    * rest-counts derive by subtraction from the corpus word counts
    * (no second scan); everything after is vocab-sized.
    */
  def sourceJsd(
      df: DataFrame,
      srcCol: String,
      textCol: String): DataFrame = {
    val tok = df
      .select(col(srcCol).as("source"), explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
    val sw = tok.groupBy("source", "w").agg(count(lit(1)).as("cs"))
    val st = sw.groupBy("source").agg(sum(col("cs")).as("ts"))
    val cw = sw.groupBy("w").agg(sum(col("cs")).as("cc"))
    val ct = sw.agg(sum(col("cs")).as("tc"))
    // for every (source, word-of-corpus) pair with mass on either
    // side: p = source freq, q = rest freq. sw only has p>0 rows, but
    // q-only rows (word absent from the source) still contribute to
    // the q sum — generate them by joining the corpus vocab per
    // source and keeping rows where either side is positive.
    val grid = cw.crossJoin(broadcast(st)) // vocab × sources: bounded, not corpus
      .join(sw, Seq("source", "w"), "left")
      .crossJoin(broadcast(ct))
      .select(col("source"),
        coalesce(col("cs"), lit(0L)).cast("double").as("__cs"),
        col("ts").cast("double").as("__ts"),
        col("cc").cast("double").as("__cc"),
        col("tc").cast("double").as("__tc"))
      .withColumn("__p", col("__cs") / col("__ts"))
      // guard the degenerate single-source corpus (rest has no mass):
      // q := 0 keeps the chain finite and scores the lone source ln 2
      .withColumn("__q", when(col("__tc") > col("__ts"),
        (col("__cc") - col("__cs")) / (col("__tc") - col("__ts")))
        .otherwise(lit(0.0d)))
      .withColumn("__m", (col("__p") + col("__q")) / lit(2.0d))
    val term = grid.select(col("source"),
      round(when(col("__p") > 0, col("__p") * log(col("__p") / col("__m")))
        .otherwise(lit(0.0d)), 6).cast("decimal(18,6)").as("__tp"),
      round(when(col("__q") > 0, col("__q") * log(col("__q") / col("__m")))
        .otherwise(lit(0.0d)), 6).cast("decimal(18,6)").as("__tq"))
    term.groupBy("source")
      .agg(round((sum(col("__tp")) + sum(col("__tq"))).cast("double") / 2.0d, 6)
        .as("jsd"))
  }

  /** Church–Gale term burstiness (Church & Gale 1995): `tf / df` —
    * the mean WITHIN-document repetition of a term across the
    * documents that contain it. Content words are bursty (a document
    * about a topic repeats its terms); function words and template
    * residue sit near 1 spread thin across the corpus. High
    * burstiness at high df flags boilerplate n-gram sources; the
    * complement signal to [[tfidf]]'s rarity weighting.
    *
    * Returns the top `topK` terms with df ≥ `minDf` by
    * (burstiness DESC, term) — `(term, tf, df, burstiness)` round-6.
    *
    * Scale shape: one (doc, word)-keyed map-side-combined aggregate
    * (the same first shuffle every corpus stat here starts with),
    * one word-keyed fold of it, and a TakeOrdered top-k — no sort of
    * the vocabulary.
    */
  def termBurstiness(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minDf: Long = 5L,
      topK: Int = 50): DataFrame = {
    require(minDf >= 1 && topK >= 1, "termBurstiness: minDf, topK >= 1")
    val dw = df
      .select(col(idCol).as("__id"), explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("__id", "w").agg(count(lit(1)).as("__tfd"))
    dw.groupBy("w")
      .agg(sum(col("__tfd")).as("tf"), count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .withColumn("burstiness",
        round(col("tf").cast("double") / col("df"), 6))
      .orderBy(col("burstiness").desc, col("w"))
      .limit(topK)
      .select(col("w").as("term"), col("tf").cast("long").as("tf"),
        col("df").cast("long").as("df"), col("burstiness"))
  }

  /** Vocabulary growth curve (the empirical side of Heaps' law,
    * Herdan 1960): cumulative distinct-word count as the corpus
    * grows document by document in `idCol` order, read at `steps`
    * equal-document checkpoints — a flattening curve says new data
    * repeats the old vocabulary (boilerplate/dup smell next to
    * q96's Zipf slope); a straight one says the corpus keeps
    * bringing new surface forms.
    *
    * EXACT integral device: each document's position is its
    * [[Rank.stratifiedRank]] rank by id (never a global window); a
    * word's FIRST position is `min(rank)` over its postings; its
    * checkpoint bucket is `(first−1)·steps div n` — pure integer
    * arithmetic, so the curve is engine-portable. Cumulatives run
    * over the steps-sized table.
    *
    * Output per step 1..steps: `docs_cum` (documents inside the
    * checkpoint), `new_words`, `vocab_cum`. Steps whose document
    * slice brings no new words still appear (docs side outer-joins
    * the words side).
    *
    * Scale shape: one rank-device pass over documents (the one
    * range shuffle), one (word, doc) distinct + min-rank aggregate
    * — vocabulary-sized, map-side combined — then steps-sized
    * windows.
    */
  def vocabGrowth(
      df: DataFrame,
      idCol: String,
      textCol: String,
      steps: Int = 10): DataFrame = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    val ranked = Rank.stratifiedRank(
      df.select(col(idCol).as("__id"), col(textCol).as("__text"))
        .withColumn("__all", lit(1)),
      "__all", Seq("__id"))
      .select(col("__id"), col("__text"), col("rk"), col("n_stratum"))
    def bucketOf(rkCol: String, nCol: String) =
      expr(s"($rkCol - 1L) * ${steps}L div $nCol").cast("long")
    val docBuckets = ranked
      .groupBy(bucketOf("rk", "n_stratum").as("step0"))
      .agg(count(lit(1)).as("__docs"))
    val firstRank = ranked
      .select(col("rk"), col("n_stratum"),
        explode(tokens(col("__text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w")
      .agg(min(col("rk")).as("__first"), max(col("n_stratum")).as("__n"))
    val wordBuckets = firstRank
      .groupBy(bucketOf("__first", "__n").as("step0"))
      .agg(count(lit(1)).as("__new"))
    val wCum = Window.orderBy("step0")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docBuckets.join(wordBuckets, Seq("step0"), "left_outer")
      .withColumn("__dc", sum(col("__docs")).over(wCum))
      .withColumn("__vc", sum(coalesce(col("__new"), lit(0L))).over(wCum))
      .select((col("step0") + 1).cast("long").as("step"),
        col("__dc").cast("long").as("docs_cum"),
        coalesce(col("__new"), lit(0L)).cast("long").as("new_words"),
        col("__vc").cast("long").as("vocab_cum"))
  }

  /** Good–Turing frequency-of-frequencies table with the raw Turing
    * estimate r* = (r+1)·N_{r+1}/N_r — the adjusted count a language
    * model uses in place of the observed r, and the standard readout
    * for "how much probability mass belongs to unseen events" (r = 1
    * hapaxes estimate it: N₁/N). Emitted for r ≤ `maxR` (the regime
    * where Good–Turing applies; larger r are left at face value by
    * every practical smoother since N_r gets noisy).
    *
    * Scale shape: one map-side-combined shuffle to gram counts (the
    * vocab table every CorpusStats op shares), then a SECOND tiny
    * aggregate vocab → frequency-of-frequencies (≤ maxR output rows
    * kept). The r* ratio uses half-up integer division in micro units
    * (the q235 device) — products stay < 2^62 for any vocabulary
    * below ~1.4e8 types per bucket at maxR ≤ 100, and the factors are
    * exact longs, never doubles.
    *
    * `n` selects the event space: 1 = unigrams, ≥ 2 = word n-grams
    * (a closed small vocabulary has no rare UNIGRAMS to smooth — the
    * estimator's regime is the n-gram tail, which is where language
    * models actually apply it). Grams build from a PROJECTED token
    * array (`once` fence) — element_at over the raw expression inside
    * the lambda would re-evaluate the tokenizer per element (the
    * GroupRuns O(n²) trap).
    */
  def turingEstimate(df: DataFrame, textCol: String, maxR: Int = 15,
      n: Int = 1): DataFrame = {
    require(n >= 1, s"n-gram order must be >= 1, got $n")
    val toks = df.select(once(tokens(col(textCol))).as("__ws"))
    val ws = col("__ws")
    val grams =
      if (n == 1) toks.select(explode(ws).as("w"))
      else toks.select(explode(when(size(ws) >= n,
        transform(sequence(lit(1), size(ws) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + k)): _*)))
        .otherwise(array().cast("array<string>"))).as("w"))
    val counts = grams
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("r"))
    val ff = counts.groupBy("r").agg(count(lit(1)).as("n_r"))
    val next = ff.select((col("r") - 1).as("r"), col("n_r").as("__n1"))
    ff.join(next, Seq("r"), "left")
      .filter(col("r") <= maxR)
      .select(col("r").cast("long").as("r"),
        col("n_r").cast("long").as("n_r"),
        coalesce(col("__n1"), lit(0L)).cast("long").as("n_r_next"),
        (expr("(2L * (r + 1L) * coalesce(__n1, 0L) * 1000000L + n_r) " +
          "div (2L * n_r)").cast("double") / lit(1000000.0d)).as("r_star"))
      .orderBy("r")
  }

  /** Pairwise vocabulary overlap between sources: |A∩B|, |A∪B| and
    * Jaccard over each source's distinct token set — the corpus-level
    * "how much do these crawls share a dialect" companion to the
    * doc-level near-dup matrix (q228 works on documents; this works
    * on vocabularies, so it sees shared JARGON even when no document
    * is shared).
    *
    * Scale shape: ONE shuffle to the distinct (source, token) set,
    * then a self-equi-join ON TOKEN — vocabulary-sized (Heaps-bounded,
    * sublinear in the corpus), never corpus-sized; the pair aggregate
    * is ≤ S² rows. Jaccard via half-up integer micro division.
    */
  def vocabOverlap(df: DataFrame, srcCol: String, textCol: String)
      : DataFrame = {
    val sv = df
      .select(col(srcCol).as("src"), explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .distinct()
    val sizes = sv.groupBy("src").agg(count(lit(1)).as("n"))
    val inter = sv.select(col("src").as("source_a"), col("w"))
      .join(sv.select(col("src").as("source_b"), col("w")), "w")
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.select(col("src").as("source_a"), col("n").as("n_a")), "source_a")
      .join(sizes.select(col("src").as("source_b"), col("n").as("n_b")), "source_b")
      .withColumn("__union", col("n_a") + col("n_b") - col("n_common"))
      .select(col("source_a"), col("source_b"),
        col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"),
        col("n_common").cast("long").as("n_common"),
        (expr("(2L * n_common * 1000000L + __union) div (2L * __union)")
          .cast("double") / lit(1000000.0d)).as("jaccard"))
      .orderBy("source_a", "source_b")
  }

  /** Vocabulary coverage thresholds: the number of distinct terms
    * (and the token mass they carry) needed to cover p% of all token
    * occurrences, for each requested integer percentage — the
    * tokenizer-budget readout ("50% of this corpus is 87 words;
    * 99% needs 21k") that decides vocab sizes and stopword cuts.
    *
    * All-integer parity device: terms order by (count DESC, term ASC);
    * the cumulative mass rides the value-pinned prefix device; the
    * threshold test is `(prefix + c) · 100 < p · total` — pure 64-bit
    * integer arithmetic (total ≤ 9·10¹⁶ tokens before the product
    * needs widening; ANSI throws loudly past it), so both engines cut
    * at identical ranks. vocab_size = |terms strictly below
    * coverage| + 1; tokens_covered = the smallest cumulative mass at
    * or above the threshold.
    *
    * Scale shape: one token-count aggregate to the vocab table; ONE
    * prefix device pass over it (vocab-sized, not corpus-sized); one
    * map-side-combined fold computing every threshold in a single
    * aggregate.
    */
  def vocabCoverage(
      df: DataFrame,
      textCol: String,
      thresholdPcts: Seq[Int]): DataFrame = {
    require(thresholdPcts.nonEmpty && thresholdPcts.forall(p => p >= 1 && p <= 100),
      s"thresholds must be integer percents in [1,100]: $thresholdPcts")
    val tf = df
      .select(explode(graft.ops.TextOps.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("__c"))
      .withColumn("__negc", -col("__c"))
      .withColumn("__g", lit(1))
    val pre = graft.ops.Rank.stratifiedPrefixSum(
      tf, "__g", Seq("__negc", "term"), "__c")
      .withColumn("__cov", col("prefix") + col("__c"))
    val aggs = thresholdPcts.flatMap { p =>
      Seq(
        (sum(when(col("__cov") * 100 < lit(p.toLong) * col("__tot"), 1L)
          .otherwise(0L)) + lit(1L)).as(s"__vs$p"),
        min(when(col("__cov") * 100 >= lit(p.toLong) * col("__tot"),
          col("__cov"))).as(s"__tc$p"))
    }
    val tot = pre.agg(sum(col("__c")).as("__tot"))
    val one = pre.crossJoin(broadcast(tot)).agg(aggs.head, aggs.tail: _*)
    one.select(explode(array(thresholdPcts.map(p =>
      struct(lit(p.toLong).as("threshold_pct"),
        col(s"__vs$p").cast("long").as("vocab_size"),
        col(s"__tc$p").cast("long").as("tokens_covered"))): _*)).as("__r"))
      .select(col("__r.threshold_pct"), col("__r.vocab_size"),
        col("__r.tokens_covered"))
  }
}
