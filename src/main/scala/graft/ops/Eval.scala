package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier/gate evaluation readouts for data-curation pipelines:
  * when a cheap rule gate or a score column stands in for a quality
  * classifier (the q71 C4 gate, the q76 heuristic score), these are
  * the standard audits — do two gates agree beyond chance (Cohen's
  * κ), is one systematically stricter (McNemar), how does a score
  * trade recall for precision (ROC), and do its values mean what
  * they claim (calibration)? The reference has no evaluation surface
  * (its transforms are jq programs, ext/jq/connector.go:23-98);
  * these are north-star scope for a 100 TB training-data engine,
  * where gate disagreement IS the curation error budget.
  *
  * Every readout is ONE map-side-combined corpus aggregate (plus
  * bin-sized arithmetic) — nothing here shuffles corpus rows.
  */
object Eval {

  /** Agreement audit between two boolean gates (Cohen 1960; McNemar
    * 1947): the 2×2 confusion counts plus
    *
    *   - `agreement` — raw P(observed) = (both + neither)/n,
    *   - `kappa` — chance-corrected agreement
    *     `(po − pe)/(1 − pe)` with `pe` from the marginals,
    *   - `mcnemar_chi2` — `(b − c)²/(b + c)` over the discordant
    *     cells: is one gate systematically stricter, not just noisy?
    *
    * Rows where either gate is NULL are excluded (3VL). Degenerate
    * cases yield NULL (κ when pe = 1 — e.g. a constant gate;
    * McNemar when b + c = 0, i.e. no discordant pairs).
    *
    * Parity chain: all four cells are exact longs; po/pe/κ/χ² are
    * fixed double expressions of those longs rounded to 6 — no libm.
    *
    * Scale shape: ONE map-side-combined aggregate to a single row;
    * both gate expressions evaluate inside the scan stage.
    */
  def gateAgreement(df: DataFrame, gateA: Column, gateB: Column): DataFrame = {
    val a = gateA.cast("boolean")
    val b = gateB.cast("boolean")
    val agg = df
      .filter(a.isNotNull && b.isNotNull)
      .agg(
        sum(when(a && b, 1L).otherwise(0L)).as("both_pass"),
        sum(when(a && !b, 1L).otherwise(0L)).as("only_a"),
        sum(when(!a && b, 1L).otherwise(0L)).as("only_b"),
        sum(when(!a && !b, 1L).otherwise(0L)).as("neither"))
    val n = (col("both_pass") + col("only_a") + col("only_b") +
      col("neither")).cast("double")
    val po = (col("both_pass") + col("neither")).cast("double") / n
    // chance agreement from the marginals: P(A=1)P(B=1) + P(A=0)P(B=0)
    val pa1 = (col("both_pass") + col("only_a")).cast("double") / n
    val pb1 = (col("both_pass") + col("only_b")).cast("double") / n
    val pe = pa1 * pb1 + (lit(1.0d) - pa1) * (lit(1.0d) - pb1)
    val disc = (col("only_a") + col("only_b")).cast("double")
    val diff = (col("only_a") - col("only_b")).cast("double")
    agg.select(
      n.cast("long").as("n"),
      col("both_pass").cast("long").as("both_pass"),
      col("only_a").cast("long").as("only_a"),
      col("only_b").cast("long").as("only_b"),
      col("neither").cast("long").as("neither"),
      round(po, 6).as("agreement"),
      when(pe < lit(1.0d), round((po - pe) / (lit(1.0d) - pe), 6))
        .as("kappa"),
      when(disc > lit(0.0d), round(diff * diff / disc, 6))
        .as("mcnemar_chi2"))
  }

  /** Binned ROC curve of `scoreCol` against boolean `labelCol`:
    * `points` equal-width score bands (the q202 integer-cents device
    * — the band index is pure integer arithmetic, so no IEEE
    * boundary sits under a band edge), each row the operating point
    * "predict positive when the score lands in this band or above":
    * `(band, threshold_lo, tp, fp, tpr, fpr)`, bands descending by
    * threshold so the curve reads left-to-right from (0,0).
    *
    * The EXACT (unbinned, tie-averaged) area under the curve is
    * [[Robust.mannWhitneyU]]'s `cles` — AUC ≡ U₁/(n₁·n₂); this
    * readout is the curve SHAPE at a bounded number of points, which
    * the rank statistic alone doesn't give.
    *
    * Rows with a NULL score or label are excluded. Scores enter as
    * micro-units (`round(score, 6) · 10⁶` — exact for any 6-dp
    * score).
    *
    * Scale shape: one min/max aggregate (broadcast back), ONE
    * map-side-combined aggregate to ≤ `points` rows, then a
    * bin-sized cumulative window.
    */
  def rocCurve(
      df: DataFrame,
      scoreCol: String,
      labelCol: Column,
      points: Int = 10): DataFrame = {
    require(points >= 2, s"points must be >= 2, got $points")
    val lbl = labelCol.cast("boolean")
    // micro-units through DECIMAL — `round(s,6)*1e6` in doubles can
    // land one ulp under the integer and truncate a unit away
    val micro = (round(col(scoreCol).cast("double"), 6)
      .cast("decimal(18,6)") * 1000000).cast("long")
    val base = df.filter(col(scoreCol).isNotNull && lbl.isNotNull)
      .select(micro.as("__c"), lbl.as("__y"))
    val stats = base.agg(min(col("__c")).as("__mn"), max(col("__c")).as("__mx"))
    val binned = base.crossJoin(broadcast(stats))
      .groupBy(
        expr(s"(__c - __mn) * ${points}L div (__mx - __mn + 1L)")
          .cast("long").as("band"),
        col("__mn"), col("__mx"))
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("__pos"),
        sum(when(!col("__y"), 1L).otherwise(0L)).as("__neg"))
    // descending cumulative over the ≤ points-sized band table: TP at
    // a band = positives in this band or any higher band
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("band").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val tot = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    binned
      .withColumn("__tp", sum(col("__pos")).over(w))
      .withColumn("__fp", sum(col("__neg")).over(w))
      .withColumn("__p", sum(col("__pos")).over(tot))
      .withColumn("__f", sum(col("__neg")).over(tot))
      .select(col("band").cast("long").as("band"),
        (col("__mn") +
          expr(s"band * (__mx - __mn + 1L) div ${points}L"))
          .cast("long").as("threshold_lo_micro"),
        col("__tp").cast("long").as("tp"),
        col("__fp").cast("long").as("fp"),
        when(col("__p") > 0,
          round(col("__tp").cast("double") / col("__p").cast("double"), 6))
          .as("tpr"),
        when(col("__f") > 0,
          round(col("__fp").cast("double") / col("__f").cast("double"), 6))
          .as("fpr"))
  }

  /** Calibration (reliability) bins of a [0,1] `scoreCol` against
    * boolean `labelCol`: per equal-width score band, the count, mean
    * claimed score (`confidence`), observed positive rate
    * (`accuracy`), and the signed gap — the table behind a
    * reliability diagram and the per-bin terms of ECE (expected
    * calibration error = Σ n_b/n · |gap_b|).
    *
    * Band index runs in integer micro-units over the FIXED [0,1]
    * domain — `(micro · bins) div 1000001` (score 1.0 lands in the
    * top band; q202's no-IEEE-boundary device). Mean score sums as
    * DECIMAL so the confidence is order-free.
    *
    * Out-of-domain scores CLAMP to the edge bins (score < 0 → bin 0,
    * score > 1 → bin `bins−1`) rather than minting phantom negative /
    * overflow bin indices; their raw (unclamped) score still feeds
    * `confidence`, so a polluted input shows up as an edge bin whose
    * confidence escapes [0,1] — visible, not silently renumbered.
    * Callers wanting a hard contract should filter the domain first.
    *
    * Scale shape: ONE map-side-combined aggregate to ≤ `bins` rows.
    */
  def calibrationBins(
      df: DataFrame,
      scoreCol: String,
      labelCol: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val lbl = labelCol.cast("boolean")
    val micro = (round(col(scoreCol).cast("double"), 6)
      .cast("decimal(18,6)") * 1000000).cast("long")
    df.filter(col(scoreCol).isNotNull && lbl.isNotNull)
      .select(micro.as("__c"), lbl.as("__y"))
      .groupBy(greatest(lit(0L),
        least(lit(bins - 1L), expr(s"__c * ${bins}L div 1000001L")))
        .cast("long").as("bin"))
      .agg(count(lit(1)).as("__n"),
        sum((col("__c").cast("decimal(18,0)"))).as("__sc"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__pos"))
      .select(col("bin"),
        col("__n").cast("long").as("n"),
        round(col("__sc").cast("double") /
          (col("__n").cast("double") * lit(1000000.0d)), 6)
          .as("confidence"),
        round(col("__pos").cast("double") / col("__n").cast("double"), 6)
          .as("accuracy"),
        round(col("__pos").cast("double") / col("__n").cast("double") -
          col("__sc").cast("double") /
            (col("__n").cast("double") * lit(1000000.0d)), 6)
          .as("gap"))
  }

  /** Cumulative gains / lift by score decile: rank the corpus by
    * `scoreCol` DESCENDING (ties broken by `idCol`, so the ranking
    * is a total order and engine-portable), cut into `buckets`
    * equal-population ranks, and read per bucket how much of the
    * positive class the top slices capture — the curation question
    * "if I keep only the best-scored X%, how much good data
    * survives?", the rank-based complement of [[rocCurve]]'s
    * threshold view.
    *
    * Output per bucket 1..buckets (1 = best scores): `n`, `n_pos`,
    * `cum_share_pos` (positives captured through this bucket / all
    * positives) and `cum_lift` (capture rate of the top slice vs the
    * base rate; bucket `buckets` is always lift 1).
    *
    * Parity chain: the ranking key is the NEGATED round-6 micro-unit
    * score (an integral long — a negated double key would put ±0.0
    * under the engines' differing float total orders); bucket cuts
    * are [[Rank.quantileBuckets]]' exact integral arithmetic over
    * the two-phase rank device (never a corpus window); counts are
    * exact longs; the two readouts are single double divisions,
    * round 6.
    *
    * Scale shape: one rank-device pass (one range shuffle), one
    * bucket-sized aggregate + cumulative window; totals broadcast
    * back via a window over the bucket table.
    */
  def gainCurve(
      df: DataFrame,
      scoreCol: String,
      labelCol: Column,
      idCol: String,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val lbl = labelCol.cast("boolean")
    val micro = (round(col(scoreCol).cast("double"), 6)
      .cast("decimal(18,6)") * 1000000).cast("long")
    val base = df.filter(col(scoreCol).isNotNull && lbl.isNotNull)
      .select((-micro).as("__negs"),
        col(idCol).as("__id"), lbl.as("__y"), lit(1).as("__all"))
    val bucketed = Rank.quantileBuckets(base, "__all",
      Seq("__negs", "__id"), buckets)
    val agg = bucketed.groupBy("bucket")
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__pos"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val tot = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    agg
      .withColumn("__cn", sum(col("__n")).over(w))
      .withColumn("__cp", sum(col("__pos")).over(w))
      .withColumn("__tn", sum(col("__n")).over(tot))
      .withColumn("__tp", sum(col("__pos")).over(tot))
      .select(col("bucket").cast("long").as("bucket"),
        col("__n").cast("long").as("n"),
        col("__pos").cast("long").as("n_pos"),
        when(col("__tp") > 0,
          round(col("__cp").cast("double") / col("__tp").cast("double"), 6))
          .as("cum_share_pos"),
        when(col("__tp") > 0,
          round((col("__cp").cast("double") / col("__cn").cast("double")) /
            (col("__tp").cast("double") / col("__tn").cast("double")), 6))
          .as("cum_lift"))
  }

  /** Two-proportion z-test: does the A slice convert at a different
    * rate than the B slice — the categorical A/B gate next to the
    * value-shift tests ([[Robust.mannWhitneyU]] asks about magnitudes;
    * this asks about a binary outcome's RATE, the shape of
    * gate-pass-rate and conversion comparisons).
    *
    * One map-side-combined aggregate produces all four counts; the
    * rates use half-up integer micro division, z is one fixed double
    * tree over the exact counts (√ is correctly rounded — portable).
    * Degenerate pools (either slice empty, pooled rate 0 or 1) yield
    * NULL z. Rows where either column is NULL join neither slice.
    */
  def twoProportionZ(
      df: DataFrame,
      isA: Column,
      success: Column): DataFrame = {
    val a = isA.cast("boolean"); val s = success.cast("boolean")
    val agg = df.filter(a.isNotNull && s.isNotNull)
      .agg(sum(when(a, 1L).otherwise(0L)).as("__n1"),
        sum(when(a && s, 1L).otherwise(0L)).as("__x1"),
        sum(when(!a, 1L).otherwise(0L)).as("__n2"),
        sum(when(!a && s, 1L).otherwise(0L)).as("__x2"))
    def dd(c: String) = col(c).cast("double")
    val p1 = dd("__x1") / dd("__n1"); val p2 = dd("__x2") / dd("__n2")
    val pp = (dd("__x1") + dd("__x2")) / (dd("__n1") + dd("__n2"))
    agg.select(col("__n1").cast("long").as("n1"),
      col("__x1").cast("long").as("x1"),
      col("__n2").cast("long").as("n2"),
      col("__x2").cast("long").as("x2"),
      when(col("__n1") > 0,
        expr("(2L * __x1 * 1000000L + __n1) div (2L * __n1)").cast("double") /
          lit(1000000.0d)).as("p1"),
      when(col("__n2") > 0,
        expr("(2L * __x2 * 1000000L + __n2) div (2L * __n2)").cast("double") /
          lit(1000000.0d)).as("p2"),
      when(col("__n1") > 0 && col("__n2") > 0 &&
          pp > lit(0.0d) && pp < lit(1.0d),
        round((p1 - p2) / sqrt(pp * (lit(1.0d) - pp) *
          (lit(1.0d) / dd("__n1") + lit(1.0d) / dd("__n2"))), 6)).as("z"))
  }

  /** Isotonic calibration by pool-adjacent-violators over score bins:
    * the monotone step function mapping raw scores to calibrated
    * probabilities — what you DO about a bad [[calibrationBins]]
    * readout (Zadrozny & Elkan 2002; the standard non-parametric
    * alternative to Platt scaling). Returns one row per input bin:
    * `(bin, n, n_pos, rate, fitted)` with `fitted` non-decreasing in
    * bin order and each pool's fitted value the EXACT pooled positive
    * rate (rounded 6 for display; pooling decisions compare exact
    * integer cross-products pos_a·n_b vs pos_b·n_a, so no float
    * comparison ever steers the algorithm — the fit is
    * engine/platform-exact by construction).
    *
    * Scale shape: the corpus collapses to ≤ `bins` (count, positives)
    * pairs in ONE map-side-combined aggregate (the calibrationBins
    * exchange); PAV itself runs on the driver over that bounded
    * table — the classic "reduce to a summary, solve exactly on the
    * summary" split. Out-of-domain scores clamp to edge bins like
    * calibrationBins.
    */
  /** Expected / maximum calibration error over the [[calibrationBins]]
    * bands: ECE = Σ_h (n_h/N)·|acc_h − conf_h|, MCE = max_h |…| —
    * the one-number summaries a model card quotes where the
    * reliability TABLE is too much.
    *
    * Exactness: the per-bin numerator |pos_h·10⁶ − Σconf_micro| is an
    * exact integer, so ECE = T/(N·10⁶) and each bin's gap reduce to
    * half-up integer micro divisions — no rounded-double intermediate
    * anywhere (tighter than deriving from the rounded q216 table).
    * Scale shape: the calibrationBins aggregate + a bins-sized fold.
    */
  def calibrationError(
      df: DataFrame,
      scoreCol: String,
      labelCol: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val lbl = labelCol.cast("boolean")
    val micro = (round(col(scoreCol).cast("double"), 6)
      .cast("decimal(18,6)") * 1000000).cast("long")
    df.filter(col(scoreCol).isNotNull && lbl.isNotNull)
      .select(micro.as("__c"), lbl.as("__y"))
      .groupBy(greatest(lit(0L),
        least(lit(bins - 1L), expr(s"__c * ${bins}L div 1000001L")))
        .cast("long").as("bin"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__c").cast("decimal(18,0)")).as("__sc"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__pos"))
      .select(col("__n"),
        abs(col("__pos").cast("decimal(18,0)") * 1000000 - col("__sc"))
          .cast("long").as("__num"))
      .agg(count(lit(1)).as("__bins"), sum(col("__n")).as("__nn"),
        sum(col("__num").cast("decimal(38,0)")).cast("long").as("__t"),
        max(expr("(2L * __num + __n) div (2L * __n)")).as("__mce"))
      .select(col("__nn").cast("long").as("n"),
        col("__bins").cast("long").as("bins_used"),
        (expr("(2L * __t + __nn) div (2L * __nn)").cast("double") /
          lit(1000000.0d)).as("ece"),
        (col("__mce").cast("double") / lit(1000000.0d)).as("mce"))
  }

  def isotonicCalibration(
      df: DataFrame,
      scoreCol: String,
      labelCol: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val lbl = labelCol.cast("boolean")
    val micro = (round(col(scoreCol).cast("double"), 6)
      .cast("decimal(18,6)") * 1000000).cast("long")
    val binTable = df.filter(col(scoreCol).isNotNull && lbl.isNotNull)
      .select(micro.as("__c"), lbl.as("__y"))
      .groupBy(greatest(lit(0L),
        least(lit(bins - 1L), expr(s"__c * ${bins}L div 1000001L")))
        .cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("pos"))
      .orderBy("bin")
      .collect()
    // PAV with exact rational pool means: merge adjacent pools while
    // mean(prev) > mean(next), compared as pos_a·n_b > pos_b·n_a
    case class Pool(bins: List[(Long, Long, Long)], n: Long, pos: Long)
    val pools = binTable.foldLeft(List.empty[Pool]) { (acc, r) =>
      var stack = Pool(List((r.getLong(0), r.getLong(1), r.getLong(2))),
        r.getLong(1), r.getLong(2)) :: acc
      while (stack.tail.nonEmpty &&
          stack.tail.head.pos * stack.head.n > stack.head.pos * stack.tail.head.n) {
        val top = stack.head; val prev = stack.tail.head
        stack = Pool(prev.bins ::: top.bins, prev.n + top.n,
          prev.pos + top.pos) :: stack.tail.tail
      }
      stack
    }.reverse
    val spark = df.sparkSession
    import spark.implicits._
    pools.flatMap { pool =>
      // half-up integer micro division — display only, the pooling
      // above never consulted it
      val fittedMicro = (2L * pool.pos * 1000000L + pool.n) / (2L * pool.n)
      pool.bins.map { case (b, bn, bpos) =>
        (b, bn, bpos,
          (2L * bpos * 1000000L + bn) / (2L * bn) / 1e6,
          fittedMicro / 1e6)
      }
    }.toDF("bin", "n", "n_pos", "rate", "fitted")
  }

  /** Murphy (1973) decomposition of the Brier score over `bins`
    * fixed-width score bands: BS_binned = reliability − resolution +
    * uncertainty, the model-card triple that splits "how wrong are the
    * probabilities" into calibration error (reliability, want 0),
    * discrimination (resolution, want big) and the irreducible base
    * rate term. Complements [[calibrationError]] (ECE is the L1 cousin
    * of the reliability term) and reports the RAW per-row Brier score
    * beside the binned identity.
    *
    * Output: one row — `n`, `brier` (raw), `reliability`,
    * `resolution`, `uncertainty`, `brier_binned` (= rel − res + unc).
    *
    * Parity devices: scores enter as round-6 micro longs (q216's
    * band device, same clamp convention); the raw Brier numerator
    * Σ(c − y·10⁶)² and the per-bin reliability numerator
    * (S_k − P_k·10⁶)² are EXACT integers summed in DECIMAL; the
    * resolution numerator uses the cross form P_k·N − P·n_k (exact,
    * avoids ō in a squared double); each per-bin term is rounded to
    * 6 dp and summed as DECIMAL(18,6) so no double addition order
    * exists. Integer budget: |P_k·N| ≤ N², exact in DECIMAL(38,0)
    * products up to N ≈ 3·10⁹ rows — the [[Similarity]] dim-moment
    * budget convention; beyond that, pre-aggregate or shard.
    *
    * Scale shape: ONE map-side-combined corpus aggregate to ≤ `bins`
    * rows (+ one raw-moment aggregate on the same pass); everything
    * after runs on the bin table.
    */
  def brierDecomposition(
      df: DataFrame,
      scoreCol: String,
      labelCol: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val lbl = labelCol.cast("boolean")
    val micro = (round(col(scoreCol).cast("double"), 6)
      .cast("decimal(18,6)") * 1000000).cast("long")
    val binned = df.filter(col(scoreCol).isNotNull && lbl.isNotNull)
      .select(micro.as("__c"),
        when(lbl, 1L).otherwise(0L).as("__y"))
      .groupBy(greatest(lit(0L),
        least(lit(bins - 1L), expr(s"__c * ${bins}L div 1000001L")))
        .cast("long").as("bin"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__c").cast("decimal(18,0)")).as("__sc"),
        sum(col("__y")).as("__pos"),
        // raw Brier numerator: Σ (c − y·10⁶)² — exact integers
        sum(((col("__c") - col("__y") * 1000000L) *
          (col("__c") - col("__y") * 1000000L)).cast("decimal(38,0)"))
          .as("__raw"))
    // global totals broadcast back over the bin-sized table
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val nn = sum(col("__n")).over(w)
    val pp = sum(col("__pos")).over(w)
    binned
      .select(col("__n"), col("__sc"), col("__pos"), col("__raw"),
        nn.as("__nn"), pp.as("__pp"))
      .select(col("__n"), col("__raw"), col("__nn"), col("__pp"),
        // reliability term: (S_k − P_k·10⁶)² / (n_k·10¹²), round 6
        round((col("__sc").cast("decimal(38,0)") -
          col("__pos").cast("decimal(38,0)") * 1000000L)
          .multiply(col("__sc").cast("decimal(38,0)") -
            col("__pos").cast("decimal(38,0)") * 1000000L)
          .cast("double") /
          (col("__n").cast("double") * lit(1e12)), 6)
          .cast("decimal(18,6)").as("__rel"),
        // resolution term: (P_k·N − P·n_k)² / (n_k·N²), round 6
        round((col("__pos").cast("decimal(38,0)") * col("__nn") -
          col("__pp").cast("decimal(38,0)") * col("__n"))
          .multiply(col("__pos").cast("decimal(38,0)") * col("__nn") -
            col("__pp").cast("decimal(38,0)") * col("__n"))
          .cast("double") /
          (col("__n").cast("double") * col("__nn").cast("double") *
            col("__nn").cast("double")), 6)
          .cast("decimal(18,6)").as("__res"))
      .groupBy(col("__nn"), col("__pp"))
      .agg(sum(col("__raw")).as("__rawsum"),
        sum(col("__rel")).as("__relsum"),
        sum(col("__res")).as("__ressum"))
      .select(col("__nn").cast("long").as("n"),
        round(col("__rawsum").cast("double") /
          (col("__nn").cast("double") * lit(1e12)), 6).as("brier"),
        round(col("__relsum").cast("double") /
          col("__nn").cast("double"), 6).as("reliability"),
        round(col("__ressum").cast("double") /
          col("__nn").cast("double"), 6).as("resolution"),
        round((col("__pp").cast("double") / col("__nn").cast("double")) *
          (lit(1.0d) - col("__pp").cast("double") /
            col("__nn").cast("double")), 6).as("uncertainty"))
      .withColumn("brier_binned",
        round(col("reliability") - col("resolution") + col("uncertainty"), 6))
  }

  /** Wilson score interval (Wilson 1927) on a per-group pass rate —
    * the release-gate readout that stays honest at small n and
    * extreme rates, where the naive normal interval collapses or
    * crosses [0, 1]: "source X passes the quality gate 94.2%
    * [93.8, 94.5] of the time" with bounds a reviewer can trust at
    * any group size.
    *
    * Parity chain: the only inputs are the integer (passes, n) per
    * group; every double expression (p̂, the z²/n tilt, the sqrt) is
    * a fixed IEEE composition — sqrt is correctly rounded and
    * portable, unlike exp/ln — with the SAME association on both
    * engines, and z/z² are shared Scala constants interpolated into
    * both sides. Outputs round-6.
    *
    * Scale shape: ONE map-side-combined aggregate on the group key
    * (two integer sums); the interval arithmetic runs on the
    * group-sized result. A 100 TB gate audit is one aggregation job.
    */
  def wilsonRate(
      df: DataFrame,
      groupCol: String,
      flagCol: Column,
      z: Double = 1.959963984540054): DataFrame = {
    require(z > 0, s"z must be positive, got $z")
    val z2 = z * z
    val g = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(flagCol, 1L).otherwise(0L)).as("passes"))
    val nD = col("n").cast("double")
    val kD = col("passes").cast("double")
    val phat = kD / nD
    val denom = lit(1.0d) + lit(z2) / nD
    val center = (phat + lit(z2) / (lit(2.0d) * nD)) / denom
    val half = lit(z) * sqrt(phat * (lit(1.0d) - phat) / nD +
      lit(z2) / (lit(4.0d) * nD * nD)) / denom
    g.select(col(groupCol), col("n").cast("long").as("n"),
      col("passes").cast("long").as("passes"),
      round(phat, 6).as("rate"),
      round(center - half, 6).as("wilson_lo"),
      round(center + half, 6).as("wilson_hi"))
  }

  /** Exact average precision (area under the precision-recall curve
    * by the step construction): AP = (1/P) Σ_{k: yₖ=1} cumPosₖ/k over
    * the ranking by score — the retrieval/gate metric that, unlike
    * ROC-AUC, collapses when positives are rare and the ranker is
    * only good on easy negatives. Ties pin to the deterministic
    * (score DESC, id ASC) order, so AP is a pure function of the
    * data on both engines.
    *
    * Parity: scores quantize to round-6 micro longs through DECIMAL
    * (the q215 device); rank and cumulative positives ride TWO
    * value-pinned prefix devices joined on the id; each precision
    * term rounds to 6 dp and sums as DECIMAL(18,6) (the q181
    * term-sum device); the slim (id, score, y) projection persists
    * through the devices' reads inside the structural scope below.
    *
    * ==Cache contract== STRUCTURAL (none owed by the caller): the
    * output is ONE row, so the slim projection persists inside a
    * [[graft.ops.Robust.withPersisted]] scope — the result is
    * materialized eagerly and the cache is released before this
    * method returns. No cached blocks survive the call.
    *
    * Scale shape: one corpus scan to the slim projection; prefix
    * devices (one hash exchange each); one map-side-combined fold.
    */
  def averagePrecision(
      df: DataFrame,
      idCol: String,
      scoreCol: String,
      labelCol: Column): DataFrame = {
    val lbl = labelCol.cast("boolean")
    val micro = (round(col(scoreCol).cast("double"), 6)
      .cast("decimal(18,6)") * 1000000).cast("long")
    val slim = df.filter(col(scoreCol).isNotNull && lbl.isNotNull)
      .select(col(idCol).as("__id"), (-micro).as("__negs"),
        lbl.cast("long").as("__yl"))
      .withColumn("__g", lit(1)).withColumn("__one", lit(1L))
    graft.ops.Robust.withPersisted(slim, maxRows = 1L) { base =>
      val rk = graft.ops.Rank.stratifiedPrefixSum(
        base, "__g", Seq("__negs", "__id"), "__one")
        .select(col("__id"), (col("prefix") + 1L).as("__k"))
      val cp = graft.ops.Rank.stratifiedPrefixSum(
        base, "__g", Seq("__negs", "__id"), "__yl")
        .select(col("__id"), col("__yl"),
          (col("prefix") + col("__yl")).as("__cum"))
      val terms = cp.join(rk, "__id")
        .select(col("__yl"),
          when(col("__yl") === 1L,
            round(col("__cum").cast("double") / col("__k").cast("double"), 6)
              .cast("decimal(18,6)")).as("__t"))
      terms.agg(count(lit(1)).as("n"), sum(col("__yl")).as("__p"),
        sum(col("__t")).as("__s"))
        .select(col("n").cast("long").as("n"),
          col("__p").cast("long").as("n_pos"),
          round(col("__s").cast("double") / col("__p").cast("double"), 6)
            .as("ap"))
    }
  }
}
