package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust (median/MAD) outlier detection — the outlier gate that does
  * not poison itself: z-scores (q82) move with the outliers they are
  * supposed to find, while the median and the median absolute
  * deviation have a 50% breakdown point (Hampel 1974; the k·1.4826
  * scaling makes MAD a consistent σ estimator under normality).
  *
  * Scale shape: two [[Percentiles.exact]] passes (each a distributed
  * bracketed selection — nothing corpus-proportional on one task,
  * see Percentiles.scala) plus two broadcast joins of group-sized
  * stats back onto the scan. `persistProjection = true` caches the
  * projected (group, value) relation so both selection passes share
  * ONE materialization — MEASURED round 11: at sf0.1 (1M rows, narrow
  * pushed-down parquet scans) the cached variant is ~2× SLOWER
  * (4.4–5.4s vs 2.1–2.4s warm; materialization + InMemoryTableScan
  * reads cost more than the cheap re-scans), so the default is OFF;
  * flip it when the upstream is an expensive computed relation or a
  * wide scan where re-reading dominates (the 100 TB shape). The
  * returned DataFrame is lazy, so the cache must outlive this call —
  * opted-in projections register in a queue and the CALLER releases
  * them with [[Robust.unpersistPersisted]] after materializing.
  *
  * Reference behavior: the reference pushes outlier predicates to the
  * warehouse as SQL text (ext/maxcompute/source.go:135-247); this is
  * the corresponding native plan.
  */
object Robust {

  /** Projections persisted by `persistProjection = true`, in creation
    * order. The returned DataFrames are lazy, so the operator cannot
    * unpersist for the caller (the cache must survive until the
    * caller materializes the result) — instead every persisted
    * projection registers here and the caller releases with
    * [[unpersistPersisted]] once done. Unreleased entries otherwise
    * accumulate cached blocks across repeated calls in a long-lived
    * session.
    */
  private val persistedProjections =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]

  private[ops] def registerPersisted(df: DataFrame): DataFrame = {
    persistedProjections.add(
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    df
  }

  /** Unpersists every projection cached by `persistProjection = true`
    * since the last call and returns how many were released. Call
    * after materializing the results of madOutliers/spearman runs
    * that opted in.
    */
  def unpersistPersisted(blocking: Boolean = false): Int = {
    var n = 0
    var d = persistedProjections.poll()
    while (d != null) { d.unpersist(blocking); n += 1; d = persistedProjections.poll() }
    n
  }

  /** STRUCTURAL cache scope for ops whose output is provably tiny
    * (≪ driver memory: a stats row, a top-k list) while their input
    * persist is large. Persists `slim`, builds `plan(slim)`, EAGERLY
    * materializes the result, releases the persist, and returns the
    * rows as a local relation — so no cached block survives the call
    * and the caller owes NO release contract (the round-13 verdict's
    * withPersisted directive; the queue contract above remains for
    * ops with unbounded outputs, which cannot eagerly collect).
    *
    * `maxRows` is a hard driver-safety bound: exceeding it throws
    * rather than silently pulling an unbounded relation to the
    * driver — callers must pass an output bound derived from their
    * parameters (e.g. |queries|·topK), never a guess.
    */
  private[graft] def withPersisted(slim: DataFrame, maxRows: Long)(
      plan: DataFrame => DataFrame): DataFrame = {
    val cached =
      slim.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val out = plan(cached)
      require(maxRows > 0 && maxRows <= (1L << 22),
        s"withPersisted: maxRows $maxRows outside the driver-safe range")
      val rows = out.limit(maxRows.toInt + 1).collect()
      if (rows.length > maxRows)
        throw new IllegalStateException(
          s"withPersisted: result exceeded the declared bound $maxRows — " +
            "this op's output is not driver-small; use the persisted queue")
      out.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), out.schema)
    } finally cached.unpersist(false)
  }

  /** Rows whose `|value − median(group)|` exceeds `k · 1.4826 ·
    * MAD(group)`, with the per-group `med`/`mad` attached. Null
    * values never flag (null comparisons are 3VL-false in the
    * filter). The threshold multiplication is left-associated
    * `(k · 1.4826) · mad` — two IEEE ops every engine folds
    * identically, so the flag set is engine-portable.
    */
  def madOutliers(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Double = 3.0,
      accuracy: Int = 100000,
      persistBase: Boolean = true): DataFrame = {
    require(k > 0.0, s"graft: k must be positive, got $k")
    // r18: each selection device persists ITS OWN slim base (the
    // exactImpl persistBase default) — the MAD device's persisted base
    // materializes the deviation join once, so the median subtree also
    // evaluates once instead of once per pass.
    // persistBase registers the cached relation on the release queue:
    // Bench/Verify drain it per query, but a LIBRARY caller in a
    // long-lived session must call [[unpersistPersisted]] after
    // materializing, or pass `persistBase = false` (the r18 ADVICE
    // leak surface: one cached relation accumulated per call) — the
    // opt-out trades the measured win (q158 3.92 → 3.62 s) for a
    // drain-free call.
    val proj = df.select(groupCols.map(col) :+
      col(valueCol).cast("double").as("__v"): _*)
    val meds = Percentiles.exactOne(proj, groupCols, "__v", 0.5, accuracy)
      .select(groupCols.map(col) :+ col("pct").as("med"): _*)
    val devs = proj.join(broadcast(meds), groupCols)
      .withColumn("__dev", abs(col("__v") - col("med")))
    // persistBase on the MAD device only: its base CONTAINS the
    // whole median device (the deviation join), so the persist both
    // saves that join per pass and evaluates `meds` once
    val mads = Percentiles.exactOne(devs, groupCols, "__dev", 0.5, accuracy,
      persistBase = persistBase)
      .select(groupCols.map(col) :+ col("pct").as("mad"): _*)
    df.join(broadcast(meds), groupCols)
      .join(broadcast(mads), groupCols)
      .withColumn("__dev", abs(col(valueCol).cast("double") - col("med")))
      .filter(col("__dev") > lit(k * 1.4826) * col("mad"))
      .drop("__dev")
  }

  /** Mann–Whitney U rank-sum test (Mann & Whitney 1947): does the
    * `isA` slice's `valueCol` distribution stochastically dominate
    * the rest? The nonparametric complement of a mean diff (q140's
    * A/B readout) — rank-based, so one whale row cannot move it.
    *
    * Returns one row: `u1` (U of the A slice), `n1`, `n2`, `cles`
    * (common-language effect size `U1/(n1·n2)` — P[random A > random
    * B] counting ties half), and the tie-corrected normal
    * approximation `z`. Rows where `isA` or the value is NULL are in
    * neither slice (3VL).
    *
    * Parity chain: average ranks are kept INTEGRAL by working in
    * doubled units — `2·R1 = Σ_values ca·(2·cntLess + c + 1)` as
    * DECIMAL products (BIGINT overflows once rank sums pass ~3·10⁹
    * rows²); the tie term `Σ(c³−c)` runs in DECIMAL(12,0)³ → (36,0)
    * (per-value tie counts ≤ 10¹² documented); only the final
    * `u1/cles/z` divisions are IEEE doubles (and √ is
    * correctly-rounded per IEEE-754, unlike exp/ln — safe across
    * engines).
    *
    * Scale shape: one map-side-combined aggregate to the DISTINCT-
    * VALUE-sized (value, count, countA) table; cntLess is the
    * two-phase distributed prefix sum ([[Rank.stratifiedPrefixSum]] —
    * no corpus-sized single-partition window); the statistic is one
    * more map-side-combined fold of that table.
    */
  def mannWhitneyU(
      df: DataFrame,
      valueCol: String,
      isA: Column,
      numPartitions: Int = 0): DataFrame = {
    val d18 = "decimal(18,0)"
    val d12 = "decimal(12,0)"
    val vc = df
      .filter(isA.isNotNull && col(valueCol).isNotNull)
      .select(col(valueCol).as("__v"), isA.cast("boolean").as("__a"))
      .groupBy("__v")
      .agg(count(lit(1)).as("__c"), sum(col("__a").cast("long")).as("__ca"))
    val pre = Rank.stratifiedPrefixSum(
      vc.withColumn("__g", lit(1)), "__g", Seq("__v"), "__c", numPartitions)
    val cc = col("__c").cast(d12)
    val agg = pre.agg(
      sum(col("__ca").cast(d18) *
        (lit(2L) * col("prefix") + col("__c") + lit(1L)).cast(d18))
        .as("__two_r1"),
      sum(col("__ca")).as("__n1"),
      sum(col("__c") - col("__ca")).as("__n2"),
      sum(cc * cc * cc - cc).as("__t"))
    agg.select(
      ((col("__two_r1") -
        col("__n1").cast(d18) * (col("__n1") + lit(1L)).cast(d18))
        .cast("double") / lit(2.0d)).as("u1"),
      col("__n1").cast("long").as("n1"),
      col("__n2").cast("long").as("n2"),
      col("__t").cast("double").as("__td"),
      (col("__n1") + col("__n2")).cast("double").as("__nd"))
      .select(col("u1"), col("n1"), col("n2"),
        round(col("u1") / (col("n1").cast("double") * col("n2")), 6)
          .as("cles"),
        round(
          (col("u1") - col("n1").cast("double") * col("n2") / lit(2.0d)) /
          sqrt((col("n1").cast("double") * col("n2") / lit(12.0d)) *
            ((col("__nd") + lit(1.0d)) -
              col("__td") / (col("__nd") * (col("__nd") - lit(1.0d))))), 6)
          .as("z"))
  }

  /** Spearman rank correlation ρ between `xCol` and `yCol` per
    * `groupCol` (Spearman 1904): Pearson correlation of the mid-rank
    * transforms — the monotone-association readout one whale row
    * cannot move, the rank complement of q108's moment-exact Pearson.
    *
    * Parity chain (the [[mannWhitneyU]] doubled-units device, applied
    * twice): per (group, value) the DOUBLED mid-rank
    * `2·cntLess + c + 1` stays integral; the five sums
    * Σdx, Σdy, Σdx², Σdy², Σdx·dy run in DECIMAL(38,0) (the dx·dy
    * products pass BIGINT once rank sums reach ~3·10⁹ rows; the
    * n·Σxy − Σx·Σy combinations stay exact inside DECIMAL(38,0) up to
    * ~10⁹ rows per group — document-scale groups, not corpus scale);
    * only the final ratio and the correctly-rounded √ are IEEE
    * doubles, so ρ is engine-portable. Degenerate groups (a constant
    * side) yield NULL, mirrored by the oracle's CASE guard.
    *
    * Scale shape: each side reduces to its DISTINCT-VALUE table
    * (map-side combined), ranks ride the two-phase distributed prefix
    * sum ([[Rank.stratifiedPrefixSum]] — no corpus-sized
    * single-partition window), and the rank join back onto the corpus
    * shuffles on (group, value) — skew bounded by value multiplicity,
    * not group size. One more map-side-combined fold ends it.
    */
  def spearman(
      df: DataFrame,
      groupCol: String,
      xCol: String,
      yCol: String,
      numPartitions: Int = 0,
      persistProjection: Boolean = false,
      widenBase: Boolean = true): DataFrame = {
    val d19 = "decimal(19,0)"
    val d38 = "decimal(38,0)"
    // opt-in (same queue/release contract as madOutliers): the
    // round-12 value-pinned rank device reads its input THREE times
    // (boundary sample + row side + map-side side table), and each
    // value table here is a corpus aggregate — so persistProjection
    // caches base (3 readers) AND both distinct-value tables (3+
    // readers each). Measured at sf0.1 (q195): without it the device
    // re-runs the corpus groupBy ~6×, +1.8 s; with it q195 returns
    // under the round-11 checkpoint-era time. Persistence is SAFE
    // under eviction now — bucket boundaries are frozen literals, so
    // a recomputed block reproduces identical buckets (the round-11
    // pid hazard no longer exists).
    // widenBase: over a large single-row-group base the rank joins and
    // moment fold win from session parallelism (q195, 600k rows);
    // over a tiny base the extra exchange is pure overhead (q204,
    // 5k docs, measured +0.5 s) — caller's knob, no-op at real scale
    val proj0 = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull &&
        col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"), col(xCol).as("__x"),
        col(yCol).as("__y"))
    val base0 = if (widenBase) Scale.widen(proj0) else proj0
    val base =
      if (persistProjection) registerPersisted(base0) else base0
    def doubledRanks(vcol: String, out: String): DataFrame = {
      val vc0 = base.groupBy(col("__g"), col(vcol))
        .agg(count(lit(1)).as("__c"))
      val vc = if (persistProjection) registerPersisted(vc0) else vc0
      Rank.stratifiedPrefixSum(vc, "__g", Seq(vcol), "__c", numPartitions)
        .select(col("__g"), col(vcol),
          (lit(2L) * col("prefix") + col("__c") + lit(1L)).as(out))
    }
    val ranked = base
      .join(doubledRanks("__x", "__dx"), Seq("__g", "__x"))
      .join(doubledRanks("__y", "__dy"), Seq("__g", "__y"))
    val (dx, dy) = (col("__dx").cast(d19), col("__dy").cast(d19))
    val agg = ranked.groupBy("__g").agg(
      count(lit(1)).as("__n"),
      sum(dx).cast(d38).as("__sx"), sum(dy).cast(d38).as("__sy"),
      sum(dx * dx).cast(d38).as("__sxx"),
      sum(dy * dy).cast(d38).as("__syy"),
      sum(dx * dy).cast(d38).as("__sxy"))
    val n = col("__n").cast(d38)
    val num = n * col("__sxy") - col("__sx") * col("__sy")
    val v1 = n * col("__sxx") - col("__sx") * col("__sx")
    val v2 = n * col("__syy") - col("__sy") * col("__sy")
    agg.select(col("__g").as(groupCol), col("__n").cast("long").as("n"),
      when(v1 > lit(0) && v2 > lit(0),
        round(num.cast("double") /
          sqrt(v1.cast("double") * v2.cast("double")), 6)).as("rho"))
  }

  /** One-way ANOVA over `valueCol` by `groupCol` (Fisher): does the
    * group structure explain the variance? The k-sample extension of
    * q140's two-arm readout. Returns one row: `k`, `n`, `f` and the
    * effect size `eta_sq` (SSB/SST).
    *
    * Parity chain: per-group sums and squared sums are exact
    * DECIMAL(18,2)/(37,4); each group's `s²/n` term is an IEEE double
    * rounded to 6 dp and summed as DECIMAL(28,6) (the q181 χ²
    * term-sum device — double addition is order-dependent, decimal
    * addition is not), so F is a fixed function of exact scalars.
    * Null values and null groups are excluded (3VL).
    *
    * Scale shape: ONE map-side-combined aggregate to the k-row group
    * table; everything after is k-sized arithmetic.
    */
  def anovaF(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("decimal(18,2)")
    val byG = df
      .filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("__ng"),
        sum(v).cast("decimal(18,2)").as("__sg"),
        sum(v * v).as("__ssg"))
    val term = round(
      col("__sg").cast("double") * col("__sg").cast("double") /
        col("__ng").cast("double"), 6).cast("decimal(28,6)")
    val agg = byG.agg(
      count(lit(1)).as("__k"), sum(col("__ng")).as("__n"),
      sum(col("__sg")).cast("decimal(28,2)").as("__s"),
      sum(col("__ssg")).cast("decimal(38,4)").as("__ss"),
      sum(term).as("__a"))
    val (nD, kD) = (col("__n").cast("double"), col("__k").cast("double"))
    val sst = col("__ss").cast("double") -
      col("__s").cast("double") * col("__s").cast("double") / nD
    val ssb = col("__a").cast("double") -
      col("__s").cast("double") * col("__s").cast("double") / nD
    val ssw = col("__ss").cast("double") - col("__a").cast("double")
    agg.select(col("__k").cast("long").as("k"),
      col("__n").cast("long").as("n"),
      // ssw = 0 (perfect within-group fit) would put 0 in the F
      // denominator — NULL, not an ANSI divide-by-zero or IEEE inf
      when(col("__k") > 1 && col("__n") > col("__k") && ssw > lit(0.0d),
        round((ssb / (kD - lit(1.0d))) / (ssw / (nD - kD)), 6)).as("f"),
      // an all-constant valueCol gives sst = 0 → NULL, never 0/0 NaN
      when(sst > lit(0.0d), round(ssb / sst, 6)).as("eta_sq"))
  }

  /** Quantile-based distribution shape per group: Bowley skewness
    * `(Q3 + Q1 − 2·median)/(Q3 − Q1)` (Bowley 1901) and Moors
    * kurtosis `((E7−E5) + (E3−E1))/(E6−E2)` over the octiles
    * (Moors 1988) — the outlier-immune complement of moment skew/
    * kurtosis (a third/fourth moment is a whale amplifier; these are
    * pure quantile ratios with bounded influence).
    *
    * Parity chain: the seven octiles come from
    * [[Percentiles.exact]]'s bracketed selection and are rounded to
    * 6 dp first (absorbing the quantile-interpolation association
    * gap vs `quantile_cont` — the q106 precedent); both statistics
    * are then fixed double expressions of those shared values,
    * rounded 6. Degenerate groups (zero IQR) yield NULL.
    *
    * Scale shape: one [[Percentiles.exact]] pass (all seven
    * boundaries share its two corpus passes); everything after is
    * group-sized.
    */
  def robustShape(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      accuracy: Int = 100000): DataFrame = {
    val oct = Percentiles.exact(df, groupCols, valueCol,
      (1 to 7).map(_ / 8.0), accuracy)
    def e(i: Int) = round(element_at(col("pcts"), i), 6)
    val iqr = e(6) - e(2)
    oct.select(groupCols.map(col) ++ Seq(
      col("n").cast("long").as("n"),
      e(2).as("q1"), e(4).as("median"), e(6).as("q3"),
      when(iqr > 0,
        round((e(6) + e(2) - lit(2.0d) * e(4)) / iqr, 6))
        .as("bowley_skew"),
      when(iqr > 0,
        round(((e(7) - e(5)) + (e(3) - e(1))) / iqr, 6))
        .as("moors_kurtosis")): _*)
  }

  /** OLS y ~ x with influence diagnostics: residual, leverage
    * h_i = 1/n + (x−x̄)²/Sxx and Cook's distance per row, top `topK`
    * by Cook's D — the regression-audit question "which rows OWN this
    * slope" (a whale with high leverage AND a big residual can set
    * the fit single-handedly; Theil-Sen resists it, this one NAMES
    * it). Returns `(id, x, y, resid, leverage, cooks_d)`.
    *
    * Parity chain: the five moments are exact integer cents/scale-0
    * decimals (single correct double rounding); slope/intercept/SSE
    * are fixed double expressions (SSE sums round-6 squared residuals
    * as DECIMAL — never a raw double sum); per-row diagnostics are
    * IEEE trees of broadcast scalars; top-k orders by (round-6 D
    * DESC, id) — a total order both engines replay.
    *
    * Scale shape: one moment aggregate, one SSE aggregate, one
    * map-only diagnostic pass + distributed TakeOrdered — three scans,
    * nothing corpus-sized collected.
    */
  def olsInfluence(
      df: DataFrame,
      idCol: String,
      xCol: String,
      yCol: String,
      topK: Int = 20): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val xc = (col(xCol).cast("decimal(18,2)") * 100).cast("long")
    val yc = (col(yCol).cast("decimal(18,2)") * 100).cast("long")
    val base = Scale.widen(
      df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
        .select(col(idCol).as("id"), xc.as("__x"), yc.as("__y")))
    val d19 = "decimal(19,0)"
    val mom = base.agg(count(lit(1)).as("__n"),
      sum(col("__x")).cast("long").as("__sx"),
      sum(col("__y")).cast("long").as("__sy"),
      sum((col("__x").cast(d19) * col("__x").cast(d19)).cast("decimal(38,0)"))
        .as("__sxx"),
      sum((col("__x").cast(d19) * col("__y").cast(d19)).cast("decimal(38,0)"))
        .as("__sxy"))
    val nD = col("__n").cast("double")
    val slope = (nD * col("__sxy").cast("double") -
      col("__sx").cast("double") * col("__sy").cast("double")) /
      (nD * col("__sxx").cast("double") -
        col("__sx").cast("double") * col("__sx").cast("double"))
    val scalars = mom.select(col("__n"), col("__sx"), col("__sxx"),
      slope.as("__b"),
      ((col("__sy").cast("double") - slope * col("__sx").cast("double")) / nD)
        .as("__a"),
      (col("__sx").cast("double") / nD).as("__xbar"),
      ((nD * col("__sxx").cast("double") - col("__sx").cast("double") *
        col("__sx").cast("double")) / nD).as("__sxxc"))
    // residuals in VALUE units (cents/100), then ROUND-6 MICRO longs —
    // SSE sums their exact squares in scale-0 DECIMAL(38,0) (a
    // fractional-scale wide decimal would double-round its double
    // cast in DuckDB, the q231 hazard)
    val resid = (col("__y").cast("double") -
      (col("__a") + col("__b") * col("__x").cast("double"))) / lit(100.0d)
    val residM = (round(resid, 6).cast("decimal(18,6)") * 1000000)
      .cast("long")
    val withS = base.crossJoin(broadcast(scalars))
    val sse = withS
      .agg(sum((residM.cast(d19) * residM.cast(d19)).cast("decimal(38,0)"))
        .as("__sse"))
    val lev = lit(1.0d) / col("__n").cast("double") +
      ((col("__x").cast("double") - col("__xbar")) *
        (col("__x").cast("double") - col("__xbar"))) / col("__sxxc")
    // σ² back in value² units (micro² / 10¹²)
    val sigma2 = col("__sse").cast("double") / lit(1.0e12) /
      (col("__n").cast("double") - lit(2.0d))
    // Cook's D is unit-free: the round-6 value-unit residual against
    // value-unit σ²
    val rm6 = round(resid, 6)
    // σ² = 0 (perfect fit) or leverage 1 would divide by zero (ANSI
    // throws even for doubles) — D is 0 by convention there
    val d = when(sigma2 > 0 && lev < 1, rm6 * rm6 * lev /
      (lit(2.0d) * sigma2 * (lit(1.0d) - lev) * (lit(1.0d) - lev)))
      .otherwise(lit(0.0d))
    withS.crossJoin(broadcast(sse))
      .select(col("id"),
        (col("__x").cast("double") / lit(100.0d)).as("x"),
        (col("__y").cast("double") / lit(100.0d)).as("y"),
        round(resid, 6).as("resid"),
        round(lev, 6).as("leverage"),
        round(d, 6).as("cooks_d"))
      .orderBy(col("cooks_d").desc, col("id"))
      .limit(topK)
  }

  /** First-order partial correlation r_xy·z — the correlation of x
    * and y with z's linear influence removed:
    * (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)) — the screen for
    * "is this association real or is both-sides-track-z confounding"
    * (a quality score correlating with label purity may both just
    * track document length).
    *
    * ONE map-side-combined aggregate computes all nine moments in
    * exact cents / scale-0 decimals; the three Pearson r's and the
    * partial are fixed double trees. Degenerate inputs (any zero
    * variance, |r| = 1 denominators) yield NULL.
    */
  def partialCorrelation(
      df: DataFrame,
      xCol: String,
      yCol: String,
      zCol: String): DataFrame = {
    val d19 = "decimal(19,0)"
    def cents(c: String) = (col(c).cast("decimal(18,2)") * 100).cast("long")
    val base = Scale.widen(
      df.filter(col(xCol).isNotNull && col(yCol).isNotNull &&
        col(zCol).isNotNull)
      .select(cents(xCol).as("__x"), cents(yCol).as("__y"),
        cents(zCol).as("__z")))
    def s2(a: String, b: String) =
      sum((col(a).cast(d19) * col(b).cast(d19)).cast("decimal(38,0)"))
    val mom = base.agg(count(lit(1)).as("__n"),
      sum(col("__x")).cast("long").as("__sx"),
      sum(col("__y")).cast("long").as("__sy"),
      sum(col("__z")).cast("long").as("__sz"),
      s2("__x", "__x").as("__sxx"), s2("__y", "__y").as("__syy"),
      s2("__z", "__z").as("__szz"), s2("__x", "__y").as("__sxy"),
      s2("__x", "__z").as("__sxz"), s2("__y", "__z").as("__syz"))
    val nD = col("__n").cast("double")
    def dd(c: String) = col(c).cast("double")
    def r(sab: String, sa: String, sb: String, saa: String, sbb: String) = {
      val num = nD * dd(sab) - dd(sa) * dd(sb)
      val va = nD * dd(saa) - dd(sa) * dd(sa)
      val vb = nD * dd(sbb) - dd(sb) * dd(sb)
      when(va > 0 && vb > 0, num / sqrt(va * vb))
    }
    val rxy = r("__sxy", "__sx", "__sy", "__sxx", "__syy")
    val rxz = r("__sxz", "__sx", "__sz", "__sxx", "__szz")
    val ryz = r("__syz", "__sy", "__sz", "__syy", "__szz")
    mom.select(col("__n").cast("long").as("n"),
      round(rxy, 6).as("r_xy"), round(rxz, 6).as("r_xz"),
      round(ryz, 6).as("r_yz"),
      round((rxy - rxz * ryz) /
        sqrt((lit(1.0d) - rxz * rxz) * (lit(1.0d) - ryz * ryz)), 6)
        .as("r_xy_given_z"))
  }

  /** Jackknife standard error of the ratio estimator R = Σy/Σx —
    * the resampling-free variance readout for a NONLINEAR statistic
    * (a plain variance-of-the-mean formula does not exist for a
    * ratio; the delta method needs derivatives; the jackknife needs
    * only leave-one-out replicates, and for sums those are closed
    * form: R₍₋ᵢ₎ = (Sy−yᵢ)/(Sx−xᵢ), no resampling pass at all).
    * Returns one row: `n`, `ratio`, `jack_mean`, `jack_se`,
    * `jack_bias` = (n−1)(R̄_jack − R).
    *
    * Scale shape: TWO corpus passes (totals, then replicate moments
    * — the second needs the first's mean) + 1-row broadcasts. Every
    * replicate is computed from the broadcast totals; nothing
    * corpus-sized ever sits on the driver.
    *
    * Parity chain: totals are exact integer cents (leave-one-out
    * differences subtract as LONGS, one double cast each); each
    * replicate is one IEEE division; replicates round to 6 dp and
    * sum as DECIMAL(18,6) (the q181 ladder — a raw double sum is
    * partial-order-dependent); the jackknife mean uses half-up
    * integer micro division (q235); the deviation sum-of-squares
    * rides the same round-6 decimal ladder. Digit budget: the
    * replicate sum stays exactly castable to double below ~9e15
    * micro units (documented, same class as dimCorrelation's).
    */
  def jackknifeRatio(df: DataFrame, yCol: String, xCol: String): DataFrame = {
    val yc = (col(yCol).cast("decimal(18,2)") * 100).cast("long")
    val xc = (col(xCol).cast("decimal(18,2)") * 100).cast("long")
    val base = Scale.widen(
      df.filter(col(yCol).isNotNull && col(xCol).isNotNull)
        .select(yc.as("__y"), xc.as("__x")))
    val tot = base.agg(sum(col("__y")).cast("long").as("__sy"),
      sum(col("__x")).cast("long").as("__sx"), count(lit(1)).as("__n"))
    // DEGENERATE-REPLICATE CONVENTION: a leave-one-out set with zero
    // x mass (Sx − x_i = 0 — n = 1, or one row carrying all of x) has
    // an undefined ratio; under ANSI the bare division would throw.
    // Such replicates are NULL and EXCLUDED — the jackknife constants
    // (mean divisor, (m−1)/m, bias factor) use the VALID replicate
    // count m, and with zero valid replicates every jackknife output
    // is NULL. `n` stays the row count. Mirrored in the q247 oracle.
    val ri = when(col("__sx") - col("__x") =!= 0,
      (col("__sy") - col("__y")).cast("double") /
        (col("__sx") - col("__x")).cast("double"))
    val p1 = base.crossJoin(broadcast(tot))
      .agg(sum(round(ri, 6).cast("decimal(18,6)")).as("__sr"),
        count(ri).as("__m"))
    val withMean = tot.crossJoin(broadcast(p1))
      .select(col("__sy"), col("__sx"), col("__n"), col("__m"),
        when(col("__m") > 0,
          expr("(2L * cast(__sr * 1000000 as long) + __m) div (2L * __m)")
            .cast("double") / lit(1000000.0d)).as("__jm"))
    val dev = round(ri, 6) - col("__jm")
    val p2 = base.crossJoin(broadcast(withMean))
      .agg(sum(round(dev * dev, 6).cast("decimal(18,6)")).as("__sd"),
        first(col("__jm")).as("__jm2"), first(col("__n")).as("__n2"),
        first(col("__m")).as("__m2"),
        first(col("__sy")).as("__sy2"), first(col("__sx")).as("__sx2"))
    val mD = col("__m2").cast("double")
    val ratio = when(col("__sx2") =!= 0,
      col("__sy2").cast("double") / col("__sx2").cast("double"))
    p2.select(col("__n2").cast("long").as("n"),
      round(ratio, 6).as("ratio"),
      round(col("__jm2"), 6).as("jack_mean"),
      when(col("__m2") > 0,
        round(sqrt((mD - lit(1.0d)) / mD * col("__sd").cast("double")), 6))
        .as("jack_se"),
      round((mD - lit(1.0d)) * (col("__jm2") - ratio), 6).as("jack_bias"))
  }

  /** Brown–Forsythe test (Levene with median centers) for variance
    * homogeneity across groups: the one-way ANOVA F applied to the
    * absolute deviations z = |x − median_g| — the robust "are these
    * groups equally spread" gate run before trusting a pooled
    * variance or an ANOVA's equal-variance assumption (mean-centered
    * Levene chases whales; the median center is the standard robust
    * choice).
    *
    * Parity chain: group medians come from [[Percentiles.exact]]
    * (bracketed selection, round-6 — the q106 precedent); deviations
    * become EXACT micro-unit longs (x has ≤ 2 dp, the round-6 median
    * has ≤ 6 dp, so z = |x − med| is exactly a micro integer — no
    * rounded-double ladder at all); z and z² sum in scale-0
    * DECIMAL(38,0); the pooled Sg²/ng and S²/n terms stay INTEGRAL
    * via half-up integer division ⌊(2a + b) / 2b⌋ (computed with an
    * exact pmod so Spark's scale-6 decimal division never rounds a
    * near-integer quotient; DuckDB mirrors with HUGEINT `//`). Every
    * value up to the SS integers is therefore bit-identical across
    * engines — the previous double-product form (sum of
    * CAST(sgD·sgD/ngD AS DECIMAL)) diverged at 6M rows, where the
    * a2 − s²/n cancellation drops ~7 leading digits and a one-ulp
    * engine gap in the 2^53+ intermediates surfaced as ±0.5 in
    * ss_between (caught by the round-12 sf1 gate). The only doubles
    * are the final casts of the SS integers (single correct rounding
    * on both engines — scale-0, so no DuckDB double-round) and the
    * fixed F expression; degenerate cases (k < 2, zero within-spread)
    * yield NULL F. SS outputs are whole value² integers (half-up
    * /10¹² from the micro² sums, clamped at 0 — SSB/SSW are ≥ 0
    * mathematically; the ≤ k/2-microunit division jitter must not
    * produce −1): at 6M rows a 6-dp ss_within needs 22 significant
    * digits — past double (ulp 0.25 at 1.4e15, and ROUND(,6) of such
    * a double flipped between engines at sf1), and a fractional wide
    * decimal would double-round in DuckDB, so the integer is the one
    * representation both engines agree on at every magnitude.
    *
    * Integer budget (ANSI: overflow throws, never silent): sg² needs
    * sg = Σ|z| micro < 3·10¹⁸ — at ~2·10¹⁰ micro mean deviation that
    * is ~10⁸ rows per group; beyond that, move the deviation unit
    * from micro to centi (the sums shrink ×10⁸) or run the
    * double-product form and accept last-digit wobble.
    *
    * Scale shape: one [[Percentiles.exact]] pass for the medians
    * (two bracketed corpus passes), one broadcast join of the
    * group-median table, one map-side-combined moment aggregate.
    */
  def brownForsythe(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val base = df.filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
    val med = graft.ops.Percentiles.exact(base, Seq(groupCol),
      valueCol, Seq(0.5))
      .select(col(groupCol), (round(element_at(col("pcts"), 1), 6)
        .cast("decimal(18,6)") * 1000000).cast("long").as("__mm"))
    val xMicro = (col(valueCol).cast("decimal(18,2)") * 1000000).cast("long")
    val zm = abs(xMicro - col("__mm"))
    val byG = base.join(broadcast(med), groupCol)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("__ng"),
        sum(zm.cast("decimal(38,0)")).as("__sg"),
        sum((zm.cast("decimal(19,0)") * zm.cast("decimal(19,0)"))
          .cast("decimal(38,0)")).as("__ssg"))
    // half-up integer division q = round(a / b) = ⌊(2a + b) / 2b⌋,
    // computed exactly: subtract the pmod first so the decimal divide
    // is an exact integer (Spark's (38,0)/(38,0) division rounds at
    // scale 6, which could flip a floor on a near-integer quotient)
    def halfUpDiv(a: Column, b: Column): Column = {
      val x = a * lit(2) + b; val y = b * lit(2)
      ((x - pmod(x, y)) / y).cast("decimal(38,0)")
    }
    val term = halfUpDiv(col("__sg") * col("__sg"),
      col("__ng").cast("decimal(38,0)"))
    val agg = byG.agg(
      count(lit(1)).as("__k"), sum(col("__ng")).as("__n"),
      sum(col("__sg")).cast("decimal(38,0)").as("__s"),
      sum(col("__ssg")).cast("decimal(38,0)").as("__ss"),
      sum(term).cast("decimal(38,0)").as("__a"))
    val (nD, kD) = (col("__n").cast("double"), col("__k").cast("double"))
    val zero = lit(0).cast("decimal(38,0)")
    val ssbI = greatest(col("__a") - halfUpDiv(col("__s") * col("__s"),
      col("__n").cast("decimal(38,0)")), zero)
    val sswI = greatest(col("__ss") - col("__a"), zero)
    val micro2 = lit(1000000000000L).cast("decimal(38,0)")
    val ssb = ssbI.cast("double")
    val ssw = sswI.cast("double")
    agg.select(col("__k").cast("long").as("k"),
      col("__n").cast("long").as("n"),
      halfUpDiv(ssbI, micro2).cast("long").as("ss_between"),
      halfUpDiv(sswI, micro2).cast("long").as("ss_within"),
      when(col("__k") > 1 && col("__n") > col("__k") && sswI > zero,
        round((ssb / (kD - lit(1.0d))) / (ssw / (nD - kD)), 6)).as("f"))
  }

  /** Cliff's delta — the direct-interpretation effect size behind
    * [[mannWhitneyU]]: δ = P[A > B] − P[B > A] = 2·U₁/(n₁n₂) − 1,
    * with Romano et al. (2006) magnitude bands. Where the U test
    * answers "is there a shift", δ answers "how big", bounded [−1, 1]
    * and whale-immune. Same machinery, same scale shape (one
    * distinct-value aggregate + the pinned prefix-sum device).
    */
  def cliffsDelta(
      df: DataFrame,
      valueCol: String,
      isA: Column,
      numPartitions: Int = 0): DataFrame = {
    val u = mannWhitneyU(df, valueCol, isA, numPartitions)
    val delta = round(lit(2.0d) * col("u1") /
      (col("n1").cast("double") * col("n2")) - lit(1.0d), 6)
    u.select(col("n1"), col("n2"), delta.as("cliffs_delta"),
      when(abs(delta) < lit(0.147d), lit("negligible"))
        .when(abs(delta) < lit(0.33d), lit("small"))
        .when(abs(delta) < lit(0.474d), lit("medium"))
        .otherwise(lit("large")).as("magnitude"))
  }

  /** Winsorized Pearson correlation: both variables clamp to their
    * [pLo, pHi] quantiles before the moment pass — correlation that a
    * handful of whales cannot manufacture (raw Pearson on heavy-tailed
    * pairs is driven by the largest products; clamping bounds every
    * row's influence while keeping the full n, unlike trimming).
    *
    * Parity chain: quantile bounds come from [[Percentiles.exact]]
    * (round-6, the q106 precedent) and convert to micro longs; each
    * value clamps in EXACT micro integers (least/greatest on longs —
    * no float decision); the five moments ride scale-0 DECIMAL(38,0);
    * r is one fixed double tree. Degenerate clamped variance → NULL.
    *
    * Scale shape: one bracketed-selection pass for the four bounds
    * (shared corpus scans), one broadcast of the 1-row bound table,
    * one map-side-combined moment aggregate.
    */
  def winsorizedCorrelation(
      df: DataFrame,
      xCol: String,
      yCol: String,
      pLo: Double = 0.05,
      pHi: Double = 0.95): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi,
      s"need 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    val base = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .withColumn("__one", lit(1))
    def bounds(c: String, tag: String) =
      Percentiles.exact(base, Seq("__one"), c, Seq(pLo, pHi))
        .select((round(element_at(col("pcts"), 1), 6)
          .cast("decimal(18,6)") * 1000000).cast("long").as(s"__lo_$tag"),
          (round(element_at(col("pcts"), 2), 6)
            .cast("decimal(18,6)") * 1000000).cast("long").as(s"__hi_$tag"))
    val bx = bounds(xCol, "x"); val by = bounds(yCol, "y")
    def microCol(c: String) =
      (col(c).cast("decimal(18,2)") * 1000000).cast("long")
    val d19 = "decimal(19,0)"
    val clamped = base.crossJoin(broadcast(bx)).crossJoin(broadcast(by))
      .select(
        greatest(col("__lo_x"), least(col("__hi_x"), microCol(xCol)))
          .as("__x"),
        greatest(col("__lo_y"), least(col("__hi_y"), microCol(yCol)))
          .as("__y"),
        col("__lo_x"), col("__hi_x"), col("__lo_y"), col("__hi_y"))
    val mom = clamped.agg(count(lit(1)).as("__n"),
      sum(col("__x")).cast("decimal(38,0)").as("__sx"),
      sum(col("__y")).cast("decimal(38,0)").as("__sy"),
      sum((col("__x").cast(d19) * col("__x").cast(d19)).cast("decimal(38,0)"))
        .as("__sxx"),
      sum((col("__y").cast(d19) * col("__y").cast(d19)).cast("decimal(38,0)"))
        .as("__syy"),
      sum((col("__x").cast(d19) * col("__y").cast(d19)).cast("decimal(38,0)"))
        .as("__sxy"),
      first(col("__lo_x")).as("__blx"), first(col("__hi_x")).as("__bhx"),
      first(col("__lo_y")).as("__bly"), first(col("__hi_y")).as("__bhy"))
    val nD = col("__n").cast("double")
    def dd(c: String) = col(c).cast("double")
    val num = nD * dd("__sxy") - dd("__sx") * dd("__sy")
    val vx = nD * dd("__sxx") - dd("__sx") * dd("__sx")
    val vy = nD * dd("__syy") - dd("__sy") * dd("__sy")
    mom.select(col("__n").cast("long").as("n"),
      (col("__blx").cast("double") / lit(1000000.0d)).as("x_lo"),
      (col("__bhx").cast("double") / lit(1000000.0d)).as("x_hi"),
      (col("__bly").cast("double") / lit(1000000.0d)).as("y_lo"),
      (col("__bhy").cast("double") / lit(1000000.0d)).as("y_hi"),
      when(vx > 0 && vy > 0, round(num / sqrt(vx * vy), 6))
        .as("winsorized_r"))
  }

  /** Quantile treatment lift: the per-quantile difference between
    * each arm's EXACT value distribution and a base arm's — where a
    * mean lift says "arm B is +3.2 on average", the quantile lift
    * says WHERE in the distribution the movement lives (tail-only
    * effects, median shifts, compression). Built on
    * [[Percentiles.exact]], so a whale cannot fabricate a lift at
    * any quantile below the one it occupies.
    *
    * Parity: each side's percentiles round-6 (the q106 interpolation
    * device), then the DIFFERENCE is taken in DECIMAL(18,6) — exact —
    * and cast back to double, so no double subtraction ever runs.
    *
    * Scale shape: one bracketed exact-selection pass over all arms
    * together (two corpus scans, every task bounded — the q106
    * machinery), then arm-count-sized joins on the fraction index.
    */
  def quantileLift(
      df: DataFrame,
      armCol: String,
      baseArm: String,
      valueCol: String,
      fractions: Seq[Double],
      accuracy: Int = 100000): DataFrame = {
    require(fractions.nonEmpty, "quantileLift needs at least one fraction")
    val pcts = graft.ops.Percentiles.exact(df, Seq(armCol), valueCol,
      fractions, accuracy)
      .select(col(armCol), posexplode(col("pcts")).as(Seq("__i", "__p")))
      .select(col(armCol), col("__i"),
        round(col("__p"), 6).cast("decimal(18,6)").as("__p6"))
    val fracLits = array(fractions.map(lit): _*)
    val base = pcts.filter(col(armCol) === baseArm)
      .select(col("__i"), col("__p6").as("__b6"))
    pcts.filter(col(armCol) =!= baseArm)
      .join(broadcast(base), "__i")
      .select(col(armCol).as("arm"),
        element_at(fracLits, col("__i") + 1).as("fraction"),
        col("__b6").cast("double").as("base_pct"),
        col("__p6").cast("double").as("arm_pct"),
        (col("__p6") - col("__b6")).cast("double").as("lift"))
  }
}
