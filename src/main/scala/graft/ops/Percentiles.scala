package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT interpolated percentiles (SQL `percentile` /
  * DuckDB `quantile_cont` semantics) without the single-reducer merge.
  *
  * Spark's builtin exact `percentile` merges every partition's
  * value→count map on ONE reducer; the buffer is bounded by the number
  * of DISTINCT values, so a high-cardinality column at 100 TB
  * concentrates a multi-GB object buffer in one task. This operator
  * keeps the exact interpolated answer but distributes the selection:
  *
  *  pass 1  — per group: `count(v)` plus `approx_percentile` brackets
  *            around every requested boundary (one summary of size
  *            O(accuracy), merged tree-wise with partial aggregation);
  *  pass 2  — per group: exact `count(v < lo_i)` for each boundary
  *            (conditional sums, map-side combined — tiny output);
  *  pass 3  — rows are filtered to the union of the brackets (≤
  *            ~8·n/accuracy ranks per boundary), exploded per matching
  *            boundary, reduced to DISTINCT (group, boundary, value)
  *            counts (map-side combined), and a cumulative window over
  *            those few distinct values pins the exact floor/ceil rank
  *            values for the interpolation.
  *
  * Every shuffle input is either O(groups × accuracy) (pass 1 partials),
  * O(groups × boundaries) (pass 2 partials), or O(n/accuracy · boundaries)
  * (pass 3 bracket rows) — nothing corpus-proportional ever lands on a
  * single task. At n = 10^11 rows and the default accuracy 10^5 a
  * bracket is ≤ ~8·10^6 ranks; size `accuracy ≈ n / 10^4` to keep the
  * per-boundary window partition bounded.
  *
  * The interpolation replicates Spark's `Percentile.getPercentile`
  * exactly — position `= (n-1)·p`, the `floor == ceil` and
  * `lowerKey == higherKey` shortcuts, and the
  * `(higher-pos)·lower + (pos-lower)·higher` formula — so results are
  * bit-identical to the builtin (PercentilesSpec pins this
  * property-style), and the DuckDB `quantile_cont` hash-match carries
  * over unchanged.
  *
  * Bracket safety: `approx_percentile` at relative error ε = 1/accuracy
  * returns a value whose true rank is within ε·n of the target, so
  * querying at p ± 4ε brackets both interpolation ranks with ≥ 2ε·n
  * ranks of slack. A bracket miss (only possible if the summary's
  * error contract were violated) fails fast with `raise_error` rather
  * than returning a silent null.
  *
  * Reference behavior: goto/optimus-any2any computes quantiles through
  * its warehouse SQL passthrough (quantile_cont); this is the engine-
  * native scale path for the same semantics.
  */
object Percentiles {

  /** Exact per-group percentiles of `valueCol` (read as double) at
    * `fractions`. Returns one row per group: the group columns,
    * `n` (long, non-null count) and `pcts` (array<double> aligned with
    * `fractions`). Groups are the rows of `df.select(groupCols)`;
    * pass an empty `groupCols` for a global result (one row).
    *
    * `accuracy` is the `approx_percentile` accuracy for the bracketing
    * pass — bracket width scales as ~8·n/accuracy ranks.
    */
  def exact(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      fractions: Seq[Double],
      accuracy: Int = 100000,
      persistBase: Boolean = false): DataFrame =
    exactImpl(df, groupCols, valueCol, fractions, accuracy,
      tenths = false, persistBase = persistBase)

  /** [[exact]] restricted to INTEGER-valued columns and fractions that
    * are multiples of 0.1 — and in exchange ENGINE-BUILD-PROOF: the
    * interpolation position k·(n−1)/10 and the interpolated value
    * ((10−d)·vlo + d·vhi)/10 are computed in exact integer arithmetic
    * (one final long→double cast and /10, both correctly rounded and
    * identical everywhere), so the output never depends on double
    * formula order. The plain [[exact]] replicates Spark's
    * `(higher−pos)·vlo + (pos−lower)·vhi` while DuckDB interpolates
    * `vlo + frac·(vhi−vlo)` — one ulp apart in general, absorbed by
    * round-6 emission at O(1..10⁵) magnitudes (q106/q175), but RAW
    * large-magnitude outputs (integer microseconds, q163) have no safe
    * rounding scale and need this integer form. Oracle twin: pick the
    * values at ranks ⌊k(n−1)/10⌋+1 and +2 via ROW_NUMBER and apply the
    * same integer formula (see q163's oracle).
    */
  def exactTenths(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      fractions: Seq[Double],
      accuracy: Int = 100000,
      persistBase: Boolean = false): DataFrame = {
    require(fractions.forall(p =>
      math.abs(p * 10 - math.round(p * 10)) < 1e-9),
      s"graft: exactTenths needs multiples of 0.1, got $fractions")
    exactImpl(df, groupCols, valueCol, fractions, accuracy,
      tenths = true, persistBase = persistBase)
  }

  private def exactImpl(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      fractions: Seq[Double],
      accuracy: Int,
      tenths: Boolean,
      persistBase: Boolean): DataFrame = {
    require(fractions.nonEmpty, "graft: at least one fraction")
    require(fractions.forall(p => p >= 0.0 && p <= 1.0),
      s"graft: fractions must be in [0,1]: $fractions")
    require(accuracy >= 100, s"graft: accuracy too small: $accuracy")

    val gs = groupCols.map(col)
    // the empty-group case still needs a groupBy key for the window
    // partitioning; a constant key keeps one code path
    val gkeys = if (groupCols.nonEmpty) groupCols else Seq("__g")
    // r18: `persistBase = true` materializes the slim projection once
    // for the device's three selection passes, via the
    // registerPersisted queue (spearman/gram-table contract). Measured
    // rule for the default: over a CHEAP narrow scan the persist is a
    // small loss (cache write + read-back ≥ three re-scans — q158
    // 3.92 s base vs 4.05 s persisted, q175 1.53 vs 2.22, min-of-3
    // interleaved), so it stays OFF; callers whose upstream is
    // expensive to recompute (a multi-table join, another device's
    // output) opt in — q106's 3-table join went 3.04 s → 1.68 s.
    val base0 =
      df.select(gs :+ col(valueCol).cast("double").as("__v"): _*)
        .filter(col("__v").isNotNull)
    val base1 =
      if (persistBase) graft.ops.Robust.registerPersisted(base0) else base0
    val base = if (groupCols.nonEmpty) base1 else base1.withColumn("__g", lit(0))

    val eps = 1.0 / accuracy
    val margin = 4 * eps
    val k = fractions.length
    // bracket fractions: [lo_0, hi_0, lo_1, hi_1, ...], clamped
    val brFracs = fractions.flatMap { p =>
      Seq(math.max(0.0, p - margin), math.min(1.0, p + margin))
    }
    val brSql = brFracs.map(f => s"${f}d").mkString("array(", ", ", ")")

    // pass 1: count + approx brackets, one summary per group
    // a group needs ~3·margin·n ≥ 1+p ranks of slack for the bracket
    // guarantee to hold; below n = accuracy the group is small enough
    // that the exact pass-3 selection can just take ALL of its values
    // (full-range bracket) — the two regimes switch per group at runtime
    val small = col("__n") < lit(accuracy.toLong)
    val pass1 = base.groupBy(gkeys.map(col): _*)
      .agg(count(col("__v")).as("__n"),
        expr(s"approx_percentile(__v, $brSql, $accuracy)").as("__br"))
      .select(gkeys.map(col) ++ Seq(col("__n")) ++ (0 until k).flatMap { i =>
        Seq(when(small, lit(Double.NegativeInfinity))
          .otherwise(element_at(col("__br"), 2 * i + 1)).as(s"__lo$i"),
          when(small, lit(Double.PositiveInfinity))
            .otherwise(element_at(col("__br"), 2 * i + 2)).as(s"__hi$i"))
      }: _*)
      // r19: DISTINCT brackets per group — in the small-group regime
      // every boundary's bracket is the same full range, so the old
      // per-boundary explode duplicated EVERY group row k times into
      // the pass-3 shuffle (q205: 7 octiles over sub-accuracy groups
      // shuffled 31 MB for a 4.4 MB base; guide §2.3 "shuffle fewer
      // bytes"). Ranking once per distinct bracket and letting the
      // (broadcast) targets join fan the ≤2 picked rows back out per
      // boundary leaves large-regime plans unchanged (distinct
      // brackets) and makes the small regime shuffle each row once.
      .withColumn("__brs", array_distinct(array((0 until k).map(i =>
        struct(col(s"__lo$i").as("__bl"), col(s"__hi$i").as("__bh"))): _*)))
      // flat per-DISTINCT-bracket bounds (null-padded past the deduped
      // array's end), derived once per GROUP row here so the per-row
      // pass-3 bracket test below stays k comparisons over flat double
      // columns — walking the struct array per corpus row instead
      // measured +10% warm and +2 s cold (codegen size) on q147's
      // large-regime pass
      .select(col("*") +: (1 to k).flatMap { b =>
        val bs = get(col("__brs"), lit(b - 1))
        Seq(bs.getField("__bl").as(s"__dlo$b"),
          bs.getField("__bh").as(s"__dhi$b"))
      }: _*)

    // pass 2: exact counts strictly below each bracket's lower bound
    val withBr = base.join(broadcast(pass1), gkeys)
    val pass2 = withBr.groupBy(gkeys.map(col): _*)
      .agg((0 until k).map { i =>
        sum(when(col("__v") < col(s"__lo$i"), 1L).otherwise(0L))
          .as(s"__clo$i")
      }.head, (1 until k).map { i =>
        sum(when(col("__v") < col(s"__lo$i"), 1L).otherwise(0L))
          .as(s"__clo$i")
      }: _*)

    // per-(group, boundary) interpolation targets — tiny, broadcast back.
    // tenths mode derives position/floor/ceil from the INTEGER
    // P = k·(n−1) (d = P mod 10) instead of the double p·(n−1), so the
    // selected ranks and the interpolation weights are engine-exact
    val targets = pass1.join(pass2, gkeys)
      .select(gkeys.map(col) ++ Seq(col("__n")) ++ (0 until k).map { i =>
        val posP =
          if (tenths) lit(math.round(fractions(i) * 10)) * (col("__n") - 1)
          else lit(0L)
        struct(lit(i).as("__i"),
          (lit(fractions(i)) * (col("__n") - 1).cast("double")).as("__pos"),
          posP.cast("long").as("__posP"),
          col(s"__lo$i").as("__lo"), col(s"__hi$i").as("__hi"),
          col(s"__clo$i").as("__clo"),
          // which DISTINCT bracket this boundary ranks within (r19)
          array_position(col("__brs"),
            struct(col(s"__lo$i").as("__bl"), col(s"__hi$i").as("__bh")))
            .as("__bpos"))
          .as(s"__t$i")
      }: _*)
      .select(gkeys.map(col) ++ Seq(col("__n"),
        explode(array((0 until k).map(i => col(s"__t$i")): _*)).as("__t")): _*)
      .select(gkeys.map(col) ++ Seq(col("__n"), col("__t.__i").as("__i"),
        col("__t.__bpos").as("__b"),
        col("__t.__pos").as("__pos"),
        (if (tenths)
          ((col("__t.__posP") - pmod(col("__t.__posP"), lit(10L))) / 10)
            .cast("long")
        else floor(col("__t.__pos")).cast("long")).as("__lower"),
        (if (tenths)
          (((col("__t.__posP") - pmod(col("__t.__posP"), lit(10L))) / 10)
            .cast("long") +
            when(pmod(col("__t.__posP"), lit(10L)) > 0, 1L).otherwise(0L))
        else ceil(col("__t.__pos")).cast("long")).as("__higher"),
        (if (tenths) pmod(col("__t.__posP"), lit(10L)).cast("long")
        else lit(0L)).as("__d"),
        col("__t.__lo").as("__lo"), col("__t.__hi").as("__hi"),
        col("__t.__clo").as("__clo")): _*)

    // pass 3: bracket rows only → distinct (group, BRACKET, value)
    // counts → cumulative ranks → the two interpolation values.
    // r19: rows explode into the DISTINCT brackets (__brs) instead of
    // one copy per boundary — in the small-group regime all k
    // boundaries share the full-range bracket, so this shuffles each
    // row once instead of k times; the (broadcast) targets join below
    // fans each bracket's ranked values back out to its boundaries and
    // the pick filter keeps ≤ 2 rows per boundary, so nothing
    // boundary-multiplied ever hits a shuffle.
    // the per-row bracket test is UNROLLED over the static boundary
    // count (a `transform` lambda is CodegenFallback and fenced the
    // scan stage into interpreted evaluation — measured +13% on
    // q147's 600k-row large-regime pass in the same-window A/B) and
    // reads the FLAT per-bracket bound columns, so per-row work is
    // exactly the old shape's k flat-double comparisons; null bounds
    // (past the deduped bracket list) compare to null → never emit
    val bracketRows = withBr
      .select(gkeys.map(col) ++ Seq(col("__v"),
        explode(filter(array((1 to k).map { b =>
          when(col("__v") >= col(s"__dlo$b") &&
            col("__v") <= col(s"__dhi$b"), lit(b.toLong))
        }: _*), x => x.isNotNull)).as("__b")): _*)
    val distincts = bracketRows
      .groupBy(gkeys.map(col) :+ col("__b") :+ col("__v"): _*)
      .agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(gkeys.map(col) :+ col("__b"): _*)
      .orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = distincts
      .withColumn("__cumEnd", sum(col("__c")).over(wCum))
      .join(broadcast(targets), gkeys :+ "__b")
      .withColumn("__start", col("__clo") + col("__cumEnd") - col("__c"))
      .withColumn("__end", col("__clo") + col("__cumEnd"))
      // keep only the two interpolation picks per boundary — the
      // boundary fan-out from the bracket join never materializes
      .filter((col("__start") <= col("__lower") &&
          col("__lower") < col("__end")) ||
        (col("__start") <= col("__higher") &&
          col("__higher") < col("__end")))

    val picked = ranked.groupBy(gkeys.map(col) :+ col("__i"): _*)
      .agg(first(col("__n")).as("__n"), first(col("__pos")).as("__pos"),
        first(col("__lower")).as("__lower"),
        first(col("__higher")).as("__higher"),
        first(col("__d")).as("__d"),
        max(when(col("__start") <= col("__lower") &&
          col("__lower") < col("__end"), col("__v"))).as("__vlo"),
        max(when(col("__start") <= col("__higher") &&
          col("__higher") < col("__end"), col("__v"))).as("__vhi"))

    // Spark Percentile.getPercentile, replicated branch-for-branch;
    // tenths mode swaps the double formula for the exact integer
    // ((10−d)·vlo + d·vhi)/10 (values must be integer-valued doubles)
    val interp =
      if (tenths)
        ((lit(10L) - col("__d")) * col("__vlo").cast("long") +
          col("__d") * col("__vhi").cast("long")).cast("double") / lit(10.0)
      else
        (col("__higher").cast("double") - col("__pos")) * col("__vlo") +
          (col("__pos") - col("__lower").cast("double")) * col("__vhi")
    val bracketMiss = when(col("__vlo").isNull || col("__vhi").isNull,
      raise_error(concat(lit("graft: percentile bracket miss at i="),
        col("__i").cast("string"), lit(" — increase accuracy")))
        .cast("double"))
    // tenths mode ENFORCES its integer-valued precondition: the exact
    // integer interpolation casts the picked values to long, which
    // would silently truncate a fractional double into a wrong
    // quantile — fail loudly instead (mirrors the bracket-miss raise)
    val guarded =
      if (tenths)
        bracketMiss.when(
          col("__vlo") =!= floor(col("__vlo")).cast("double") ||
            col("__vhi") =!= floor(col("__vhi")).cast("double"),
          raise_error(concat(
            lit("graft: exactTenths requires an INTEGER-valued column; "),
            lit("picked non-integral value (vlo="),
            col("__vlo").cast("string"), lit(", vhi="),
            col("__vhi").cast("string"),
            lit(") — use exact() for fractional data"))).cast("double"))
      else bracketMiss
    val res = guarded
      .when(col("__higher") === col("__lower"), col("__vlo"))
      .when(col("__vhi") === col("__vlo"), col("__vlo"))
      .otherwise(interp)

    val out = picked.select(gkeys.map(col) ++
        Seq(col("__n"), col("__i"), res.as("__res")): _*)
      .groupBy(gkeys.map(col): _*)
      .agg(first(col("__n")).as("n"),
        array_sort(collect_list(struct(col("__i"), col("__res"))))
          .getField("__res").as("pcts"))
      // r19: with the pick filter applied BEFORE the boundary groupBy,
      // a total bracket miss would surface as a MISSING array entry
      // instead of the null-pick raise above — keep the failure loud
      .withColumn("pcts",
        when(size(col("pcts")) === k, col("pcts"))
          .otherwise(raise_error(lit(
            "graft: percentile bracket miss — increase accuracy"))
            .cast("array<double>")))

    if (groupCols.nonEmpty) out else out.drop("__g")
  }

  /** Convenience: one fraction → columns (`group…`, `n`, `pct`). */
  def exactOne(df: DataFrame, groupCols: Seq[String], valueCol: String,
      fraction: Double, accuracy: Int = 100000,
      persistBase: Boolean = false): DataFrame =
    exact(df, groupCols, valueCol, Seq(fraction), accuracy, persistBase)
      .withColumn("pct", element_at(col("pcts"), 1)).drop("pcts")
}
