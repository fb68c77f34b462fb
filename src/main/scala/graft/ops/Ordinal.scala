package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordinal association between two ordered categorical columns —
  * Kendall's tau-b, Goodman–Kruskal gamma and Somers' D (y|x), the
  * monotone-association readouts a curation team reaches for when
  * both variables are graded levels (quality tier vs toxicity bucket,
  * quantity band vs discount step) and Pearson/Spearman over raw
  * values would launder the discreteness.
  *
  * The device: every pair statistic is computable from the
  * CONTINGENCY CELL TABLE alone — concordant pairs
  * C = Σ_{x_a<x_b, y_a<y_b} o_a·o_b, discordant D the mirror, and the
  * tie terms from the marginals — so the corpus is touched ONCE (one
  * groupBy to cells, map-side combined); the O(cells²) pair
  * enumeration runs over the tiny cell table, never the data. With L
  * levels per side the cell table is ≤ L² rows regardless of corpus
  * size — the same "reduce to a bounded summary, then do the
  * quadratic part on the summary" shape as the χ²/Cramér family
  * (CorpusStats.chiSquare).
  *
  * Exactness: pair counts are sums of o_a·o_b products summed in
  * DECIMAL(38,0) (n(n−1)/2 overflows a long past n ≈ 4.3e9 — a 100 TB
  * corpus, so longs are NOT enough). Tie terms stay in DOUBLED units
  * (t(t−1), never /2 — decimal division would mint fractional scales
  * that type differently across engines; the doubled-rank device from
  * Rank.stratifiedPrefixSum). The final statistics cast each integral
  * decimal to double ONCE (exact below 2^53 at oracle scale) and
  * combine with IEEE `+,-,*,/,sqrt` only — portable across engines
  * with the identical association the DuckDB oracle replays.
  */
object Ordinal {

  /** One row: `n, c_pairs, d_pairs, tau_b, gamma, somers_d` for the
    * association of `yCol` on `xCol`. NULL levels on either side are
    * excluded (a NULL carries no order information).
    */
  def association(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = df
      .filter(xCol.isNotNull && yCol.isNotNull)
      .groupBy(xCol.as("x"), yCol.as("y"))
      .agg(count(lit(1)).as("o"))

    // pair classification over cell pairs with a.x < b.x: concordant
    // when the y order agrees, discordant when it reverses; ties on y
    // fall to neither. Each unordered data pair with distinct x lands
    // in exactly one (a, b) cell pair this way.
    val a = cells.select(col("x").as("xa"), col("y").as("ya"), col("o").as("oa"))
    val b = cells.select(col("x").as("xb"), col("y").as("yb"), col("o").as("ob"))
    val cd = a.join(b, col("xa") < col("xb"))
      .select((col("oa").cast(dec) * col("ob").cast(dec)).as("w"),
        (col("ya") < col("yb")).as("conc"),
        (col("ya") > col("yb")).as("disc"))
      .agg(
        coalesce(sum(when(col("conc"), col("w"))), lit(0).cast(dec)).as("c_pairs"),
        coalesce(sum(when(col("disc"), col("w"))), lit(0).cast(dec)).as("d_pairs"))

    // DOUBLED tie terms from the marginals: dn0 = n(n−1) total pairs
    // ×2, dn1 = Σ_x t(t−1) pairs tied on x ×2, dn2 the same on y —
    // two tiny aggregates of the cell table, integral throughout
    def doubledTies(marginal: DataFrame, out: String): DataFrame = marginal
      .agg(coalesce(sum(col("t").cast(dec) * (col("t").cast(dec) - 1)),
        lit(0).cast(dec)).as(out),
        coalesce(sum(col("t").cast(dec)), lit(0).cast(dec)).as(s"__n_$out"))
    val tx = doubledTies(cells.groupBy("x").agg(sum("o").as("t")), "dn1")
      .select(col("dn1"), col("__n_dn1").as("nd"))
    val ty = doubledTies(cells.groupBy("y").agg(sum("o").as("t")), "dn2")
      .select(col("dn2"))

    val cN = col("nd")
    cd.crossJoin(tx).crossJoin(ty)
      .select(col("nd").cast("long").as("n"),
        col("c_pairs"), col("d_pairs"),
        (cN * (cN - 1)).as("dn0"), col("dn1"), col("dn2"))
      .select(col("n"), col("c_pairs"), col("d_pairs"),
        // doubled denominators cancel: tau_b = 2(C−D)/√((dn0−dn1)(dn0−dn2)),
        // somers_d = 2(C−D)/(dn0−dn1); gamma never sees a tie term.
        // Degenerate inputs (constant x → no xa<xb pairs; all-tied
        // y) zero a denominator: guard to NULL like the rest of the
        // Robust family — under ANSI the bare division would throw
        // on 0/0 and DuckDB would emit NaN, diverging either way
        when(col("dn0") > col("dn1") && col("dn0") > col("dn2"),
          round(lit(2.0) * (col("c_pairs").cast("double") - col("d_pairs").cast("double")) /
            sqrt((col("dn0").cast("double") - col("dn1").cast("double")) *
              (col("dn0").cast("double") - col("dn2").cast("double"))), 6))
          .as("tau_b"),
        when(col("c_pairs") + col("d_pairs") > 0,
          round((col("c_pairs").cast("double") - col("d_pairs").cast("double")) /
            (col("c_pairs").cast("double") + col("d_pairs").cast("double")), 6))
          .as("gamma"),
        when(col("dn0") > col("dn1"),
          round(lit(2.0) * (col("c_pairs").cast("double") - col("d_pairs").cast("double")) /
            (col("dn0").cast("double") - col("dn1").cast("double")), 6))
          .as("somers_d"))
  }
}
