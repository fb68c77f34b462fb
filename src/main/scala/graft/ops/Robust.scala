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
  * stats back onto the scan. The corpus is read twice (med, then
  * MAD over |v − med|) — at production scale persist the projected
  * (group, value) relation so both passes share one materialization.
  *
  * Reference behavior: the reference pushes outlier predicates to the
  * warehouse as SQL text (ext/maxcompute/source.go:135-247); this is
  * the corresponding native plan.
  */
object Robust {

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
      accuracy: Int = 100000): DataFrame = {
    require(k > 0.0, s"graft: k must be positive, got $k")
    val meds = Percentiles.exactOne(df, groupCols, valueCol, 0.5, accuracy)
      .select(groupCols.map(col) :+ col("pct").as("med"): _*)
    val withMed = df.join(broadcast(meds), groupCols)
      .withColumn("__dev", abs(col(valueCol).cast("double") - col("med")))
    val mads = Percentiles.exactOne(withMed, groupCols, "__dev", 0.5, accuracy)
      .select(groupCols.map(col) :+ col("pct").as("mad"): _*)
    withMed.join(broadcast(mads), groupCols)
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
}
