package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Concentration / inequality measurement: the Gini coefficient of an
  * integral quantity within each stratum — "is this source's token
  * mass spread across its documents or concentrated in a few giants?"
  * (corpus-curation skew reporting; the same statistic data teams run
  * over per-key event counts to spot hub users before a shuffle).
  *
  * Computed from the sorted-rank identity
  *   G = (2·Σᵢ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx),  x ascending, i = 1..n —
  * tied values contribute identically under any tie order, so the
  * unique (value, id) rank keeps the sums deterministic.
  *
  * Scale shape: ranks ride [[Rank.stratifiedRank]] (ONE range shuffle,
  * partition-local scans + a P×S-row broadcast prefix — never
  * one-task-per-stratum), then a stratum-keyed map-side-combined
  * aggregate. Both Σ run as exact DECIMAL(38,0) (rank·value products
  * as DECIMAL(19,0)², order-independent across 1000 executors); the
  * closing Gini arithmetic is a fixed left-associated IEEE double
  * tree, so the statistic hash-matches across engines.
  */
object Concentration {

  /** Per-stratum `(stratum…, n, total, gini)` of `valueCol` (an
    * integral non-negative column; `idCol` breaks rank ties).
    * Single-row strata return gini 0 when the value is its own total
    * (the identity degenerates to 0/Σx · Σx terms cancelling);
    * all-zero strata yield a 0/0 → NaN, surfaced as-is.
    */
  def gini(
      df: DataFrame,
      stratumCol: String,
      valueCol: String,
      idCol: String): DataFrame = {
    val ranked = Rank.stratifiedRank(
      df.select(col(stratumCol), col(valueCol), col(idCol)),
      stratumCol, Seq(valueCol, idCol))
    val dec = "decimal(19,0)"
    val s0 = sum(col(valueCol).cast(dec)).as("__s0")
    val s1 = sum(col("rk").cast(dec) * col(valueCol).cast(dec)).as("__s1")
    ranked.groupBy(stratumCol)
      .agg(count(lit(1)).cast("long").as("n"), s0, s1)
      .select(col(stratumCol), col("n"),
        col("__s0").cast("long").as("total"),
        ((lit(2.0) * col("__s1").cast("double")
          - (col("n") + lit(1L)).cast("double") * col("__s0").cast("double"))
          / (col("n").cast("double") * col("__s0").cast("double")))
          .as("gini"))
  }
}
