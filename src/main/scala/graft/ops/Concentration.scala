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

  /** The Lorenz curve behind [[gini]]'s scalar, at `buckets`-ile
    * resolution: rows sorted ascending by value are cut into equal-
    * population buckets by EXACT integer rank arithmetic
    * (`(rk−1)·buckets div n` — never a float boundary), and each row
    * reports the cumulative population and value shares at the
    * bucket's upper edge. "The bottom 50% of orders carry 21% of
    * revenue" is this table read directly; Gini is twice the area
    * above it.
    *
    * Values are taken in integer cents (the q202 device), so bucket
    * sums and both cumulatives stay exact integers on every engine;
    * only the two closing share divisions are doubles, rounded 6.
    *
    * Scale shape: ranks ride [[Rank.stratifiedRank]] (one range
    * shuffle); bucket sums are a map-side-combined aggregate to the
    * strata×buckets table; the cumulative window runs on that tiny
    * table, never the corpus.
    */
  def lorenzDeciles(
      df: DataFrame,
      stratumCol: String,
      valueCol: String,
      idCol: String,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(stratumCol),
        (col(valueCol).cast("decimal(18,2)") * 100).cast("long").as("__c"),
        col(idCol))
    val ranked = Rank.stratifiedRank(base, stratumCol, Seq("__c", idCol))
    val byB = ranked
      .withColumn("__b",
        expr(s"(rk - 1L) * ${buckets}L div n_stratum").cast("long"))
      .groupBy(col(stratumCol), col("__b"))
      .agg(count(lit(1)).as("__bn"),
        sum(col("__c")).cast("decimal(28,0)").as("__bt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol).orderBy("__b")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val tot = byB.groupBy(stratumCol)
      .agg(sum(col("__bn")).as("__n"),
        sum(col("__bt")).cast("decimal(38,0)").as("__s"))
    byB
      .withColumn("__cn", sum(col("__bn")).over(w))
      .withColumn("__ct", sum(col("__bt")).over(w).cast("decimal(38,0)"))
      .join(broadcast(tot), Seq(stratumCol))
      .select(col(stratumCol), col("__b").as("bucket"),
        col("__bn").cast("long").as("n"),
        round(col("__cn").cast("double") / col("__n").cast("double"), 6)
          .as("cum_pop_share"),
        round(col("__ct").cast("double") / col("__s").cast("double"), 6)
          .as("cum_value_share"))
  }
}
