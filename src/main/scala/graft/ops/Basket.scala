package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence: which items appear together in the
  * same basket (order, session, document…) often enough to matter —
  * the support-counting core of association-rule mining (Agrawal &
  * Srikant's Apriori counts exactly these pair supports first).
  *
  * Scale shape: baskets dedupe and group in ONE hash shuffle on the
  * basket key; pair generation is a per-basket double-explode bounded
  * by `maxBasket` (baskets are small — a 7-line order yields 21 pairs
  * — and the cap fail-fasts degenerate mega-baskets, e.g. a crawler
  * session with 10⁵ items that would alone emit 5·10⁹ pairs); the
  * pair-support aggregate map-side-combines before its shuffle. No
  * corpus-sized self-join: the classic `t JOIN t USING (basket)` plan
  * shuffles the raw table twice and re-verifies the basket equality
  * row-by-row — the bucket form touches the corpus once.
  */
object Basket {

  /** Pair supports: `(item_a, item_b, n_baskets)` with `item_a <
    * item_b`, for pairs co-occurring in at least `minSupport`
    * baskets. Duplicate (basket, item) rows count once.
    */
  def cooccurrence(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minSupport: Long = 2L,
      maxBasket: Int = 10000): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    require(maxBasket >= 2, s"maxBasket must be >= 2, got $maxBasket")
    val baskets = df
      .groupBy(basketCol)
      .agg(collect_set(col(itemCol)).as("items"))
      .withColumn("items", when(size(col("items")) <= maxBasket, col("items"))
        .otherwise(raise_error(concat(
          lit(s"cooccurrence: basket exceeds $maxBasket items: "),
          col(basketCol).cast("string")))))
      .filter(size(col("items")) >= 2)
    baskets
      .select(explode(col("items")).as("item_a"), col("items"))
      .select(col("item_a"), explode(col("items")).as("item_b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).cast("long").as("n_baskets"))
      .filter(col("n_baskets") >= minSupport)
  }
}
