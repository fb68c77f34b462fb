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

  /** Association rules from pair supports: for every ordered pair
    * `antecedent → consequent` whose UNordered pair support passes
    * `minSupport`, emit
    *
    *   confidence = n_pair / n_ante
    *   lift       = confidence · N / n_cons
    *
    * (Agrawal & Srikant 1994's confidence; lift in the
    * overflow-free factored form — `n_pair·N / (n_ante·n_cons)`
    * would overflow BIGINT once item supports pass ~3·10⁹, the
    * factored form stays in two IEEE double ops and both engines
    * evaluate the identical left-associated tree, so the doubles
    * hash-match bit-for-bit).
    *
    * Scale shape: the corpus crosses (a) the basket shuffle inside
    * [[cooccurrence]] and (b) one item-keyed map-side-combined
    * support aggregate; N is a 1-row broadcast. The rule relation
    * (≤ 2·|pairs| rows) joins the item-support relation twice on the
    * item key — item supports are vocabulary-sized, never
    * corpus-sized. At production scale persist the deduped
    * (basket, item) relation so the two aggregates share one scan.
    */
  def associationRules(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minSupport: Long = 2L,
      minConfidence: Double = 0.0,
      maxBasket: Int = 10000): DataFrame = {
    require(minConfidence >= 0.0 && minConfidence <= 1.0,
      s"minConfidence must be in [0,1], got $minConfidence")
    val d = df.select(col(basketCol).as("b"), col(itemCol).as("i")).distinct()
    val pairs = cooccurrence(df, basketCol, itemCol, minSupport, maxBasket)
    val isup = d.groupBy("i").agg(count(lit(1)).cast("long").as("ni"))
    val total = d.agg(count_distinct(col("b")).cast("long").as("n_total"))
    val rules = pairs
      .select(col("item_a").as("antecedent"), col("item_b").as("consequent"),
        col("n_baskets").as("n_pair"))
      .unionAll(pairs.select(col("item_b").as("antecedent"),
        col("item_a").as("consequent"), col("n_baskets").as("n_pair")))
    val conf = col("n_pair").cast("double") / col("n_ante").cast("double")
    rules
      .join(isup.select(col("i").as("antecedent"), col("ni").as("n_ante")),
        Seq("antecedent"))
      .join(isup.select(col("i").as("consequent"), col("ni").as("n_cons")),
        Seq("consequent"))
      .crossJoin(broadcast(total))
      .withColumn("confidence", conf)
      .withColumn("lift", col("confidence") * col("n_total").cast("double") /
        col("n_cons").cast("double"))
      .filter(col("confidence") >= minConfidence)
      .select("antecedent", "consequent", "n_pair", "n_ante", "n_cons",
        "confidence", "lift")
  }
}
