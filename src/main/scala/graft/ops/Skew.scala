package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities: explicit salting for when AQE's runtime
  * skew-join split is not available (aggregations, non-sort-merge
  * joins, stateful streaming) or when the skew is known up front.
  *
  * All salts are DETERMINISTIC (derived by hashing stable columns) so
  * results are reproducible and retryable tasks stay idempotent —
  * never `rand()` in a salt.
  */
object Skew {

  /** Two-phase aggregation over skewed keys: groupBy(keys + salt)
    * partial, then groupBy(keys) final. Works for any algebraic
    * aggregate expressed as (partial, merge) column pairs.
    *
    * Example — count and decimal sum per skewed key:
    * {{{
    * saltedAgg(df, Seq("k"), 16,
    *   partial = Seq(count(lit(1)).as("c"), sum($"v").as("s")),
    *   merge   = Seq(sum($"c").cast("long").as("c"), sum($"s").as("s")))
    * }}}
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      saltBuckets: Int,
      partial: Seq[Column],
      merge: Seq[Column],
      saltSource: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(saltSource: _*), lit(saltBuckets.toLong)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Skewed big⋈small join by salt replication: the big side gets a
    * deterministic salt in [0, n); the small side is replicated n times
    * (explode over the salt range) so every salted key finds its match.
    * Join key becomes (key, salt) — the hot key's rows spread over n
    * tasks. Use when the small side is broadcast-sized but the big
    * side's key histogram is too skewed for a plain shuffle join.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltBuckets: Int,
      bigSaltSource: Seq[Column]): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(bigSaltSource: _*), lit(saltBuckets.toLong)))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Heavy-hitter diagnosis for a join/aggregation key: the top-K
    * keys by row count with each key's share and cumulative share of
    * the corpus — the report run BEFORE picking a skew mitigation
    * (a 40%-share key wants [[saltedJoin]]; a long flat tail wants
    * nothing). Exact, unlike the CMS sketch (q73), because the
    * decision is about the head and the head is K-bounded.
    *
    * Scale shape: one map-side-combined count keyed by the key
    * (distinct-key-sized), one 1-row total broadcast, distributed
    * TakeOrdered for the top K; the rank/cumulative window runs on
    * the K-row result only (K-bounded by construction — the
    * single-partition window warning does not apply to a 20-row
    * relation). Shares divide exact cumulative LONG counts once, so
    * the doubles are single IEEE ops.
    */
  def heavyHitterReport(
      df: DataFrame,
      keyCol: String,
      topK: Int = 20): DataFrame = {
    require(topK >= 1 && topK <= 100000,
      s"graft: topK must be in [1, 1e5], got $topK")
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__tot"))
    val top = counts.orderBy(col("n").desc, col("key")).limit(topK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("key"))
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("__cum", sum(col("n")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
      .select(col("key"), col("n").cast("long").as("n"), col("rank"),
        (col("n").cast("double") / col("__tot").cast("double")).as("share"),
        (col("__cum").cast("double") / col("__tot").cast("double"))
          .as("cum_share"))
  }
}
