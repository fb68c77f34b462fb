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
}
