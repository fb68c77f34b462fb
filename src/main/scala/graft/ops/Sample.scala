package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for corpus assembly. Companion to
  * [[TextOps.mixtureSample]] (rate-based hash-threshold sampling):
  * here the contract is an exact COUNT per stratum — "give me k
  * documents per language, reproducibly" — the balanced-evaluation-set
  * and pilot-corpus primitive.
  */
object Sample {

  /** k rows per stratum, ordered by (md5(id), id) — a deterministic
    * pseudo-random draw that every engine reproduces (hex md5 compares
    * lexicographically everywhere; the id tie-break makes the order
    * total).
    *
    * Scale design: a single `Window.partitionBy(stratum)` ranks whole
    * strata in one task each — with 5 languages over 100 TB that is 5
    * giant partitions. Instead rank twice: per (stratum, input
    * partition) first — narrow, partition-local — keep ≤ k each, so at
    * most k × P tiny survivors per stratum reach the global rank.
    */
  def stratifiedTopK(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    val key = md5(col(idCol).cast("string"))
    val local = df
      .withColumn("__pid", spark_partition_id())
      .withColumn("__rk", row_number().over(
        Window.partitionBy(stratumCol, "__pid").orderBy(key, col(idCol))))
      .filter(col("__rk") <= k)
      .drop("__pid", "__rk")
    local
      .withColumn("rk", row_number().over(
          Window.partitionBy(stratumCol).orderBy(key, col(idCol)))
        .cast("long"))
      .filter(col("rk") <= k)
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-RES):
    * each row draws a deterministic uniform `u` from its id's md5 and
    * gets key `u^(1/w)`; the k largest keys ARE a weighted sample
    * without replacement. Used to bias corpus draws toward high-weight
    * (e.g. longer or higher-quality documents) while staying exactly
    * reproducible.
    *
    * Portability: `u` is built from the first 8 md5 hex digits as
    * exact integer arithmetic (`(v + 0.5) / 2^32` — never 0 or 1), the
    * key rounds to 6 decimals (the round-6 device: `pow` is the only
    * libm call), and ties break on the id, so every engine selects the
    * same k rows.
    *
    * Scale shape: key assignment is map-only over the scan; selection
    * is a distributed TakeOrdered (per-partition top-k, then a k-row
    * driver merge) — no global sort, no shuffle of the corpus.
    */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    val hexv = (1 to 8).map { i =>
      (expr(s"instr('0123456789abcdef', substring(__h, $i, 1))") - 1) *
        lit(1L << (4 * (8 - i)))
    }.reduce(_ + _)
    val w = greatest(col(weightCol).cast("double"), lit(1.0))
    df.withColumn("__h", md5(col(idCol).cast("string")))
      .withColumn("__u", (hexv + lit(0.5)) / lit(4294967296.0))
      .select(col(idCol), col(weightCol).cast("long").as("weight"),
        round(pow(col("__u"), lit(1.0) / w), 6).as("skey"))
      .orderBy(col("skey").desc, col(idCol).asc)
      .limit(k)
  }
}
