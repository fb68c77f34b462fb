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
}
