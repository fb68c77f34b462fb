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

  /** Neyman (optimal) allocation of a fixed sample budget across
    * strata: n_h ∝ N_h·s_h — big AND noisy strata get the samples,
    * because that is where each extra observation buys the most
    * variance reduction in the stratified estimator (Neyman 1934).
    * The design step a survey-grade corpus audit runs BEFORE drawing
    * with [[stratifiedTopK]]; proportional allocation (∝ N_h alone)
    * oversamples big homogeneous strata.
    *
    * Integerization is largest-remainder (Hamilton): floor every
    * real allocation, then hand the leftover budget to the largest
    * fractional remainders (ties → stratum order) — total is exactly
    * `totalN` by construction. Zero-variance strata get weight 0
    * (one row tells you everything about a constant stratum).
    *
    * Parity chain: per-stratum moments are exact integer cents
    * (the anovaF shape); s_h = one fixed double expression + a
    * correctly-rounded √, rounded 6; weights round-6 and sum as
    * DECIMAL (never a raw double sum across strata); the
    * floor/remainder arithmetic happens in exact micro-unit longs,
    * so the integer allocations are engine-identical. Window over
    * the STRATA table only (bounded).
    */
  def neymanAllocation(
      df: DataFrame,
      stratumCol: String,
      valueCol: String,
      totalN: Long): DataFrame = {
    require(totalN >= 1, s"totalN must be >= 1, got $totalN")
    val v = (col(valueCol).cast("decimal(18,2)") * 100).cast("long")
    val byS = df.filter(col(valueCol).isNotNull && col(stratumCol).isNotNull)
      .select(col(stratumCol), v.as("__c"))
      .groupBy(col(stratumCol))
      .agg(count(lit(1)).as("__ng"),
        sum(col("__c")).cast("decimal(38,0)").as("__s1"),
        sum((col("__c") * col("__c")).cast("decimal(38,0)")).as("__s2"))
    val nD = col("__ng").cast("double")
    // sample std dev in VALUE units: s² = (n·S2 − S1²)/(n(n−1)) / 100²
    val varNum = nD * col("__s2").cast("double") -
      col("__s1").cast("double") * col("__s1").cast("double")
    val sh = when(col("__ng") > 1 && varNum > lit(0.0d),
      round(sqrt(varNum / (nD * (nD - lit(1.0d)))) / lit(100.0d), 6))
      .otherwise(lit(0.0d))
    val weighted = byS.select(col(stratumCol), col("__ng"), sh.as("__sh"),
      round(nD * sh, 6).as("__w"))
    val wTot = weighted.agg(
      sum(col("__w").cast("decimal(28,6)")).as("__wt"))
    // exact micro-unit largest-remainder: a_micro = totalN·w_h·10⁶ div
    // W_tot, all in DECIMAL(38,0) integers (the product overflows a
    // long: totalN × w_micro × 10⁶ can pass 10²⁵); floor = a div 10⁶;
    // leftover goes to the biggest remainders — engine-identical
    // integer comparisons throughout
    val micro = weighted.crossJoin(broadcast(wTot))
      .select(col(stratumCol), col("__ng"), col("__sh"), col("__w"),
        when(col("__wt") > 0,
          expr(s"cast((cast($totalN as decimal(38,0)) * " +
            "cast(__w * 1000000 as decimal(38,0)) * 1000000) div " +
            "cast(__wt * 1000000 as decimal(38,0)) as long)"))
          .otherwise(lit(0L)).as("__am"))
    val wRk = Window.orderBy(
      (col("__am") % 1000000L).desc, col(stratumCol).asc)
    val floored = micro
      .withColumn("__fl", expr("__am div 1000000L"))
    val leftover = floored.agg(sum(col("__fl")).cast("long").as("__used"))
    floored.crossJoin(broadcast(leftover))
      .withColumn("__rk", row_number().over(wRk))
      .select(col(stratumCol),
        col("__ng").cast("long").as("n_rows"),
        col("__sh").as("s_h"),
        col("__w").as("weight"),
        (col("__fl") + when(col("__rk") <= lit(totalN) - col("__used"), 1L)
          .otherwise(0L)).as("n_alloc"))
      .orderBy(stratumCol)
  }
}
