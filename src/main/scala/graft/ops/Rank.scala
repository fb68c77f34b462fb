package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-stratum rank and quantile bucketing WITHOUT
  * single-partition windows — the device CCNet-style quality
  * bucketing needs: "keep the best X% of each language" requires every
  * document's exact rank inside its language, and a naive
  * `Window.partitionBy(lang).orderBy(score)` drags each whole language
  * into one task (a 100 TB English split = one executor).
  *
  * Two-phase shape (generalizes [[Pack.tokenOffsets]] per stratum):
  *
  *   1. deterministic ordered bucketing by (stratum, order...) —
  *      [[Prefix.bucketed]]: boundary LITERALS frozen at build time,
  *      `__bkt` a pure data column, ONE hash exchange; strata free to
  *      span buckets;
  *   2. bucket-local ranks per (bucket, stratum) — a declarative
  *      window over the already-`__bkt`-partitioned child (hash on a
  *      subset of the clustering keys satisfies the window's
  *      distribution, so NO second corpus exchange — PlanSpec pins
  *      exactly one); parallelism B×S, never one-task-per-stratum;
  *   3. (bucket × stratum) count table — at most B·S tiny rows,
  *      aggregated map-side. Because `__bkt` is a deterministic
  *      function of row VALUES (not of a physical execution), the
  *      row side and the count side agree even if the exchange is
  *      executed twice — rounds 10/11 had to pin this alignment via
  *      ReuseExchange (silently wrong over cached inputs) and then
  *      `localCheckpoint` (lineage loss + a corpus-sized
  *      materialize+read); now it holds by construction — prefix-
  *      scanned per stratum and broadcast back.
  *
  * Only the count table crosses a partition boundary twice; the corpus
  * itself sees one hash exchange, and PlanSpec pins exactly that.
  * Order columns must make the rank deterministic (include a unique id
  * as the last key).
  */
object Rank {

  private def parts(df: DataFrame, numPartitions: Int): Int =
    if (numPartitions > 0) numPartitions
    else df.sparkSession.sessionState.conf.numShufflePartitions

  /** Adds `rk` (1-based ascending rank of `orderCols` within
    * `stratumCol`) and `n_stratum` (stratum row count).
    */
  def stratifiedRank(
      df: DataFrame,
      stratumCol: String,
      orderCols: Seq[String],
      numPartitions: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "stratifiedRank needs at least one order column")
    val keys = (stratumCol +: orderCols).map(col)
    val np = parts(df, numPartitions)
    val out = Prefix.device(df, keys, np, stratumFields = 1) match {
      case Prefix.Complete(model) =>
        // small-table fast path: the boundary sample WAS the whole
        // table — rank and stratum size are map-side kernel lookups,
        // no repartition/window/side-join (see Prefix.Device)
        df.withColumn("rk", Prefix.lookup(keys, model, 0))
          .withColumn("n_stratum", Prefix.lookup(keys, model, 1))
      case Prefix.Buckets(withB) =>
        stratifiedRankBucketed(withB, stratumCol, orderCols, np)
    }
    // stable contract regardless of path: input columns in input
    // order, then the two appended columns (the bucketed join would
    // otherwise reorder the join keys first)
    out.select(df.columns.map(col) ++ Seq(col("rk"), col("n_stratum")): _*)
  }

  private def stratifiedRankBucketed(
      withB: DataFrame,
      stratumCol: String,
      orderCols: Seq[String],
      np: Int): DataFrame = {
    val ranged = withB.repartition(np, col("__bkt"))
    // bucket-local exclusive row counts per stratum — window over the
    // existing __bkt partitioning, no second corpus exchange
    val w = Window.partitionBy(col("__bkt"), col(stratumCol))
      .orderBy(orderCols.map(col): _*)
    val local = ranged
      .withColumn("__local", row_number().over(w).cast("long") - lit(1L))
    // B×S-row side table off the UNSHUFFLED frame: partials combine
    // map-side, so only B×S rows cross the wire — and because __bkt
    // is a deterministic data column, this independent subtree agrees
    // with the row side on every row's bucket (no pinning needed)
    val counts = withB.groupBy(col("__bkt"), col(stratumCol))
      .agg(count(lit(1)).as("__cnt"))
    val wPrefix = Window.partitionBy(stratumCol).orderBy("__bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val side = counts
      .withColumn("__prefix", coalesce(sum("__cnt").over(wPrefix), lit(0L)))
      .withColumn("__n", sum("__cnt").over(Window.partitionBy(stratumCol)))
      .select(col("__bkt"), col(stratumCol), col("__prefix"), col("__n"))
    local.join(broadcast(side), Seq("__bkt", stratumCol))
      .withColumn("rk", (col("__local") + lit(1L) + col("__prefix")).cast("long"))
      .withColumn("n_stratum", col("__n").cast("long"))
      .drop("__bkt", "__local", "__prefix", "__n")
  }

  /** Per-stratum EXCLUSIVE running sum of `valCol` in `orderCols`
    * order — the same two-phase shape as [[stratifiedRank]] with sums
    * in place of counts. Adds `prefix` (sum of `valCol` over all
    * earlier rows of the stratum); a NULL value yields a NULL `prefix`
    * and does not advance the total. The building block for
    * token-budget corpus assembly: "take documents until N tokens per
    * language" is `prefix < N` on a deterministic order.
    */
  def stratifiedPrefixSum(
      df: DataFrame,
      stratumCol: String,
      orderCols: Seq[String],
      valCol: String,
      numPartitions: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "stratifiedPrefixSum needs at least one order column")
    val keys = (stratumCol +: orderCols).map(col)
    val np = parts(df, numPartitions)
    val out = Prefix.device(df, keys, np, stratumFields = 1,
      valCol = Some(col(valCol))) match {
      case Prefix.Complete(model) =>
        // small-table fast path: the complete model carries the
        // per-key exclusive running sums (null value → null prefix,
        // Math.addExact mirrors ANSI overflow)
        df.withColumn("prefix", Prefix.lookup(keys, model, 2))
      case Prefix.Buckets(withB) =>
        stratifiedPrefixSumBucketed(withB, stratumCol, orderCols,
          valCol, np)
    }
    // stable contract regardless of path: input columns in input
    // order, then the appended column
    out.select(df.columns.map(col) :+ col("prefix"): _*)
  }

  private def stratifiedPrefixSumBucketed(
      withB: DataFrame,
      stratumCol: String,
      orderCols: Seq[String],
      valCol: String,
      np: Int): DataFrame = {
    val ranged = withB.repartition(np, col("__bkt"))
    val w = Window.partitionBy(col("__bkt"), col(stratumCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = ranged.withColumn("__local",
      when(col(valCol).isNull, lit(null).cast("long"))
        .otherwise(coalesce(sum(col(valCol).cast("long")).over(w), lit(0L))))
    // per-(bucket, stratum) totals off the UNSHUFFLED frame — map-side
    // partial agg, only B×S partials cross the wire
    val totals = withB.groupBy(col("__bkt"), col(stratumCol))
      .agg(sum(col(valCol).cast("long")).as("__tot"))
    val wPrefix = Window.partitionBy(stratumCol).orderBy("__bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val side = totals
      .withColumn("__spre", coalesce(sum("__tot").over(wPrefix), lit(0L)))
      .select(col("__bkt"), col(stratumCol), col("__spre"))
    local.join(broadcast(side), Seq("__bkt", stratumCol))
      .withColumn("prefix", (col("__local") + col("__spre")).cast("long"))
      .drop("__bkt", "__local", "__spre")
  }

  /** Token-budget mixture sampling (the Dolma/DataTrove corpus
    * assembly pass): keep each stratum's documents in the portable
    * md5(id) order until the stratum's running token total reaches
    * `budget`. Greedy-inclusive: a document is kept iff the tokens
    * BEFORE it are under budget, so every stratum gets at least its
    * first document. Deterministic across engines, reruns, and
    * partitionings — the kept set is a pure function of
    * (ids, token counts, budget).
    */
  def tokenBudgetSample(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      nTokCol: String,
      budget: Long,
      numPartitions: Int = 0): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val keyed = df.withColumn("__h", md5(col(idCol).cast("string")))
    stratifiedPrefixSum(keyed, stratumCol, Seq("__h", idCol), nTokCol,
      numPartitions)
      .filter(col("prefix") < budget)
      .drop("__h")
  }

  /** Exact per-stratum quantile buckets over a deterministic order
    * (CCNet's head/middle/tail split at nBuckets = 3):
    * `bucket = (rk-1)·nBuckets DIV n_stratum + 1` — integral
    * arithmetic, so the split is identical on any engine and any
    * partitioning.
    */
  def quantileBuckets(
      df: DataFrame,
      stratumCol: String,
      orderCols: Seq[String],
      nBuckets: Int,
      numPartitions: Int = 0): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    stratifiedRank(df, stratumCol, orderCols, numPartitions)
      .withColumn("bucket",
        expr(s"(rk - 1L) * ${nBuckets}L DIV n_stratum + 1L"))
  }

  /** Rank-uniform (quantile) normalization per stratum: each distinct
    * value maps to its mid-rank quantile
    * `qnorm = (2·cntLess + ties + 1) / (2·n)` ∈ (0, 1] — the
    * feature-scaling transform that is immune to outliers and
    * monotone-invariant (any heavy-tailed score column becomes
    * uniform; compose with an inverse-CDF for Gaussian targets).
    * Ties share one mid-rank, so the map is a well-defined function
    * of the value (not the row), making it joinable as a model.
    *
    * Returns the normalization TABLE `(stratum, value, n_ties,
    * qnorm)` — distinct-value-sized, the broadcastable artifact to
    * join back onto any relation carrying the column.
    *
    * Parity: the numerator stays integral (the q182 doubled-units
    * device); the single division is IEEE, round-6.
    *
    * Scale shape: one map-side-combined aggregate to the
    * distinct-value table, then the two-phase distributed prefix sum
    * ([[stratifiedPrefixSum]]) — no corpus-sized single-partition
    * window; stratum totals broadcast back.
    */
  def quantileNormalize(
      df: DataFrame,
      stratumCol: String,
      valueCol: String,
      numPartitions: Int = 0): DataFrame = {
    val vc = df.filter(col(valueCol).isNotNull)
      .groupBy(col(stratumCol), col(valueCol))
      .agg(count(lit(1)).as("__c"))
    val pre = stratifiedPrefixSum(vc, stratumCol, Seq(valueCol), "__c",
      numPartitions)
    val n = vc.groupBy(stratumCol).agg(sum(col("__c")).as("__n"))
    pre.join(broadcast(n), stratumCol)
      .withColumn("qnorm", round(
        (lit(2L) * col("prefix") + col("__c") + lit(1L)).cast("double") /
          (lit(2L) * col("__n")).cast("double"), 6))
      .select(col(stratumCol), col(valueCol),
        col("__c").cast("long").as("n_ties"), col("qnorm"))
  }
}
