package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: concatenate the corpus token
  * stream in id order and chunk it into fixed-size context windows
  * (the GPT-style "concat and chunk" batch prep). The core primitive
  * is a GLOBAL running token offset per document — a prefix sum.
  *
  * Scale design: a naive `Window.orderBy(id)` running sum moves the
  * whole corpus into ONE partition (Spark warns exactly this). Instead
  * the offset is computed as a two-phase distributed prefix sum:
  *
  *   1. range-repartition by id (P ordered partitions);
  *   2. per-partition running sums — an imperative in-partition scan
  *      ([[Prefix.localScan]]; the round-7 window-on-__pid form made
  *      Catalyst re-exchange the corpus on __pid);
  *   3. per-partition totals → P rows → tiny single-partition prefix
  *      scan over P values → broadcast back.
  *
  * Only the P-row totals table ever crosses a partition boundary
  * twice; the corpus itself sees one range shuffle and map-side work —
  * the same shape holds at 1000 executors over 100 TB. Token counts
  * are integral (the scan accumulates longs).
  */
object Pack {

  /** Adds `offset` — the number of tokens in all documents with a
    * smaller `idCol` (exclusive prefix sum of `nTokCol` in id order).
    */
  def tokenOffsets(
      df: DataFrame,
      idCol: String,
      nTokCol: String,
      numPartitions: Int = 0): DataFrame = {
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(parts, col(idCol))
    // partition-local exclusive running sum — no cross-partition data,
    // no second corpus exchange
    val local = Prefix.localScan(ranged, stratumCol = None,
      sortCols = Seq(col(idCol)), valCol = Some(nTokCol))
    // P-row totals derived from `local`'s pinned checkpoint (see
    // Prefix.localScan — one execution, one __pid space); the
    // single-partition window here scans P values, not the corpus
    // (P = shuffle partitions, i.e. thousands at most)
    val totals = local.groupBy("__pid")
      .agg(sum(col(nTokCol).cast("long")).as("__tot"))
    val wPrefix = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = totals
      .withColumn("__prefix", coalesce(sum("__tot").over(wPrefix), lit(0L)))
      .select(col("__pid"), col("__prefix"))
    local.join(broadcast(prefix), "__pid")
      .withColumn("offset", (col("__local") + col("__prefix")).cast("long"))
      .drop("__pid", "__local", "__prefix")
  }

  /** Assigns each document its context-window span under
    * concat-and-chunk packing with `budget` tokens per window:
    * `pack_first`/`pack_last` are the first and last window indices the
    * document's tokens land in (documents straddle window boundaries,
    * as in pretraining batch prep).
    */
  def contiguous(
      df: DataFrame,
      idCol: String,
      nTokCol: String,
      budget: Long,
      numPartitions: Int = 0): DataFrame = {
    require(budget > 0, s"pack budget must be positive, got $budget")
    // integral DIV, not double `/`: exact for any 64-bit token offset
    tokenOffsets(df, idCol, nTokCol, numPartitions)
      .withColumn("pack_first", expr(s"offset DIV ${budget}L"))
      .withColumn("pack_last", expr(
        s"(offset + greatest(`$nTokCol`, 1L) - 1L) DIV ${budget}L"))
  }
}
