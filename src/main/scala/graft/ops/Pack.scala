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
  *   1. deterministic ordered bucketing by id ([[Prefix.bucketed]]:
  *      boundary literals frozen at build time, `__bkt` a pure data
  *      column, one hash exchange);
  *   2. per-bucket running sums — a window over the existing `__bkt`
  *      partitioning (no second corpus exchange; `__bkt` being a
  *      VALUE makes the row side and the totals side agree without
  *      the checkpoint pinning rounds 10–11 needed);
  *   3. per-bucket totals → B rows → tiny single-partition prefix
  *      scan over B values → broadcast back.
  *
  * Only the B-row totals table ever crosses a partition boundary
  * twice; the corpus itself sees one hash exchange and map-side work —
  * the same shape holds at 1000 executors over 100 TB. Token counts
  * are integral (the window accumulates longs).
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
    val withB = Prefix.bucketed(df, Seq(col(idCol)), parts)
    val ranged = withB.repartition(parts, col("__bkt"))
    // bucket-local exclusive running sum — window over the existing
    // __bkt partitioning, no second corpus exchange
    val w = Window.partitionBy(col("__bkt")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = ranged.withColumn("__local",
      when(col(nTokCol).isNull, lit(null).cast("long"))
        .otherwise(coalesce(sum(col(nTokCol).cast("long")).over(w), lit(0L))))
    // B-row totals — __bkt is a deterministic data column, so this
    // aggregate and the row side agree across executions; the
    // single-partition window here scans B values, not the corpus
    // (B = 4× shuffle partitions, i.e. thousands at most)
    val totals = withB.groupBy(col("__bkt"))
      .agg(sum(col(nTokCol).cast("long")).as("__tot"))
    val wPrefix = Window.orderBy("__bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = totals
      .withColumn("__prefix", coalesce(sum("__tot").over(wPrefix), lit(0L)))
      .select(col("__bkt"), col("__prefix"))
    local.join(broadcast(prefix), "__bkt")
      .withColumn("offset", (col("__local") + col("__prefix")).cast("long"))
      .drop("__bkt", "__local", "__prefix")
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
