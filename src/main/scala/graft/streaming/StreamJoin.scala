package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the streaming counterpart of
  * `ops.Events.intervalJoinCount`, built on Structured Streaming's
  * watermarked stream-stream inner join. The same time-bucket device
  * applies: the right stream explodes to its three window-width
  * candidate buckets and the join keys on BUCKET EQUALITY plus the
  * exact timestamp-range predicate, so the state store matches
  * per-bucket instead of scanning every buffered right row for every
  * left row (and Spark plans a hash join, not a nested loop).
  *
  * Both sides carry event-time watermarks and the range predicate is
  * on the watermarked timestamp columns, which is exactly what Spark
  * needs to age buffered rows out of the join state — at 100 TB/day
  * the state holds only ± window + watermark delay of stream history,
  * regardless of total volume.
  */
object StreamJoin {

  /** Emits one row per in-window (left, right) pair:
    * `(leftId, left_us, right_us)`. Bucket edges cannot double-count —
    * the three candidate buckets are distinct and the left row owns
    * exactly one bucket.
    */
  def intervalPairs(
      left: DataFrame,
      leftId: String,
      leftTs: String,
      right: DataFrame,
      rightTs: String,
      windowSec: Long,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    require(windowSec >= 1, "intervalPairs: windowSec must be positive")
    val w = windowSec * 1000000L
    val l = left
      .select(col(leftId).as("__lid"), col(leftTs).as("__lts"),
        unix_micros(col(leftTs)).as("__lus"))
      .withColumn("__b", expr(s"__lus div ${w}L"))
      .withWatermark("__lts", watermarkDelay)
    val r = right
      .select(col(rightTs).as("__rts"), unix_micros(col(rightTs)).as("__rus"))
      .withColumn("__rb0", expr(s"__rus div ${w}L"))
      .select(col("__rts"), col("__rus"),
        explode(array(col("__rb0") - 1, col("__rb0"), col("__rb0") + 1))
          .as("__rb"))
      .withWatermark("__rts", watermarkDelay)
    l.join(r,
      col("__b") === col("__rb") &&
        col("__rts") >= col("__lts") - expr(s"INTERVAL $windowSec SECONDS") &&
        col("__rts") <= col("__lts") + expr(s"INTERVAL $windowSec SECONDS"),
      "inner")
      .select(col("__lid"), col("__lus").as("left_us"),
        col("__rus").as("right_us"))
  }

  /** LEFT OUTER twin: every left row emits — matched pairs as they
    * arrive, and an UNMATCHED left row (null `right_us`) once the
    * watermark passes the point where a match could still arrive. The
    * bucket device stays sound for outer joins because a left row
    * appears in exactly ONE bucket (only the right side explodes):
    * null-extension fires iff no right row matched bucket AND range,
    * and any in-range right row lands in one of the left row's three
    * candidate buckets.
    *
    * Same state bound as the inner form; the null-extended rows are
    * the streaming answer to "which events never got a response" —
    * emitted with watermark latency, not at query end.
    */
  def intervalPairsLeftOuter(
      left: DataFrame,
      leftId: String,
      leftTs: String,
      right: DataFrame,
      rightTs: String,
      windowSec: Long,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    require(windowSec >= 1, "intervalPairsLeftOuter: windowSec must be positive")
    val w = windowSec * 1000000L
    val l = left
      .select(col(leftId).as("__lid"), col(leftTs).as("__lts"),
        unix_micros(col(leftTs)).as("__lus"))
      .withColumn("__b", expr(s"__lus div ${w}L"))
      .withWatermark("__lts", watermarkDelay)
    val r = right
      .select(col(rightTs).as("__rts"), unix_micros(col(rightTs)).as("__rus"))
      .withColumn("__rb0", expr(s"__rus div ${w}L"))
      .select(col("__rts"), col("__rus"),
        explode(array(col("__rb0") - 1, col("__rb0"), col("__rb0") + 1))
          .as("__rb"))
      .withWatermark("__rts", watermarkDelay)
    l.join(r,
      col("__b") === col("__rb") &&
        col("__rts") >= col("__lts") - expr(s"INTERVAL $windowSec SECONDS") &&
        col("__rts") <= col("__lts") + expr(s"INTERVAL $windowSec SECONDS"),
      "left_outer")
      .select(col("__lid"), col("__lus").as("left_us"),
        col("__rus").as("right_us"))
  }
}
