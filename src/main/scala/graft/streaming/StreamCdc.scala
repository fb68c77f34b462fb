package graft.streaming

import org.apache.spark.sql.DataFrame
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming changelog materialization — [[graft.ops.Cdc]]'s
  * continuous twin: the changelog arrives as a stream and per-key
  * state tracks the winning row under the (ord1, ord2) total order.
  * Each micro-batch emits a key's current winner iff it CHANGED
  * (update semantics); the final emission per key is the materialized
  * state. Tombstone handling stays downstream (on the final rows),
  * exactly like the batch form — a tombstoned key keeps absorbing
  * later upserts.
  *
  * State is one (ord1, ord2, payload) row per live key — bounded by
  * key cardinality, not stream length. At 100 TB-stream scale the
  * payload should be the columns the snapshot needs, not the full
  * record; keys age out with a state timeout when the key space is
  * unbounded (same knob as [[StreamDedup.firstSeenTagged]]).
  */
object StreamCdc {

  case class ChangeRec(key: String, ord1: Long, ord2: Long, payload: String)
  case class WinnerState(ord1: Long, ord2: Long, payload: String)

  // the payload JSON round-trip must keep MICROSECONDS — the default
  // to_json timestamp format truncates to millis, which would corrupt
  // the snapshot's event times
  private val jsonOpts = Map(
    "timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")

  /** `keyCol` groups the log; `(ord1Col, ord2Col)` must be a TOTAL
    * order per key (make ord2 a unique id — ties would make "latest"
    * nondeterministic, the same contract as the batch form). Both
    * order columns must be integral (the state row carries longs; a
    * fractional order would truncate and collapse ties — the
    * [[StreamDedup.dedupAgainstIndex]] rule).
    *
    * Returns the UPDATE stream `(key, ord1, ord2, payload)`; run with
    * [[StreamPipeline.runToResultUpdate]] and reduce to the max
    * (ord1, ord2) row per key.
    */
  def latestState(
      stream: DataFrame,
      keyCol: String,
      ord1Col: String,
      ord2Col: String): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val schema = stream.schema
    require({
      import org.apache.spark.sql.types._
      Seq(ByteType, ShortType, IntegerType, LongType, TimestampType)
        .contains(schema(ord1Col).dataType) &&
        Seq(ByteType, ShortType, IntegerType, LongType)
          .contains(schema(ord2Col).dataType)
    }, s"latestState needs integral (or timestamp) order columns; got " +
      s"(${schema(ord1Col).dataType}, ${schema(ord2Col).dataType})")
    val ord1 = schema(ord1Col).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(col(ord1Col))
      case _ => col(ord1Col).cast("long")
    }
    val packed = stream.select(
      col(keyCol).cast("string").as("key"),
      ord1.as("ord1"),
      col(ord2Col).cast("long").as("ord2"),
      to_json(struct(stream.columns.map(col).toIndexedSeq: _*),
        jsonOpts.asJava).as("payload"))
      .as[ChangeRec]
    packed.groupByKey(_.key)
      .flatMapGroupsWithState[WinnerState, ChangeRec](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (key, rows, state) =>
          val batchBest = rows.maxBy(r => (r.ord1, r.ord2))
          val better = !state.exists ||
            Ordering[(Long, Long)].lt(
              (state.get.ord1, state.get.ord2),
              (batchBest.ord1, batchBest.ord2))
          if (better) {
            state.update(
              WinnerState(batchBest.ord1, batchBest.ord2, batchBest.payload))
            Iterator.single(
              ChangeRec(key, batchBest.ord1, batchBest.ord2, batchBest.payload))
          } else Iterator.empty
      }.toDF()
  }

  /** Reduce an update stream collected by `runToResultUpdate` back to
    * the final snapshot rows (max (ord1, ord2) per key), decoded to
    * the original schema.
    */
  def materialize(updates: DataFrame,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy(col("ord1").desc, col("ord2").desc)
    updates.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(from_json(col("payload"), schema, jsonOpts.asJava).as("__r"))
      .select(col("__r.*"))
  }
}
