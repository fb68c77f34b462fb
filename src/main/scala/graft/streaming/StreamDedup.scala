package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming deduplication — the continuous-ingest counterpart of the
  * batch exact-dedup operator (ops/Dedup.scala). Two paths:
  *
  *  - [[dedupWithinWatermark]]: Spark-native
  *    `dropDuplicatesWithinWatermark` — state for a key is dropped once
  *    the watermark passes it, so state size is bounded by the
  *    watermark horizon × key arrival rate. This is the 100 TB-stream
  *    answer: no unbounded seen-set.
  *
  *  - [[firstSeenTagged]]: custom state via `flatMapGroupsWithState`
  *    (the KeyValueGroupedDataset custom-state surface): every record
  *    is EMITTED, tagged with whether its key was seen before and the
  *    running per-key count — the streaming version of the batch
  *    dup-groups operator (q21), useful when the pipeline wants to
  *    route dupes rather than drop them. State carries one counter per
  *    live key and expires on a processing-time timeout.
  */
object StreamDedup {

  case class KeyedRecord(key: String, ts: java.sql.Timestamp, payload: String)
  case class SeenState(count: Long)
  case class TaggedRecord(
      key: String,
      ts: java.sql.Timestamp,
      payload: String,
      seen_before: Boolean,
      seen_count: Long)

  /** Built-in streaming dedup: duplicates of a key arriving within the
    * watermark horizon are dropped; state self-expires.
    */
  def dedupWithinWatermark(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      watermark: String = "10 minutes"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming incremental dedup — the continuous-ingest composition
    * of the batch rolling-corpus shape (ops/Dedup.dedupAgainst, q77):
    *
    *  1. records whose content digest is already in the PERSISTED
    *     `seen` index drop via a stream-static LEFT ANTI join — the
    *     index stays on the static side (broadcast when small), so no
    *     index entry ever enters the stream's state store;
    *  2. within the stream, exact dedup by digest via custom state:
    *     per micro-batch each digest group emits its min-`tieBreak`
    *     row on first sight (deterministic regardless of arrival order
    *     inside the batch — the batch group is complete when the
    *     function runs); later batches find the state marker and emit
    *     nothing. Restarting from a checkpoint resumes the marker set,
    *     so a re-ingested file cannot re-emit its keys.
    *
    * State is one empty marker per distinct NEW digest — the same
    * 16-bytes-per-document budget as the batch index. At 100 TB-stream
    * scale, bound it by periodically folding emitted digests into the
    * persisted index and restarting with a fresh checkpoint (the
    * rolling-corpus cycle), or use [[dedupWithinWatermark]] when a
    * time horizon is acceptable.
    */
  def dedupAgainstIndex(
      stream: DataFrame,
      seen: DataFrame,
      keyCols: Seq[String],
      tieBreak: String): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val schema = stream.schema
    // narrower than the batch twin (Dedup.exact orders by any type):
    // the state row carries the tie-break as a long, so a string
    // tie-break would cast to NULL and blow up the encoder mid-stream,
    // and a FRACTIONAL one (double score, sub-second timestamp) would
    // silently truncate — collapsing ties and letting minBy resolve by
    // arrival order, i.e. non-deterministic kept rows
    require({
      import org.apache.spark.sql.types._
      Seq(ByteType, ShortType, IntegerType, LongType)
        .contains(schema(tieBreak).dataType)
    },
      s"dedupAgainstIndex requires an integral tieBreak column " +
        s"(byte/short/int/long — fractional values would truncate and " +
        s"break deterministic tie-breaks); got ${schema(tieBreak).dataType}")
    val fresh = stream.join(seen.select(col("digest")),
      graft.ops.Dedup.contentDigest(keyCols) === col("digest"), "left_anti")
    val packed = fresh.select(
      graft.ops.Dedup.contentDigest(keyCols).as("key"),
      col(tieBreak).cast("long").as("tie"),
      to_json(struct(fresh.columns.map(col).toIndexedSeq: _*)).as("payload"))
      .as[IdxRecord]
    val kept = packed.groupByKey(_.key)
      .flatMapGroupsWithState[KeptMarker, IdxRecord](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state) =>
          if (state.exists) Iterator.empty
          else {
            val best = rows.minBy(_.tie)
            state.update(KeptMarker(best.tie))
            Iterator.single(best)
          }
      }
    kept.select(from_json(col("payload"), schema).as("__r"))
      .select(col("__r.*"))
  }

  case class IdxRecord(key: String, tie: Long, payload: String)
  // carries the kept row's tie-break; also: a zero-field state class
  // breaks FlatMapGroupsWithState's state manager (Nil.head on the
  // empty schema), so the marker must hold at least one column
  case class KeptMarker(tie: Long)

  /** Custom-state dedup tagging: all records flow through, stamped
    * with (seen_before, seen_count). Rows inside one micro-batch group
    * are processed in event-time order.
    *
    * `stateTimeout`: None → state lives for the query's lifetime
    * (NoTimeout). Some(duration) → per-key state expires after the
    * duration of inactivity. NOTE: a processing-time timeout makes the
    * engine self-trigger batches to evaluate expirations, so pair it
    * with a real trigger interval — under the default ASAP trigger the
    * engine busy-loops empty batches (and `processAllAvailable` never
    * quiesces).
    */
  def firstSeenTagged(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      stateTimeout: Option[String] = None): Dataset[TaggedRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    val payload = to_json(struct(df.columns.map(col).toIndexedSeq: _*))
    val packed = df.select(
      col(keyCol).cast("string").as("key"),
      col(tsCol).cast("timestamp").as("ts"),
      payload.as("payload")).as[KeyedRecord]
    val timeoutConf = stateTimeout match {
      case Some(_) => GroupStateTimeout.ProcessingTimeTimeout
      case None => GroupStateTimeout.NoTimeout
    }
    packed.groupByKey(_.key)
      .flatMapGroupsWithState[SeenState, TaggedRecord](
        OutputMode.Append, timeoutConf) {
        case (key, rows, state) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var count = state.getOption.map(_.count).getOrElse(0L)
            // materialize before updating state: the iterator must not
            // observe post-update state
            val out = rows.toSeq.sortBy(_.ts.getTime).map { r =>
              count += 1
              TaggedRecord(key, r.ts, r.payload, count > 1, count)
            }
            state.update(SeenState(count))
            stateTimeout.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }
}
