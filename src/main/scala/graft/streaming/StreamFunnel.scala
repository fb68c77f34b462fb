package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming conversion funnel — the continuous counterpart of
  * `ops.Events.funnelStages`: per-user greedy subsequence matching with
  * the stage cursor carried ACROSS micro-batches in keyed state. State
  * is (depth, last-match position) per user — three longs, bounded by
  * user cardinality, never by stream length.
  *
  * Ordering contract: rows are sorted by (ts, tie) WITHIN each
  * micro-batch before folding, so any in-batch disorder is repaired;
  * ACROSS batches a stage event that arrives after a later-timestamped
  * match has been consumed cannot retroactively advance the funnel
  * (the cursor only moves forward). That is the CEP-standard
  * event-time-ordered ingestion assumption; feed the stream through a
  * watermark sort first if the source violates it. On an ordered
  * replay the emitted depths reproduce the batch funnel exactly —
  * q101 pins batch/stream parity against q92's oracle.
  */
object StreamFunnel {

  case class FEvent(user_id: Long, us: Long, tie: Long, typ: String)
  case class FState(depth: Int, lastUs: Long, lastTie: Long)
  case class FDepth(user_id: Long, depth: Int)

  /** Emits one (user, depth) row per stage advance. The funnel table
    * itself is `Events.stageCounts` over `max(depth)` per user.
    */
  def funnelDepthUpdates(
      stream: DataFrame,
      userCol: String,
      tsCol: String,
      tieCol: String,
      typeCol: String,
      stages: Seq[String]): Dataset[FDepth] = {
    require(stages.nonEmpty && stages.distinct.size == stages.size,
      "funnelDepthUpdates: stages must be non-empty and distinct")
    val spark = stream.sparkSession
    import spark.implicits._
    val k = stages.size
    val evs = stream
      .filter(col(typeCol).isin(stages.map(x => x: Any): _*))
      .select(col(userCol).cast("long").as("user_id"),
        unix_micros(col(tsCol)).as("us"),
        col(tieCol).cast("long").as("tie"),
        col(typeCol).as("typ"))
      .as[FEvent]
    evs.groupByKey(_.user_id)
      .flatMapGroupsWithState[FState, FDepth](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (u, rows, state) =>
          val st = state.getOption
            .getOrElse(FState(0, Long.MinValue, Long.MinValue))
          var depth = st.depth; var lu = st.lastUs; var lt = st.lastTie
          val out = Seq.newBuilder[FDepth]
          // repair in-batch disorder; the tie column makes the sort total
          val sorted = rows.toIndexedSeq.sortBy(e => (e.us, e.tie))
          sorted.foreach { e =>
            if (depth < k && e.typ == stages(depth) &&
              (e.us > lu || (e.us == lu && e.tie > lt))) {
              depth += 1; lu = e.us; lt = e.tie
              out += FDepth(u, depth)
            }
          }
          state.update(FState(depth, lu, lt))
          out.result().iterator
      }
  }
}
