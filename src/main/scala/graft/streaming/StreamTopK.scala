package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming per-key top-k selection on Spark 4's `transformWithState`
  * — the arbitrary-state API that replaces `mapGroupsWithState`
  * (typed per-state-variable storage, TTL, timers; SPARK-46815). The
  * continuous-ingest counterpart of a batch `row_number() ≤ k`: keep
  * the k best-scored records per key ACROSS micro-batches with
  * bounded keyed state — "best 10 examples per language so far" over
  * an unbounded ingest, without ever re-sorting history.
  *
  * State = one ≤ k-entry list + one version counter per key — bounded
  * by keys × k, never stream length. The kept SET after any batch
  * split is a pure function of the records seen (top-k by
  * (score DESC, id ASC) is associative/commutative over sets), so
  * results are arrival-order-free and batch/stream parity is exact —
  * q259 pins it against the batch window oracle.
  *
  * Each batch emits the key's CURRENT top-k tagged with a version
  * (batches-seen counter); the caller keeps each key's max-version
  * rows for the final standings (the runToResultUpdate reduction
  * pattern). `transformWithState` requires the RocksDB state store —
  * run under [[StreamPipeline.withRocksDbStateStore]].
  */
object StreamTopK {

  case class Scored(key: String, id: Long, score: Long)
  case class TopEntry(score: Long, id: Long)
  case class Snapshot(key: String, version: Long, rank: Int, id: Long,
      score: Long)

  class TopKProcessor(k: Int)
      extends StatefulProcessor[String, Scored, Snapshot] {
    @transient private var top: ListState[TopEntry] = _
    @transient private var version: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      top = getHandle.getListState[TopEntry]("top",
        Encoders.product[TopEntry], TTLConfig.NONE)
      version = getHandle.getValueState[Long]("version",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: String,
        rows: Iterator[Scored],
        timerValues: TimerValues): Iterator[Snapshot] = {
      val merged = (top.get().toSeq ++
        rows.map(r => TopEntry(r.score, r.id)))
        .sortBy(e => (-e.score, e.id))
        .take(k)
      top.put(merged.toArray)
      val v = (if (version.exists()) version.get() else 0L) + 1L
      version.update(v)
      merged.iterator.zipWithIndex.map { case (e, i) =>
        Snapshot(key, v, i + 1, e.id, e.score)
      }
    }
  }

  /** Per-key streaming top-k snapshots; reduce to each key's
    * max-version rows for the current standings.
    */
  def topKPerKey(
      df: DataFrame,
      keyCol: String,
      idCol: String,
      scoreCol: String,
      k: Int): Dataset[Snapshot] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val packed = df
      .filter(col(scoreCol).isNotNull && col(keyCol).isNotNull)
      .select(col(keyCol).cast("string").as("key"),
        col(idCol).cast("long").as("id"),
        col(scoreCol).cast("long").as("score")).as[Scored]
    packed.groupByKey(_.key)
      .transformWithState(new TopKProcessor(k),
        TimeMode.None(), OutputMode.Append())
  }
}
