package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

/** Structured-Streaming shape of the engine (SURVEY §1.4, §2.5
  * "Streaming"): the reference is batch-only (Kafka is sink-only, K10),
  * so streaming here is the *extension* surface for continuous ingest —
  * `readStream → transforms → writeStream`, watermarked event-time
  * windows, and `foreachBatch` multi-sink fan-out (the streaming
  * equivalent of the MultiSinkPipeline D5).
  */
object StreamPipeline {

  /** File-drop continuous ingest: watch a directory for NDJSON/parquet
    * files — the streaming version of the FILE source (S1).
    */
  def fileStream(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType,
      format: String = "json"): DataFrame =
    spark.readStream.schema(schema).format(format).load(path)

  /** Windowed event aggregation with late-data handling: tumbling
    * window over event-time + watermark. At scale the state store is
    * keyed by (window, keys) — bounded by the watermark horizon.
    */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      windowLen: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col(keyCol), col("n"), col("total_value"))

  /** Sessionization with session_window (gap-based), the streaming
    * version of the batch q32 lag/cumsum approach.
    */
  def sessionWindows(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark(tsCol, gap)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col(keyCol), col("n_events"))

  /** Run a streaming aggregation over the files already present
    * (Trigger.AvailableNow), collect the COMPLETE result into a memory
    * sink, and return it as a batch DataFrame. This is the
    * batch-parity entry that puts the streaming engine inside the
    * DuckDB-oracle correctness gate: the same windowed aggregation,
    * executed by the streaming runtime, must hash-match the oracle.
    */
  def runToResult(spark: SparkSession, stream: DataFrame, name: String): DataFrame =
    runToMemory(spark, stream, name, OutputMode.Complete)

  /** Append-mode twin of [[runToResult]] for stateful operators
    * (flatMapGroupsWithState, dropDuplicates) whose output is a row
    * stream, not a complete aggregate: the memory sink accumulates
    * every appended micro-batch, so the returned table is the full
    * emitted set over the AvailableNow run.
    */
  def runToResultAppend(
      spark: SparkSession,
      stream: DataFrame,
      name: String,
      noDataBatches: Boolean = true): DataFrame =
    runToMemory(spark, stream, name, OutputMode.Append, noDataBatches)

  /** Update-mode twin: for stateful operators that re-emit a key's
    * CURRENT value as it changes (latest-state materialization). The
    * memory sink appends every update row, so the returned table holds
    * the update STREAM — the caller reduces to the final row per key
    * (bounded by keys × batches).
    */
  def runToResultUpdate(spark: SparkSession, stream: DataFrame, name: String): DataFrame =
    runToMemory(spark, stream, name, OutputMode.Update)

  /** `noDataBatches = false` skips the watermark-advance micro-batch
    * after the data batch (`spark.sql.streaming.noDataMicroBatches
    * .enabled`, captured at query START like the gate bound). ONLY
    * sound for operators whose emission does not wait on the
    * watermark — stream-stream INNER joins emit on match, so the
    * no-data batch contributes nothing but a full offset-log/commit/
    * state-store-commit cycle to an AvailableNow gate run (q105:
    * 3.65 → 2.58 s scoped median-of-5). Append-mode AGGREGATIONS
    * (windowed counts, session windows, dedup-with-expiry readouts)
    * MUST keep the default: their finalized rows only emit when the
    * watermark passes, which for a file source happens in exactly
    * that trailing batch.
    */
  private def runToMemory(
      spark: SparkSession, stream: DataFrame, name: String,
      mode: OutputMode, noDataBatches: Boolean = true): DataFrame = {
    // LOCAL-GATE state-partition bound (r18, generalizing the q105
    // note): with tiny state, per-(partition × batch) state-store
    // commit overhead dominates an AvailableNow gate run — each
    // stateful operator commits one store per shuffle partition per
    // micro-batch regardless of rows. Bound the partition count for
    // the duration of the stream (the plan captures it at START;
    // restored right after, so later batch queries on the session are
    // unaffected). Parameterized via `spark.graft.stream.gatePartitions`
    // (default 8), never raised above the session's own setting — on a
    // real cluster the right lever is NOT fewer partitions but the
    // RocksDB provider + changelog checkpointing (scaladoc above);
    // results are partition-count-independent (exact aggregates /
    // keyed state), re-proven by the oracle gate at both SFs.
    // The set → start() → restore window mutates a SESSION-global
    // conf, so it is serialized under a lock (r18 ADVICE): without it,
    // two concurrent runToMemory calls could restore each other's
    // values, and a batch query planned on the shared session inside
    // the window would silently pick up the gated partition count.
    // The lock bounds only query START (planning captures the conf);
    // awaitTermination stays outside, so gate runs still overlap.
    // A concurrent UNRELATED writer of spark.sql.shuffle.partitions on
    // the same session remains unscoped — that is the documented
    // single-writer contract of this helper.
    val ndKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val q = gateLock.synchronized {
      val sessParts = spark.conf.get("spark.sql.shuffle.partitions")
      val prevNd = spark.conf.getOption(ndKey)
      val gate = math.min(sessParts.toInt,
        spark.conf.getOption("spark.graft.stream.gatePartitions")
          .map(_.toInt).getOrElse(8))
      try {
        spark.conf.set("spark.sql.shuffle.partitions", gate.toString)
        if (!noDataBatches) spark.conf.set(ndKey, "false")
        stream.writeStream
          .format("memory")
          .queryName(name)
          .outputMode(mode)
          .trigger(Trigger.AvailableNow())
          .start()
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", sessParts)
        prevNd match {
          case Some(v) => spark.conf.set(ndKey, v)
          case None => spark.conf.unset(ndKey)
        }
      }
    }
    q.awaitTermination()
    spark.table(name)
  }

  private val gateLock = new Object

  /** The production state-store configuration for stateful streaming
    * at scale: RocksDB provider + changelog checkpointing. The default
    * HDFS-backed provider keeps every key in executor heap and
    * snapshots the FULL store to the checkpoint each commit — at
    * 100 TB-class state (large interval-join windows, high-cardinality
    * dedup markers) that is both an OOM risk and a per-batch commit
    * cost proportional to total state. RocksDB spills state off-heap /
    * to local disk, and changelog checkpointing uploads only each
    * batch's delta, turning the commit cost into O(changed keys).
    *
    * Results are provider-independent (StreamingSpec pins interval
    * join, windowed counts and marker-state dedup byte-equal under
    * both providers); the ONLY observable difference is cost shape.
    * Local small-state runs (the oracle gate) keep the default
    * provider — per-batch RocksDB instance spin-up dominates tiny
    * state there; see q105's shuffle-partition note in SparkEntry.
    *
    * WHEN TO SWITCH (measured, SCALE.md round-10 state-store
    * rehearsal): the providers break even around ~50k total state
    * keys on this harness; RocksDB's advantage then WIDENS with state
    * size (1.33× at 50k keys → 1.76× at 2M keys, and the HDFS
    * provider's full-store snapshot keeps growing linearly past
    * that). Rule of thumb for a production caller: expected steady
    * state under ~10⁴ keys per query → keep the default provider;
    * 10⁵ keys or more, or unbounded growth (dedup markers over an
    * open key space) → wrap the `.start()` in
    * [[withRocksDbStateStore]] — or state the expected key count and
    * let [[withAutoStateStore]] pick. There is no results risk in
    * switching late — only the commit-cost shape changes.
    */
  val RocksDbConfs: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
      "true")

  /** Measured provider break-even (SCALE.md round-10 state-store
    * rehearsal): below ~50k steady-state keys the default provider's
    * zero per-batch spin-up wins; at or above it RocksDB + changelog
    * checkpointing wins, and its advantage widens with state size. */
  val StateStoreBreakEvenKeys: Long = 50000L

  /** Encode the state-store decision in code (round-11 VERDICT
    * directive 8): run `body` under the provider the MEASURED
    * break-even picks for `expectedKeys` — the caller states expected
    * steady-state key cardinality (per stateful operator) instead of
    * re-deriving the rule of thumb from the scaladoc. Unknown or
    * unbounded key spaces (open-ended dedup markers) should pass
    * `Long.MaxValue`: unbounded growth always crosses the break-even.
    * Results are provider-independent (StreamingSpec pins byte-equal
    * outputs through BOTH branches of this helper); only the
    * commit-cost shape changes.
    *
    * NOT for `transformWithState` topologies ([[StreamTopK]]): that
    * API needs state-store column families, which only RocksDB
    * provides — the default-provider branch here crashes under it
    * (`STATE_STORE_MULTIPLE_COLUMN_FAMILIES`) regardless of key
    * count. Such callers must use [[withRocksDbStateStore]] directly;
    * the break-even choice only exists for provider-agnostic
    * stateful operators (dedup markers, windowed aggs,
    * flatMapGroupsWithState).
    */
  def withAutoStateStore[T](spark: SparkSession, expectedKeys: Long)(
      body: => T): T =
    if (expectedKeys >= StateStoreBreakEvenKeys)
      withRocksDbStateStore(spark)(body)
    else body

  /** Run `body` with the RocksDB state store enabled, restoring the
    * previous session confs afterwards. Streaming queries capture the
    * provider at START, so wrapping the `.start()` call is sufficient
    * and later queries on the session are unaffected.
    */
  def withRocksDbStateStore[T](spark: SparkSession)(body: => T): T = {
    val prev = RocksDbConfs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    RocksDbConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Multi-sink streaming write: one query, each micro-batch persisted
    * once then written to every sink — `foreachBatch` is the streaming
    * MultiSinkPipeline (D5).
    */
  def multiSinkWriter(
      df: DataFrame,
      sinks: Seq[DataFrame => Unit],
      checkpoint: String): DataStreamWriter[Row] =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("5 seconds"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (sinks.size > 1) {
          batch.persist()
          try sinks.foreach(f => f(batch))
          finally batch.unpersist()
        } else sinks.foreach(f => f(batch))
      }
}
