package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Component metrics (reference
  * internal/component/common/commonmetric.go:15-26: record count,
  * record bytes, process duration, retry count per component).
  *
  * Spark-first shapes instead of an OTEL meter:
  *  - per-pass record/byte counts ride the query itself via
  *    `Dataset.observe` — map-side aggregate metrics with ZERO extra
  *    passes, delivered on job completion to a QueryExecutionListener
  *    (the Spark-native analogue of an in-stream counter);
  *  - driver-side counters (retries, durations) are
  *    `LongAccumulator`s, which the Spark UI surfaces per stage.
  */
object Metrics {

  /** Snapshot of the last observed metrics per observation name. */
  private val observed =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, Long]]

  @volatile private var listenerInstalled = false

  /** Install the listener once per session. */
  def install(spark: SparkSession): Unit = synchronized {
    if (!listenerInstalled) {
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          private def capture(qe: org.apache.spark.sql.execution.QueryExecution): Unit =
            qe.observedMetrics.foreach { case (name, row) =>
              observed.put(name,
                row.schema.fieldNames.zipWithIndex.map { case (f, i) =>
                  f -> (row.get(i) match {
                    case n: Number => n.longValue
                    case _ => 0L
                  })
                }.toMap)
            }
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit = capture(qe)
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = capture(qe)
        })
      listenerInstalled = true
    }
  }

  /** Attach record-count (+ optional byte-count) observation to a
    * frame; metrics appear under `graft.<component>` after the next
    * action (commonmetric.go recordCount/recordBytes).
    */
  def observe(df: DataFrame, component: String, withBytes: Boolean = false): DataFrame = {
    install(df.sparkSession)
    val name = s"graft.$component"
    if (withBytes)
      df.observe(name, count(lit(1)).as("record_count"),
        coalesce(sum(octet_length(to_json(struct(df.columns.map(col).toIndexedSeq: _*)))),
          lit(0L)).as("record_bytes"))
    else df.observe(name, count(lit(1)).as("record_count"))
  }

  /** Last observed metrics for a component (empty until an action ran). */
  def lastObserved(component: String): Map[String, Long] =
    Option(observed.get(s"graft.$component")).getOrElse(Map.empty)

  /** Driver-side counters for one component instance. */
  class Component(spark: SparkSession, component: String) extends Serializable {
    val retryCount = spark.sparkContext.longAccumulator(s"graft.$component.retry_count")
    val processDurationMs =
      spark.sparkContext.longAccumulator(s"graft.$component.process_duration_ms")

    def timed[T](f: => T): T = {
      val t0 = System.nanoTime
      try f finally processDurationMs.add((System.nanoTime - t0) / 1000000)
    }

    /** Retry wrapper that counts attempts (commonmetric retryCount). */
    def retry[T](maxAttempts: Int = 3, backoffMs: Long = 1000L)(f: => T): T =
      Retry(maxAttempts, backoffMs, onRetry = () => retryCount.add(1))(f)
  }
}
