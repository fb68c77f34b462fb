package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record + in-band metadata model.
  *
  * The reference carries metadata as specially prefixed keys inside each
  * record (default prefix `__METADATA__`, see reference
  * internal/config/config.go:10 and
  * internal/component/common/common.go:267-290). In Spark, metadata fields
  * are ordinary columns carrying the same prefix; all helpers below are
  * pure DataFrame transforms so Catalyst can prune/pushdown through them.
  */
object Meta {
  val DefaultPrefix = "__METADATA__"

  val RecordIndexCol = s"${DefaultPrefix}record_index"
  val BatchIndexCol = s"${DefaultPrefix}connector_batch_index"
  val FilenameCol = s"${DefaultPrefix}filename"
  val RecordTotalCountCol = s"${DefaultPrefix}record_total_count"

  /** Default connector batch size (reference internal/config/config.go:20). */
  val DefaultBatchSize = 512

  def metaCols(df: DataFrame, prefix: String = DefaultPrefix): Seq[String] =
    df.columns.toSeq.filter(_.startsWith(prefix))

  def dataCols(df: DataFrame, prefix: String = DefaultPrefix): Seq[String] =
    df.columns.toSeq.filterNot(_.startsWith(prefix))

  /** RecordWithoutMetadata (common.go:279-290): drop every metadata column. */
  def stripMetadata(df: DataFrame, prefix: String = DefaultPrefix): DataFrame =
    df.drop(metaCols(df, prefix): _*)

  /** RecordWithMetadata (common.go:267-277): prefix every column. */
  def withMetadataPrefix(df: DataFrame, prefix: String = DefaultPrefix): DataFrame =
    df.select(df.columns.map(c => col(c).as(prefix + c)).toIndexedSeq: _*)

  /** A "specialized metadata record" is a record whose keys are ALL
    * metadata-prefixed (reference common.go:261-263, RFC 009). Sinks skip
    * them as data. In a DataFrame the row-level equivalent is: every
    * non-meta column is null.
    */
  def isSpecializedMetadataRecord(df: DataFrame, prefix: String = DefaultPrefix): Column = {
    val dc = dataCols(df, prefix)
    if (dc.isEmpty) lit(true)
    else dc.map(c => col(c).isNull).reduce(_ && _)
  }

  /** Split a frame into (data records, specialized metadata records) —
    * the Spark shape of the reference's in-stream metadata routing
    * (connector.go:78-88): metadata travels out-of-band as a second,
    * small DataFrame.
    */
  def splitSpecializedMetadata(
      df: DataFrame,
      prefix: String = DefaultPrefix): (DataFrame, DataFrame) = {
    val isMeta = isSpecializedMetadataRecord(df, prefix)
    (df.filter(!isMeta), df.filter(isMeta))
  }

  /** Stamp `__METADATA__record_index` — the reference's per-source
    * monotonically increasing counter (source.go:86-91). Exact sequential
    * semantics need a total order; callers pass the ordering columns.
    *
    * Scale note: this variant uses a single global `row_number` window,
    * which funnels all data through ONE partition — acceptable only for
    * small/medium inputs. At scale use [[withRecordIndexDistributed]],
    * which produces identical indices via the two-pass partition-offset
    * technique (range-partition + per-partition numbering + offsets) with
    * no single-task bottleneck.
    */
  def withRecordIndex(df: DataFrame, orderBy: Seq[Column]): DataFrame = {
    // For a deterministic, oracle-checkable index we sort by the given
    // keys; Spark's range partitioner keeps this parallel at scale.
    val w = Window.orderBy(orderBy: _*)
    df.withColumn(RecordIndexCol, row_number().over(w).cast("long") - 1L)
  }

  /** Scale-path variant: index is unique + monotonic per partition but not
    * globally sequential (reference semantics only require monotonicity
    * per source). No shuffle, no single-partition funnel.
    */
  def withMonotonicIndex(df: DataFrame): DataFrame =
    df.withColumn(RecordIndexCol, monotonically_increasing_id())

  /** Exact sequential index WITHOUT the single-partition window funnel:
    * range-partition + sort by the order keys, then `zipWithIndex`
    * (which computes per-partition counts in one extra lightweight job
    * and assigns offsets — the classic two-pass technique). Produces
    * the same indices as [[withRecordIndex]]; use this form when the
    * input doesn't fit one task.
    */
  def withRecordIndexDistributed(
      df: DataFrame,
      orderBy: Seq[Column],
      partitions: Int = 0): DataFrame = {
    val n = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(n, orderBy: _*)
      .sortWithinPartitions(orderBy: _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        RecordIndexCol, org.apache.spark.sql.types.LongType, nullable = false))
    val indexed = sorted.rdd.zipWithIndex().map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ i)
    }
    df.sparkSession.createDataFrame(indexed, schema)
  }

  /** `__METADATA__connector_batch_index` = recordIndex / batchSize
    * (reference connector.go:90-91, default 512). Requires record index.
    */
  def withBatchIndex(df: DataFrame, batchSize: Int = DefaultBatchSize): DataFrame =
    df.withColumn(BatchIndexCol, floor(col(RecordIndexCol) / batchSize).cast("long"))

  /** `__METADATA__record_total_count` (reference MC reader
    * client_reader.go:166): total result count stamped on every record.
    * A cross-join with a 1-row count aggregate — Catalyst broadcasts it.
    */
  def withRecordTotalCount(df: DataFrame): DataFrame =
    df.crossJoin(broadcast(df.groupBy().agg(
      count(lit(1)).as(RecordTotalCountCol))))
}
