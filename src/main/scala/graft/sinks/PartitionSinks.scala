package graft.sinks

import org.apache.spark.sql.{DataFrame, ForeachWriter, Row}
import org.apache.spark.sql.functions._

import graft.model.Meta
import graft.transform.Template

/** Row/partition-scoped sinks (reference K5 SFTP, K6 SMTP, K8 Redis,
  * K9 HTTP, K10 Kafka): side-effecting writers that cannot be a plain
  * `DataFrameWriter`.
  *
  * Spark-first design:
  *  - per-record dynamic config (templated endpoint/key/recipient) is
  *    compiled ONCE to Columns and evaluated as ordinary projection —
  *    the hot path stays codegen'd; only the final emit is imperative;
  *  - records are grouped by their compiled config (the reference
  *    md5-groups per-record configs, ext/http/sink.go:306-314) with a
  *    `groupBy` — one shuffle on small config keys;
  *  - the external client is injected (`ClientFactory`), so transports
  *    are swappable and the distributed plumbing is testable without a
  *    network. Factories must be Serializable: they are constructed on
  *    the driver and shipped to executors.
  *  - per-partition batching (Redis MSET 2*batch, HTTP batch, PG COPY
  *    512) happens inside the writer with bounded buffers.
  */
object PartitionSinks {

  /** A transport client: receives (groupKey, payload batch). */
  trait BatchClient extends Serializable {
    def send(group: String, batch: Seq[String]): Unit
    def close(): Unit = ()
  }

  trait ClientFactory extends Serializable {
    def create(): BatchClient
  }

  /** Generic grouped-batch emit: compile `groupTemplate` per record,
    * serialize the record payload to JSON, group, then send batches of
    * `batchSize` per group from each partition.
    *
    * This is the common core of the HTTP sink (group = endpoint), the
    * Redis sink (group = key prefix; batch = MSET), the SMTP sink
    * (group = compiled email header hash) and the Kafka sink
    * (group = topic).
    */
  def writeGrouped(
      df0: DataFrame,
      groupTemplate: String,
      factory: ClientFactory,
      batchSize: Int = 512,
      stripMeta: Boolean = true): Unit = {
    val (data, _) = Meta.splitSpecializedMetadata(df0)
    val groupCol = Template.compile(groupTemplate)
    val payloadSource = if (stripMeta) Meta.stripMetadata(data) else data
    val payload = to_json(struct(payloadSource.columns.map(col).toIndexedSeq: _*))
    val routed = data.select(groupCol.as("__group"), payload.as("__payload"))
    // co-locate each group in one task so per-group batching is exact;
    // a shuffle on the (small) group key only
    routed.repartition(col("__group")).foreachPartition {
      (rows: Iterator[Row]) =>
        val client = factory.create()
        try {
          val buf = scala.collection.mutable.Map
            .empty[String, scala.collection.mutable.ArrayBuffer[String]]
          rows.foreach { r =>
            val g = r.getString(0)
            val b = buf.getOrElseUpdate(g, scala.collection.mutable.ArrayBuffer.empty)
            b += r.getString(1)
            if (b.size >= batchSize) { client.send(g, b.toSeq); b.clear() }
          }
          buf.foreach { case (g, b) => if (b.nonEmpty) client.send(g, b.toSeq) }
        } finally client.close()
    }
  }

  /** Redis-shaped sink (K8): templated key and value per record,
    * MSET batches of 2*batchSize strings (ext/redis/sink.go:118-170).
    */
  def writeKeyValue(
      df0: DataFrame,
      keyTemplate: String,
      valueTemplate: Option[String],
      factory: ClientFactory,
      batchSize: Int = 512): Unit = {
    val (data, _) = Meta.splitSpecializedMetadata(df0)
    val keyCol = Template.compile(keyTemplate)
    val valCol = valueTemplate.map(Template.compile).getOrElse(
      to_json(struct(Meta.stripMetadata(data).columns.map(col).toIndexedSeq: _*)))
    data.select(keyCol.as("__k"), valCol.as("__v"))
      .foreachPartition { (rows: Iterator[Row]) =>
        val client = factory.create()
        try rows.grouped(batchSize).foreach { chunk =>
          client.send("", chunk.flatMap(r => Seq(r.getString(0), r.getString(1))).toSeq)
        } finally client.close()
      }
  }

  /** Kafka sink (K10): one JSON message per record. With a real broker
    * use `kafkaWriter(df).save()`; `factory` variant for offline tests.
    */
  def kafkaPlan(df: DataFrame, topic: String, bootstrap: String) =
    df.selectExpr("CAST(null AS STRING) AS key", "to_json(struct(*)) AS value")
      .write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)

  /** Streaming foreach writer wrapping a BatchClient (per-row emit —
    * the reference HTTP sink with BATCH_SIZE=1). Expects a single
    * string column (serialize upstream with `to_json(struct(*))`).
    */
  def rowWriter(factory: ClientFactory, group: String): ForeachWriter[Row] =
    new ForeachWriter[Row] {
      @transient private var client: BatchClient = _
      override def open(partitionId: Long, epochId: Long): Boolean = {
        client = factory.create(); true
      }
      override def process(value: Row): Unit =
        client.send(group, Seq(value.getString(0)))
      override def close(errorOrNull: Throwable): Unit =
        if (client != null) client.close()
    }
}
