package graft

import org.apache.spark.sql.functions._
import graft.model.Meta

class MetaSpec extends SparkSuite {
  import spark.implicits._

  private def sample = Seq(
    (1L, "alice", 34L), (2L, "bob", 28L), (3L, "carol", 41L)
  ).toDF("id", "name", "age")

  test("withMetadataPrefix prefixes every column; stripMetadata removes them") {
    val m = Meta.withMetadataPrefix(sample)
    assert(m.columns.toSeq == Seq("__METADATA__id", "__METADATA__name", "__METADATA__age"))
    val mixed = sample.withColumn(Meta.FilenameCol, lit("in.json"))
    assert(Meta.stripMetadata(mixed).columns.toSeq == Seq("id", "name", "age"))
    assert(Meta.metaCols(mixed) == Seq(Meta.FilenameCol))
    assert(Meta.dataCols(mixed) == Seq("id", "name", "age"))
  }

  test("record index is sequential and batch index = idx/batchSize") {
    val df = Meta.withBatchIndex(
      Meta.withRecordIndex(sample, Seq(col("id"))), batchSize = 2)
    val rows = df.orderBy("id")
      .select(Meta.RecordIndexCol, Meta.BatchIndexCol)
      .as[(Long, Long)].collect().toSeq
    assert(rows == Seq((0L, 0L), (1L, 0L), (2L, 1L)))
  }

  test("distributed record index equals the window form exactly") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val viaWindow = Meta.withRecordIndex(docs, Seq(col("doc_id")))
      .select("doc_id", Meta.RecordIndexCol).as[(Long, Long)].collect().sorted
    val viaZip = Meta.withRecordIndexDistributed(docs, Seq(col("doc_id")), 8)
      .select("doc_id", Meta.RecordIndexCol).as[(Long, Long)].collect().sorted
    assert(viaWindow.toSeq == viaZip.toSeq)
  }

  test("specialized metadata record split (RFC 009)") {
    // a record where every data column is null is the row-shape of a
    // pure-metadata record
    val df = sample
      .withColumn(Meta.RecordTotalCountCol, lit(100L))
      .unionByName(
        Seq((100L)).toDF(Meta.RecordTotalCountCol)
          .withColumn("id", lit(null: java.lang.Long))
          .withColumn("name", lit(null: String))
          .withColumn("age", lit(null: java.lang.Long)),
        allowMissingColumns = true)
    val (data, meta) = Meta.splitSpecializedMetadata(df)
    assert(data.count() == 3)
    assert(meta.count() == 1)
    assert(meta.select(Meta.RecordTotalCountCol).as[Long].head() == 100L)
  }
}
