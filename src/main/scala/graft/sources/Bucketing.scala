package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table helpers for shuffle-free co-located joins.
  *
  * At 100 TB, a fact⋈fact join on the same key repeated across a
  * pipeline should not shuffle per query: write both sides bucketed by
  * the join key and Spark's bucketed scan provides the required
  * hash-partitioning for free (no Exchange in the join plan — pinned
  * by BucketingSpec).
  */
object Bucketing {

  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      buckets: Int,
      sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
    sortCol.map(w.sortBy(_)).getOrElse(w)
      .format("parquet").saveAsTable(table)
  }

  /** Join two same-bucketed tables on the bucket key. */
  def bucketedJoin(
      spark: org.apache.spark.sql.SparkSession,
      left: String,
      right: String,
      key: String,
      joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)
}
