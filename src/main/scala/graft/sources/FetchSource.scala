package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.util.Retry

/** Driver-side-fetch sources (reference S5 Salesforce, S6 Gmail, S7
  * Google Analytics, S8 HTTP): external APIs whose pagination is
  * inherently sequential/driver-bound. The reference streams pages on
  * goroutines; the Spark shape is: fetch pages on the driver (with
  * retry + bounded concurrency), then parallelize the accumulated
  * NDJSON into a DataFrame. Parallelism applies from the first
  * transform onward — appropriate because these APIs cap page sizes
  * (SOQL 2000 rows, GA 100k) far below cluster scale.
  *
  * A `PageFetcher` abstracts the transport (REST/OAuth/etc.) so the
  * engine side is testable offline.
  */
object FetchSource {

  /** Fetch one page: returns (ndjson lines, next page token). */
  trait PageFetcher {
    def fetch(pageToken: Option[String]): (Seq[String], Option[String])
  }

  /** Pull all pages through the fetcher, then parallelize.
    *
    * @param maxPages   safety bound (the reference's HTTP source has a
    *                   pagination TODO, ext/http/source.go:104-106 —
    *                   we bound instead)
    */
  def read(
      spark: SparkSession,
      fetcher: PageFetcher,
      maxPages: Int = 10000,
      retries: Int = 3): DataFrame = {
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    var token: Option[String] = None
    var pages = 0
    var done = false
    while (!done && pages < maxPages) {
      val (batch, next) = Retry(retries)(fetcher.fetch(token))
      lines ++= batch
      pages += 1
      token = next
      done = next.isEmpty
    }
    parallelizeNdjson(spark, lines.toSeq)
  }

  /** NDJSON lines → DataFrame with inferred (union-of-keys) schema —
    * the reference's universal interchange format (pkg/flow/flow.go).
    */
  def parallelizeNdjson(spark: SparkSession, lines: Seq[String]): DataFrame = {
    import spark.implicits._
    val ds: Dataset[String] = spark.createDataset(lines)
    spark.read.json(ds)
  }
}
