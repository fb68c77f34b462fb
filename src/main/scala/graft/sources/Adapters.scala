package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Meta

/** Concrete fetch adapters (reference S5 Salesforce, S6 Gmail, S7
  * Google Analytics): the provider-specific pagination/decode contracts
  * over injectable transports. The generic page loop lives in
  * [[FetchSource]]; these encode each API's envelope exactly as the
  * reference does, so a user can swap `--from=SF|GMAIL|GA` and get the
  * same record stream. Fetching is driver-side by design — these APIs
  * cap page sizes far below cluster scale; parallelism applies from the
  * first transform on the parallelized result.
  */
object Salesforce {

  /** One SOQL query result page (simpleforce.QueryResult shape). */
  case class QueryResult(
      totalSize: Int,
      done: Boolean,
      nextRecordsUrl: String,
      records: Seq[String]) // records as NDJSON lines

  trait Client extends Serializable {
    /** Run a SOQL query OR fetch a next-records URL (the reference
      * passes both through the same entry, source.go:67,110).
      */
    def query(soqlOrUrl: String, includeDeleted: Boolean): QueryResult
  }

  /** SOQL pagination (ext/salesforce/source.go:64-151): the initial
    * result's `NextRecordsURL` ends in `-<batchSize>`; subsequent pages
    * are fetched by rewriting that suffix to each offset
    * (source.go:80-90, 104-106).
    */
  def read(
      spark: SparkSession,
      client: Client,
      soqlQuery: String,
      includeDeleted: Boolean = false): DataFrame = {
    val first = client.query(soqlQuery, includeDeleted)
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    lines ++= first.records
    if (first.nextRecordsUrl.nonEmpty && first.totalSize > 0) {
      val url = first.nextRecordsUrl
      val cut = url.lastIndexOf('-')
      require(cut >= 0, s"unexpected next records URL: $url")
      val batchSize = url.substring(cut + 1).toInt
      val urlTemplate = url.substring(0, cut) + "-%d"
      var i = batchSize
      while (i < first.totalSize) {
        lines ++= client.query(urlTemplate.format(i), includeDeleted).records
        i += batchSize
      }
    }
    FetchSource.parallelizeNdjson(spark, lines.toSeq)
  }
}

/** Gmail attachment source (ext/gmail/source.go:64-162): list messages
  * by filter, walk payload parts with filenames, download + base64-url
  * decode each attachment, convert csv/tsv to records (json passes
  * through), stamp the filename column.
  */
object Gmail {

  case class Part(filename: String, attachmentId: String)
  case class Message(id: String, parts: Seq[Part])

  trait Service extends Serializable {
    def listMessages(filterRules: String): Seq[String] // message ids
    def getMessage(id: String): Message
    /** Returns the attachment's base64url-encoded data (gmail API shape). */
    def getAttachment(messageId: String, attachmentId: String): String
  }

  def read(
      spark: SparkSession,
      service: Service,
      filterRules: String,
      filenameColumn: String = Meta.FilenameCol,
      csvDelimiter: Char = ','): DataFrame = {
    val frames = for {
      id <- service.listMessages(filterRules)
      part <- service.getMessage(id).parts
      if part.filename.nonEmpty // parts without filenames are skipped (source.go:103-106)
    } yield {
      val data = java.util.Base64.getUrlDecoder.decode(
        service.getAttachment(id, part.attachmentId))
      // NormalizeLineEndingReader (source.go:123): CRLF → LF
      val text = new String(data, "UTF-8").replace("\r\n", "\n")
      val ext = part.filename.substring(part.filename.lastIndexOf('.') + 1).toLowerCase
      val lines = ext match {
        case "csv" => csvToJsonLines(text, csvDelimiter)
        case "tsv" => csvToJsonLines(text, '\t')
        case _ => text.linesIterator.filter(_.nonEmpty).toSeq // json & default
      }
      FetchSource.parallelizeNdjson(spark, lines)
        .withColumn(filenameColumn, lit(part.filename))
    }
    frames.reduceOption(_.unionByName(_, allowMissingColumns = true))
      .getOrElse(spark.emptyDataFrame)
  }

  /** In-memory CSV→NDJSON (fileconverter/csv2json.go:16-99): first row
    * is the header, every value stays a JSON string.
    */
  private[graft] def csvToJsonLines(text: String, delimiter: Char): Seq[String] = {
    val rows = parseCsv(text, delimiter)
    if (rows.isEmpty) return Nil
    val headers = rows.head
    rows.tail.map { row =>
      headers.zip(row).map { case (h, v) =>
        jsonStr(h) + ":" + jsonStr(v)
      }.mkString("{", ",", "}")
    }
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** RFC-4180-ish parse (quotes, doubled-quote escapes). */
  private def parseCsv(text: String, sep: Char): Seq[Seq[String]] = {
    val rows = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    val row = scala.collection.mutable.ArrayBuffer.empty[String]
    val field = new StringBuilder
    var inQuotes = false
    var i = 0
    def endField(): Unit = { row += field.toString; field.clear() }
    def endRow(): Unit = {
      endField()
      // only pure blank lines vanish (Go's csv reader skips them);
      // a genuine ",," row of empty fields is kept
      if (row.size > 1 || row.exists(_.nonEmpty)) rows += row.toSeq
      row.clear()
    }
    while (i < text.length) {
      val c = text(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < text.length && text(i + 1) == '"') { field += '"'; i += 1 }
          else inQuotes = false
        } else field += c
      } else c match {
        case '"' => inQuotes = true
        case `sep` => endField()
        case '\n' => endRow()
        case '\r' => // normalized upstream; ignore strays
        case other => field += other
      }
      i += 1
    }
    if (field.nonEmpty || row.nonEmpty) endRow()
    rows.toSeq
  }
}

/** Google Analytics runReport source (ext/googleanalytics/source.go:55-131):
  * limit/offset paging driven by the first response's rowCount; every
  * dimension and metric value lands as a STRING column named after its
  * header (source.go:83-96).
  */
object GoogleAnalytics {

  case class Report(
      rowCount: Long,
      dimensionHeaders: Seq[String],
      metricHeaders: Seq[String],
      rows: Seq[(Seq[String], Seq[String])]) // (dimensionValues, metricValues)

  trait Client extends Serializable {
    def runReport(
        propertyId: String,
        startDate: String,
        endDate: String,
        dimensions: Seq[String],
        metrics: Seq[String],
        limit: Long,
        offset: Long): Report
  }

  def read(
      spark: SparkSession,
      client: Client,
      propertyId: String,
      startDate: String,
      endDate: String,
      dimensions: Seq[String],
      metrics: Seq[String],
      batchSize: Long = 10000L): DataFrame = {
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    var rowCount = -1L
    var offset = 0L
    var headers: Seq[String] = dimensions ++ metrics
    while (rowCount < 0 || offset < rowCount) {
      val resp = client.runReport(
        propertyId, startDate, endDate, dimensions, metrics, batchSize, offset)
      if (rowCount < 0) rowCount = resp.rowCount // only update once (source.go:77-80)
      headers = resp.dimensionHeaders ++ resp.metricHeaders
      resp.rows.foreach { case (dims, mets) =>
        lines += headers.zip(dims ++ mets).map { case (h, v) =>
          "\"" + h.replace("\"", "\\\"") + "\":\"" + v.replace("\"", "\\\"") + "\""
        }.mkString("{", ",", "}")
      }
      offset += batchSize
    }
    if (lines.isEmpty) spark.emptyDataFrame
    else {
      // keep every column a string (the API returns strings; inference
      // must not coerce metric strings to numbers)
      val df = FetchSource.parallelizeNdjson(spark, lines.toSeq)
      df.select(headers.filter(df.columns.contains)
        .map(h => col(s"`$h`").cast("string").as(h)).toIndexedSeq: _*)
    }
  }
}
