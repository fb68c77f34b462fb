package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.model.Meta

/** PostgreSQL sink (reference K7, ext/postgresql/sink.go:35-191).
  *
  * Reference contract reproduced Spark-first:
  *  - records buffer in batches of 512 (sink.go:50), each batch is
  *    converted JSON→CSV and shipped as one
  *    `COPY table(cols) FROM STDIN DELIMITER ',' CSV HEADER;`
  *    statement (sink.go:175-182);
  *  - before the first batch the CSV header is validated against the
  *    live table columns: every header field must match a table column
  *    case-insensitively, missing table columns only warn
  *    (util.go:15-36);
  *  - `preSQLScript` runs once on connect (sink.go:56-59);
  *  - dry-run skips the COPY and only checks endpoint connectivity
  *    (sink.go:184-189 → internal/ext/net/check.go:11-49).
  *
  * Spark shape: the row→CSV projection is part of the plan (strings are
  * produced by codegen'd `cast`/`to_json`/`go_float_str` columns); the
  * imperative part is only the per-partition batch loop. The transport
  * is injected (`PgClientFactory`) so the distributed plumbing is
  * testable offline; a real deployment implements `copy` over the
  * PostgreSQL wire protocol's CopyIn and `tableColumns` over
  * information_schema (util.go:39-70).
  */
object PgSink {

  /** Transport: one per driver (preSQL + schema fetch) and one per
    * partition (COPY batches). Implementations must be Serializable —
    * factories are constructed on the driver and shipped to executors.
    */
  trait PgClient extends Serializable {
    /** Run a SQL statement (preSQLScript). */
    def exec(sql: String): Unit = ()
    /** Column names of `table`, in ordinal position (util.go:39-70). */
    def tableColumns(table: String): Seq[String]
    /** Ship one CSV batch (header line included) for `copySql`. */
    def copy(copySql: String, csvPayload: String): Long
    /** Dry-run connectivity probe (check.go:11-49). */
    def connCheck(): Unit = ()
    def close(): Unit = ()
  }

  trait PgClientFactory extends Serializable {
    def create(): PgClient
  }

  case class Spec(
      table: String,
      preSql: Option[String] = None,
      batchSize: Int = 512, // sink.go:50
      /** Go-style float rendering — the reference path goes JSON
        * marshal → CSV, so floats carry Go's shortest-round-trip form.
        */
      goFloatFormat: Boolean = true,
      dryRun: Boolean = false)

  def copyStatement(table: String, columns: Seq[String]): String =
    s"COPY $table(${columns.mkString(",")}) FROM STDIN DELIMITER ',' CSV HEADER;"

  /** util.go:15-36: every CSV header field must name a table column
    * (case-insensitive); a count mismatch is only a warning (missing
    * columns get null/default on the PG side).
    */
  def checkSchemaValidity(tableColumns: Seq[String], headers: Seq[String]): Unit = {
    val tableSet = tableColumns.map(_.toLowerCase).toSet
    headers.find(h => !tableSet.contains(h.toLowerCase)).foreach { h =>
      sys.error(s"field '$h' does not match any column in the table")
    }
  }

  /** Quote a CSV field the way Go's encoding/csv does: quote when the
    * value contains the delimiter, a quote, CR/LF, or leads with a
    * space; escape quotes by doubling. null → unquoted empty (PG CSV
    * NULL).
    */
  private[sinks] def csvField(v: String): String =
    if (v == null) ""
    else if (v.nonEmpty &&
      (v.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r')
        || v.head == ' ' || v.head == '\t'))
      "\"" + v.replace("\"", "\"\"") + "\""
    else v

  def write(df0: DataFrame, spec: Spec, factory: PgClientFactory): Unit = {
    val (data, _) = Meta.splitSpecializedMetadata(df0) // sink.go:78-81
    val stripped = Meta.stripMetadata(data) // RecordWithoutMetadata, sink.go:91
    if (spec.goFloatFormat) graft.functions.GoFloatString.register(df0.sparkSession)
    val csvReady = FileSink.flattenForCsv(stripped, spec.goFloatFormat)
    val columns = csvReady.columns.toSeq

    // driver-side: preSQL once, then schema validation against the
    // live table (first-flush work in the reference, hoisted because
    // the schema is static under Spark)
    val driverClient = factory.create()
    val proceed =
      try {
        spec.preSql.foreach(driverClient.exec)
        checkSchemaValidity(driverClient.tableColumns(spec.table), columns)
        if (spec.dryRun) { driverClient.connCheck(); false } else true
      } finally driverClient.close()
    if (!proceed) return

    val copySql = copyStatement(spec.table, columns)
    val headerLine = columns.map(csvField).mkString(",")
    val batchSize = spec.batchSize
    // all value formatting happens in the plan (codegen); the loop
    // below is string-append only
    val asStrings =
      csvReady.select(columns.map(c => col(s"`$c`").cast("string")).toIndexedSeq: _*)
    asStrings.foreachPartition { (rows: Iterator[Row]) =>
      val client = factory.create()
      try rows.grouped(batchSize).foreach { chunk =>
        val sb = new StringBuilder(headerLine)
        sb += '\n'
        chunk.foreach { r =>
          var i = 0
          while (i < r.length) {
            if (i > 0) sb += ','
            sb ++= csvField(if (r.isNullAt(i)) null else r.getString(i))
            i += 1
          }
          sb += '\n'
        }
        client.copy(copySql, sb.toString)
      } finally client.close()
    }
  }
}
