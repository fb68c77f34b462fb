package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Meta

/** File-family source (reference ext/file/source.go:28-137, ext/oss/source.go:35-163).
  *
  * Reads NDJSON / CSV / TSV / TXT files or directories (recursive) and
  * attaches the source filename as `__METADATA__filename`. Format is
  * chosen by extension like the reference's dispatch
  * (ext/oss/source.go:110-133); CRLF normalization
  * (internal/ext/io/normalized_reader.go) is native to Spark's readers
  * (`multiLine=false` line splitting handles \r\n).
  *
  * Scale notes: `spark.read.json/csv` parallelizes by input split; a
  * directory of files becomes a union-all by construction, matching the
  * reference's concat semantics (ext/file/source.go:83-114). Filters and
  * pruning push into the scan for parquet; for text formats Spark still
  * splits large files by range.
  */
object FileSource {

  sealed trait Format { def extensions: Seq[String] }
  case object Json extends Format { val extensions = Seq("json", "ndjson", "jsonl") }
  case object Csv extends Format { val extensions = Seq("csv") }
  case object Tsv extends Format { val extensions = Seq("tsv") }
  case object Txt extends Format { val extensions = Seq("txt") }
  case object Parquet extends Format { val extensions = Seq("parquet") }
  case object Orc extends Format { val extensions = Seq("orc") }
  case object Xml extends Format { val extensions = Seq("xml") }

  def formatOf(path: String): Format = {
    val ext = path.reverse.takeWhile(_ != '.').reverse.toLowerCase
    Seq(Json, Csv, Tsv, Txt, Parquet, Orc, Xml).find(_.extensions.contains(ext)).getOrElse(Json)
  }

  /** Read a file/dir; attach filename metadata column.
    *
    * @param skipHeader CSV/TSV: treat the first row as header (reference
    *                   `FILE__CSV_SKIP_HEADER`). When false, columns get
    *                   positional names "0","1",... (csv2json.go:69-78).
    * @param skipRows   additional leading rows to drop per file
    *                   (csv2json.go:40-54).
    */
  def read(
      spark: SparkSession,
      path: String,
      format: Option[Format] = None,
      skipHeader: Boolean = true,
      skipRows: Int = 0,
      filenameColumn: Option[String] = Some(Meta.FilenameCol)): DataFrame = {
    val fmt = format.getOrElse(formatOf(path))
    val base = fmt match {
      case Json => spark.read.option("recursiveFileLookup", "true").json(path)
      case Parquet => spark.read.option("recursiveFileLookup", "true").parquet(path)
      case Csv | Tsv =>
        val sep = if (fmt == Tsv) "\t" else ","
        val rdr = spark.read
          .option("recursiveFileLookup", "true")
          .option("sep", sep)
          .option("header", skipHeader.toString)
          .option("inferSchema", "false")
        val df = rdr.csv(path)
        // positional "0","1",... names when headerless (csv2json.go:69-78)
        if (!skipHeader)
          df.toDF(df.columns.indices.map(_.toString): _*)
        else df
      case Txt => spark.read.option("recursiveFileLookup", "true").text(path)
      case Orc => spark.read.option("recursiveFileLookup", "true").orc(path)
      case Xml => spark.read.option("recursiveFileLookup", "true")
        .option("rowTag", "row").xml(path)
    }
    val withSkip =
      if (skipRows <= 0) base
      else {
        // Drop the first `skipRows` rows *per file* — the reference skips
        // rows per input file (csv2json.go:40-54). Window by filename over
        // a monotonic id preserves encounter order within each file.
        val w = Window
          .partitionBy(input_file_name())
          .orderBy(monotonically_increasing_id())
        base
          .withColumn("__graft_rn", row_number().over(w))
          .filter(col("__graft_rn") > skipRows)
          .drop("__graft_rn")
      }
    filenameColumn match {
      case Some(c) => withSkip.withColumn(c, input_file_name())
      case None => withSkip
    }
  }
}

/** Convenience reader for the driver-provided TPC-H-ish parquet tables. */
object Tables {
  val all = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
