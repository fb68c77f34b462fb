package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

import graft.model.Meta
import graft.transform.Template

/** File-family sink (reference ext/file/sink.go:30-128 + the fs write
  * handler internal/ext/fs/write_handler.go).
  *
  * Semantics reproduced Spark-first:
  *  - destination URI may be a `[[ ]]` template over record fields
  *    (D10); records route to their compiled destination (D17 grouped
  *    write) via a computed partition column + `partitionBy` — fully
  *    distributed, no per-key writer map needed;
  *  - metadata columns are stripped before writing (D12) and
  *    specialized metadata records are skipped (D13) — both handled by
  *    column pruning / a null-guard filter;
  *  - output formats json (NDJSON — Spark's native JSON shape), csv,
  *    tsv, txt chosen by extension (D19/D21 dispatch); nested
  *    values are inlined as JSON strings in CSV, matching
  *    json2csv.go:104-148;
  *  - gzip compression (D22) via the writer option; zip/tar.gz belong
  *    to a driver-side post-pass (no distributed primitive exists);
  *  - chunking (D18, 64 MiB flush) maps to `maxRecordsPerFile` /
  *    `spark.sql.files.maxPartitionBytes` — Spark spills and rolls
  *    files natively.
  */
object FileSink {

  case class Spec(
      destinationUri: String,
      format: Option[String] = None, // json|csv|tsv|txt (default: by extension)
      header: Boolean = true,
      compression: Option[String] = None, // gzip|none
      maxRecordsPerFile: Long = 0L,
      jsonPath: Option[String] = None,
      stripMetadata: Boolean = true,
      /** Byte-compatible float rendering in CSV/TSV (reference
        * json2csv.go:125-134) via the codegen'd [[graft.functions.GoFloatString]]. */
      goFloatFormat: Boolean = false,
      mode: SaveMode = SaveMode.Overwrite)

  private[sinks] def formatOf(spec: Spec): String =
    spec.format.getOrElse {
      // drop [[ ]] template sections before reading the extension, so
      // "out_[[ .g ]].xlsx" dispatches on .xlsx, not on the prefix
      val uri = spec.destinationUri.replaceAll("\\[\\[.*?\\]\\]", "")
      val ext = uri.reverse.takeWhile(c => c != '.' && c != '/').reverse.toLowerCase
      ext match {
        case "csv" => "csv"
        case "tsv" => "tsv"
        case "txt" => "txt"
        case "xlsx" => "xlsx"
        case "parquet" => "parquet"
        case "orc" => "orc"
        case "xml" => "xml"
        case _ => "json"
      }
    }

  /** Stringify nested columns for CSV output (json2csv.go:104-148:
    * arrays/objects re-serialized as JSON strings).
    */
  private[sinks] def flattenForCsv(df: DataFrame, goFloats: Boolean = false): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: StructType | _: ArrayType | _: MapType => to_json(col(f.name)).as(f.name)
        case org.apache.spark.sql.types.DoubleType | org.apache.spark.sql.types.FloatType
            if goFloats =>
          expr(s"go_float_str(`${f.name}`)").as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Write `df` per the spec. Returns the list of destination group
    * values when the URI was templated (for driver-side post-steps like
    * archiving or SMTP attachment per group).
    */
  private val DestCol = "__graft_dest"

  def write(df0: DataFrame, spec: Spec): Seq[String] = {
    val (dataRecords, _) = Meta.splitSpecializedMetadata(df0)
    // Templated destinations compile against the FULL record — metadata
    // included (the reference renders `[[ .__METADATA__... ]]` routes
    // before RecordWithoutMetadata strips the payload) — so the routing
    // column is stamped before the metadata strip.
    val dyn = Template.isDynamic(spec.destinationUri)
    val destStamped =
      if (dyn) dataRecords.withColumn(DestCol, Template.compile(spec.destinationUri))
      else dataRecords
    val stripped = if (spec.stripMetadata) Meta.stripMetadata(destStamped) else destStamped
    // D11: project each outgoing record through a JSONPath before write
    val df1 = spec.jsonPath match {
      case Some(p) => graft.transform.JsonPath.select(
        stripped, p, keep = if (dyn) Seq(DestCol) else Nil)
      case None => stripped
    }
    val fmt = formatOf(spec)
    if (spec.goFloatFormat) graft.functions.GoFloatString.register(df0.sparkSession)
    val df = if (fmt == "csv" || fmt == "tsv")
      flattenForCsv(df1, spec.goFloatFormat)
    else df1

    def writer(d: DataFrame) = {
      val w = d.write.mode(spec.mode)
      val w1 = spec.compression.filter(_ != "none")
        .map(c => w.option("compression", c)).getOrElse(w)
      if (spec.maxRecordsPerFile > 0)
        w1.option("maxRecordsPerFile", spec.maxRecordsPerFile)
      else w1
    }

    if (!Template.isDynamic(spec.destinationUri)) {
      val out = spec.destinationUri
      fmt match {
        case "xlsx" =>
          // D21: single-file OOXML export (no chunking, like the reference)
          Xlsx.writeDataFrame(flattenForCsv(df), out)
        case "json" => writer(df).json(out)
        case "parquet" => writer(df).parquet(out)
        case "orc" => writer(df).orc(out)
        case "xml" => writer(df)
          .option("rowTag", "row").option("rootTag", "rows").xml(out)
        case "csv" => writer(df).option("header", spec.header).csv(out)
        case "tsv" =>
          writer(df).option("header", spec.header).option("sep", "\t").csv(out)
        case "txt" =>
          // single string column expected, like the reference txt output
          val single =
            if (df.columns.length == 1) df
            else df.select(to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("value"))
          writer(single.select(col(single.columns.head).cast("string"))).text(out)
      }
      Seq(out)
    } else {
      // Templated destination (D17): the routing column (stamped above,
      // pre-strip) drives partitionBy — each distinct compiled
      // destination becomes one directory, written in a single
      // distributed pass (the reference keeps a writer map per key;
      // partitionBy is the shuffle-free Spark equivalent).
      val routed = df
      // framed formats survive the finalize pass only via the
      // single-part rename branch — stream-concatenating parquet/orc
      // parts corrupts footers and xml parts double the root element,
      // so chunking is rejected up front
      if ((fmt == "parquet" || fmt == "orc" || fmt == "xml") && spec.maxRecordsPerFile > 0)
        sys.error(s"templated $fmt destinations cannot be chunked " +
          "(maxRecordsPerFile): framed part files do not concatenate")
      val base = spec.destinationUri.takeWhile(_ != '[').reverse
        .dropWhile(c => c != '/').reverse + "__graft_grouped"
      fmt match {
        case "json" => writer(routed.repartition(col(DestCol)))
          .partitionBy(DestCol).json(base)
        case "parquet" => writer(routed.repartition(col(DestCol)))
          .partitionBy(DestCol).parquet(base)
        case "orc" => writer(routed.repartition(col(DestCol)))
          .partitionBy(DestCol).orc(base)
        case "xml" => writer(routed.repartition(col(DestCol)))
          .partitionBy(DestCol)
          .option("rowTag", "row").option("rootTag", "rows").xml(base)
        case "csv" | "tsv" =>
          // Always write parts headerless: a group split across several
          // part files (maxRecordsPerFile) must not embed header rows
          // mid-file; the single header is prepended at finalize.
          val sep = if (fmt == "tsv") "\t" else ","
          writer(routed.repartition(col(DestCol)))
            .partitionBy(DestCol)
            .option("header", "false").option("sep", sep).csv(base)
        case "txt" => writer(routed.repartition(col(DestCol)))
          .partitionBy(DestCol).text(base)
        case "xlsx" =>
          sys.error("templated xlsx destinations are not supported; use a static path")
      }
      val headerBytes: Option[Array[Byte]] =
        if ((fmt == "csv" || fmt == "tsv") && spec.header) {
          val sep = if (fmt == "tsv") '\t' else ','
          val line = df.columns.filterNot(_ == DestCol)
            .map(csvQuote(_, sep)).mkString(sep.toString) + "\n"
          val raw = line.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          // gzip members concatenate validly, so a compressed header
          // member + compressed part files is a well-formed .gz
          Some(if (spec.compression.contains("gzip")) gzipBytes(raw) else raw)
        } else None
      finalizeGroupedWrite(df.sparkSession, base, headerBytes)
    }
  }

  /** Quote a CSV header field the way Spark's writer would. */
  private[sinks] def csvQuote(name: String, sep: Char): String =
    if (name.exists(c => c == sep || c == '"' || c == '\n' || c == '\r'))
      "\"" + name.replace("\"", "\"\"") + "\""
    else name

  private def gzipBytes(raw: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(raw); gz.close()
    bos.toByteArray
  }

  /** Move each `__graft_dest=<escaped>` partition dir to its exact
    * templated destination (reference write-handler keeps one file per
    * compiled destination, write_handler.go:111-133). The heavy write
    * above was distributed; this pass is per-group stream-concatenation
    * on the driver — appropriate because grouped-file output is a
    * many-small-groups shape (per-email attachments, per-entity
    * exports), not a bulk-data path.
    */
  private def finalizeGroupedWrite(
      spark: org.apache.spark.sql.SparkSession, base: String,
      headerBytes: Option[Array[Byte]] = None): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val basePath = new org.apache.hadoop.fs.Path(base)
    val fs = basePath.getFileSystem(conf)
    if (!fs.exists(basePath)) return Nil
    val outs = fs.listStatus(basePath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("__graft_dest="))
      .map { st =>
        val dest = unescapePathName(st.getPath.getName.stripPrefix("__graft_dest="))
        val destPath = new org.apache.hadoop.fs.Path(dest)
        if (fs.exists(destPath)) fs.delete(destPath, true)
        Option(destPath.getParent).foreach(fs.mkdirs(_))
        val parts = fs.listStatus(st.getPath).toSeq
          .filter(_.getPath.getName.startsWith("part-")).sortBy(_.getPath.getName)
        if (parts.size == 1 && headerBytes.isEmpty)
          fs.rename(parts.head.getPath, destPath)
        else {
          val out = fs.create(destPath, true)
          try {
            headerBytes.foreach(out.write)
            parts.foreach { p =>
              val in = fs.open(p.getPath)
              try org.apache.hadoop.io.IOUtils.copyBytes(in, out, conf, false)
              finally in.close()
            }
          } finally out.close()
        }
        dest
      }.sorted
    fs.delete(basePath, true)
    outs
  }

  /** Inverse of Spark's partition-path escaping (%XX sequences). */
  private[sinks] def unescapePathName(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s(i) == '%' && i + 2 < s.length + 1 && i + 3 <= s.length) {
        try {
          sb += Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar
          i += 3
        } catch {
          case _: NumberFormatException => sb += s(i); i += 1
        }
      } else { sb += s(i); i += 1 }
    }
    sb.toString
  }
}
