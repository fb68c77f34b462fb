package graft.sinks

import java.io.OutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.DataFrame

/** Minimal XLSX (OOXML spreadsheet) stream writer — reference D21
  * (internal/ext/fileconverter/json2xlsx.go: JSON→CSV→xlsx via a
  * stream writer, single file, no chunking).
  *
  * No spreadsheet library ships with Spark, so this writes the OOXML
  * package directly (it is a zip of 4 small XML parts + one sheet,
  * cells as inline strings). Excel/LibreOffice/DuckDB open the result.
  *
  * Scale note: like the reference, XLSX output is inherently a single
  * sequential file (shared-strings/row order); the DataFrame is
  * streamed through `toLocalIterator` so only one partition is
  * resident on the driver at a time. Use it for report-sized exports,
  * not bulk data.
  */
object Xlsx {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  def write(out: OutputStream, header: Seq[String], rows: Iterator[Seq[String]]): Unit = {
    val zip = new ZipOutputStream(out)
    def part(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes("UTF-8"))
      zip.closeEntry()
    }
    part("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |</Types>""".stripMargin)
    part("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    part("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
        |</workbook>""".stripMargin)
    part("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)
    // stream the sheet
    zip.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    def w(s: String): Unit = zip.write(s.getBytes("UTF-8"))
    w("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    w("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    def writeRow(idx: Int, cells: Seq[String]): Unit = {
      w(s"""<row r="$idx">""")
      cells.foreach { c =>
        if (c == null) w("<c/>")
        else w(s"""<c t="inlineStr"><is><t>${esc(c)}</t></is></c>""")
      }
      w("</row>")
    }
    writeRow(1, header)
    var i = 2
    rows.foreach { r => writeRow(i, r); i += 1 }
    w("</sheetData></worksheet>")
    zip.closeEntry()
    zip.finish()
  }

  /** Write a DataFrame as one xlsx file at `path` (any Hadoop FS). */
  def writeDataFrame(df: DataFrame, path: String): Unit = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try {
      val header = df.columns.toSeq
      val it = df.toLocalIterator()
      val rows = new Iterator[Seq[String]] {
        def hasNext = it.hasNext
        def next() = {
          val r = it.next()
          header.indices.map(i => if (r.isNullAt(i)) null else String.valueOf(r.get(i)))
        }
      }
      write(out, header, rows)
    } finally out.close()
  }
}
