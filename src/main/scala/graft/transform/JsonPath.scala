package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** JSONPath projection (reference internal/component/common/sink.go:113-147).
  *
  * The reference projects each outgoing record through a JSONPath
  * expression before the sink writes it. Two Spark paths:
  *   - structured column: navigate nested fields directly (codegen'd,
  *     prunable) — used when the path is simple dotted access;
  *   - JSON string column: `get_json_object` for arbitrary paths.
  */
object JsonPath {

  /** Simple dotted path (`$.a.b` / `a.b`) on structured data. `keep`
    * columns ride along unprojected (e.g. a sink routing column).
    */
  def select(df: DataFrame, path: String, keep: Seq[String] = Nil): DataFrame = {
    val keepCols = keep.map(k => col(s"`$k`"))
    val segs = normalize(path)
    if (segs.isEmpty) df
    else {
      val c = segs.tail.foldLeft(col(s"`${segs.head}`"))((acc, f) => acc.getField(f))
      df.schema(segs.head).dataType match {
        case _: org.apache.spark.sql.types.StructType if segs.size == 1 =>
          df.select(col(segs.head + ".*") +: keepCols: _*)
        case _ => df.select(c.as(segs.last) +: keepCols: _*)
      }
    }
  }

  /** Arbitrary JSONPath over a JSON-string column. */
  def extract(jsonCol: Column, path: String): Column = {
    val p = if (path.startsWith("$")) path else "$." + path
    get_json_object(jsonCol, p)
  }

  /** Project whole records through a JSONPath by serializing the row —
    * byte-faithful to the reference (which runs JSONPath on the NDJSON
    * form) but slower; prefer [[select]] when the path is dotted access.
    */
  def selectViaJson(df: DataFrame, path: String): DataFrame =
    df.select(extract(to_json(struct(df.columns.map(col).toIndexedSeq: _*)), path).as("value"))

  private def normalize(path: String): Seq[String] =
    path.stripPrefix("$").split('.').toSeq.map(_.trim).filter(_.nonEmpty)
}
