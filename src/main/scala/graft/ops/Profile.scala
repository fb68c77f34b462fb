package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling: one long-format row per column with the data
  * quality counters every ingest gate wants before a corpus build —
  * row count, null count, distinct count, lexical min/max. The
  * reference engine surfaces per-file record counts only; this is the
  * per-COLUMN completeness report layered on the same scan.
  *
  * Scale shape: `exact = false` (production default at 100 TB) is ONE
  * map-side-combined pass — `approx_count_distinct` (HLL) keeps every
  * per-column counter in the same aggregate, no Expand, no second
  * scan. `exact = true` (the oracle mode) uses exact
  * `count_distinct`, which Catalyst plans as an Expand ×(#distinct
  * aggregates) — the scan is replicated per profiled column, fine at
  * oracle scale and exactly the cost `approx_count_distinct` exists
  * to avoid; ProfileSpec pins the two modes agree on this corpus.
  */
object Profile {

  /** Long-format profile of `cols`:
    * `(column_name, n_rows, n_nulls, n_distinct, min_val, max_val)`
    * with min/max rendered as strings (the column types differ).
    */
  def columnProfile(
      df: DataFrame,
      cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    val aggs = cols.flatMap { c =>
      val nd = if (exact) count_distinct(col(c))
      else approx_count_distinct(col(c))
      Seq(
        count(col(c)).as(s"__nn_$c"),
        nd.as(s"__d_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single stats row: stack is a map-side generator over
    // one row — the profile never shuffles anything but 1 row
    val stackArgs = cols.map { c =>
      s"'$c', __nn_$c, __d_$c, __mn_$c, __mx_$c"
    }.mkString(", ")
    one.selectExpr("__n",
      s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, __nn, n_distinct, min_val, max_val)")
      .select(col("column_name"), col("__n").cast("long").as("n_rows"),
        (col("__n") - col("__nn")).cast("long").as("n_nulls"),
        col("n_distinct").cast("long"), col("min_val"), col("max_val"))
  }
}
