package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the latest right row
  * with `right.ts <= left.ts` within the same key — the standard
  * enrichment for event streams (price-at-trade-time, last-state-at-
  * event-time).
  *
  * Spark has no native as-of join; per the extension preference order
  * this COMPOSES built-ins rather than adding a SparkPlan: union both
  * sides tagged, one window pass per key ordered by (ts, side), and
  * `last(value, ignoreNulls=true)` carries the most recent right value
  * onto each left row. One shuffle on the key — same cost as the
  * sort-merge join a native implementation would do. Right-side
  * (key, ts) pairs must be unique (pre-aggregate otherwise) so results
  * are deterministic across engines.
  */
object AsOf {

  /** @param valueCols right-side columns to carry onto left rows
    * @return left rows + `asof_<col>` for each value column (null when
    *         no right row precedes the left row)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      tsCol: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__side", lit(0))
      .select((Seq(col(key), col(tsCol), col("__side")) ++
        leftCols.filterNot(c => c == key || c == tsCol).map(col) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__v_$c"))): _*)
    val r = right
      .withColumn("__side", lit(1))
      .select((Seq(col(key), col(tsCol), col("__side")) ++
        leftCols.filterNot(c => c == key || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(c => col(c).as(s"__v_$c"))): _*)
    // at equal ts the right row sorts FIRST (side desc) so `<=` matches
    val w = Window.partitionBy(key)
      .orderBy(col(tsCol), col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"__v_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 0)
      .select((leftCols.map(col) ++ valueCols.map(c => col(s"asof_$c"))): _*)
  }
}
