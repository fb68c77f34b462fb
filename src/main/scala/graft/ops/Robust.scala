package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust (median/MAD) outlier detection — the outlier gate that does
  * not poison itself: z-scores (q82) move with the outliers they are
  * supposed to find, while the median and the median absolute
  * deviation have a 50% breakdown point (Hampel 1974; the k·1.4826
  * scaling makes MAD a consistent σ estimator under normality).
  *
  * Scale shape: two [[Percentiles.exact]] passes (each a distributed
  * bracketed selection — nothing corpus-proportional on one task,
  * see Percentiles.scala) plus two broadcast joins of group-sized
  * stats back onto the scan. The corpus is read twice (med, then
  * MAD over |v − med|) — at production scale persist the projected
  * (group, value) relation so both passes share one materialization.
  *
  * Reference behavior: the reference pushes outlier predicates to the
  * warehouse as SQL text (ext/maxcompute/source.go:135-247); this is
  * the corresponding native plan.
  */
object Robust {

  /** Rows whose `|value − median(group)|` exceeds `k · 1.4826 ·
    * MAD(group)`, with the per-group `med`/`mad` attached. Null
    * values never flag (null comparisons are 3VL-false in the
    * filter). The threshold multiplication is left-associated
    * `(k · 1.4826) · mad` — two IEEE ops every engine folds
    * identically, so the flag set is engine-portable.
    */
  def madOutliers(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Double = 3.0,
      accuracy: Int = 100000): DataFrame = {
    require(k > 0.0, s"graft: k must be positive, got $k")
    val meds = Percentiles.exactOne(df, groupCols, valueCol, 0.5, accuracy)
      .select(groupCols.map(col) :+ col("pct").as("med"): _*)
    val withMed = df.join(broadcast(meds), groupCols)
      .withColumn("__dev", abs(col(valueCol).cast("double") - col("med")))
    val mads = Percentiles.exactOne(withMed, groupCols, "__dev", 0.5, accuracy)
      .select(groupCols.map(col) :+ col("pct").as("mad"): _*)
    withMed.join(broadcast(mads), groupCols)
      .filter(col("__dev") > lit(k * 1.4826) * col("mad"))
      .drop("__dev")
  }
}
