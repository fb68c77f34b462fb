package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Re-identification audits over quasi-identifiers — the release
  * gate a dataset passes before leaving a trust boundary (training
  * corpora frequently embed user-derived records; the PII scrubbers
  * in functions/TextExprs remove direct identifiers, this op audits
  * the INDIRECT ones).
  *
  * k-anonymity (Sweeney 2002): every combination of quasi-identifier
  * values must be shared by ≥ k rows, or the combination singles
  * people out. l-diversity (Machanavajjhala 2007): within each such
  * group the sensitive attribute must take ≥ l distinct values, or
  * group membership REVEALS the sensitive value even at k-anonymous
  * sizes (the homogeneity attack).
  */
object Privacy {

  /** Violating quasi-identifier groups: rows grouped by `quasiCols`
    * where the group is smaller than `k` or carries fewer than `l`
    * distinct `sensitiveCol` values. Output: the quasi columns,
    * `n_rows`, `n_sensitive`, and `violation` ∈ {k, l, k+l}. An empty
    * result certifies the (k, l) contract for the whole table.
    *
    * Scale shape: ONE map-side-combined shuffle on the quasi key
    * (count + distinct-sensitive per group — the distinct rides a
    * two-level aggregate, still one exchange on the quasi key); the
    * violation filter is group-sized. No corpus-sized state: groups
    * at or above k pass through the aggregate and are DISCARDED by
    * the filter, so the output is bounded by the violation count, and
    * a 100 TB audit is exactly one aggregation job.
    */
  def kAnonymityAudit(
      df: DataFrame,
      quasiCols: Seq[Column],
      sensitiveCol: Column,
      k: Long,
      l: Long): DataFrame = {
    require(k >= 1 && l >= 1, s"k and l must be >= 1, got k=$k l=$l")
    df.groupBy(quasiCols: _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(sensitiveCol).as("n_sensitive"))
      .filter(col("n_rows") < k || col("n_sensitive") < l)
      .withColumn("violation",
        when(col("n_rows") < k && col("n_sensitive") < l, lit("k+l"))
          .when(col("n_rows") < k, lit("k"))
          .otherwise(lit("l")))
  }
}
