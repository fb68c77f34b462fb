package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog compaction (CDC apply): reduce an append-only changelog to
  * the latest surviving state per key — the maintenance step a rolling
  * corpus/warehouse build runs before every publish (the reference's
  * REPLACE-table dance rewrites whole tables; this is the incremental
  * form for sources that ship row-level upserts + deletes).
  *
  * Semantics: for each key, rows are ordered by `orderCols`
  * (lexicographic, last wins; make the suffix a unique id so the order
  * is total — a non-total order would make "latest" nondeterministic);
  * a key SURVIVES only when the winning row satisfies `NOT tombstone`
  * under SQL three-valued logic — so a tombstone predicate that
  * evaluates to NULL on the winning row (e.g. `col("event_type") ===
  * "error"` over a null event_type) also deletes the key, exactly like
  * a SQL `WHERE NOT tombstone` would drop it (CdcSpec pins this).
  * Callers who want null-winning rows KEPT must make the predicate
  * null-safe: `coalesce(tombstone, lit(false))` or `<=>`.
  *
  * Scale shape: ONE shuffle on the key columns; `row_number` within
  * key groups (group size = updates per key, bounded in practice);
  * the tombstone filter rides the same stage. No driver state, no
  * second pass — at 100 TB this is the standard log-structured
  * compaction plan, and AQE skew-splitting handles hot keys.
  */
object Cdc {

  def applyChangelog(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      tombstone: Column): DataFrame = {
    require(keyCols.nonEmpty, "applyChangelog needs at least one key column")
    require(orderCols.nonEmpty, "applyChangelog needs at least one order column")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(c => col(c).desc): _*)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk")
      .filter(!tombstone)
  }

  /** SCD Type-2 history build (Kimball): turn a change stream into a
    * versioned dimension — every change row becomes a version with
    * `[valid_from_us, valid_to_us)` effective bounds; the open version
    * (`valid_to_us` null) is flagged `is_current`. The complement of
    * [[applyChangelog]]: that keeps only the survivor, this keeps the
    * full auditable timeline.
    *
    * Version order within a key is (`tsCol`, `tieCol`) — the tie
    * column (a unique event id) makes the order total, so
    * microsecond-identical changes still produce a deterministic
    * chain. Bounds are epoch micros (engine-portable longs).
    *
    * Scale shape: ONE shuffle on the key; `lead` runs inside each
    * key's window (group size = changes per key). Identical to the
    * compaction plan — history is the same window pass minus the
    * rank-1 filter.
    */
  def scd2History(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      tieCol: String): DataFrame = {
    require(keyCols.nonEmpty, "scd2History needs at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    df.withColumn("valid_from_us", unix_micros(col(tsCol)))
      .withColumn("valid_to_us", lead(unix_micros(col(tsCol)), 1).over(w))
      .withColumn("is_current", col("valid_to_us").isNull)
  }
}
