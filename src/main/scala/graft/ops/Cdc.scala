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
}
