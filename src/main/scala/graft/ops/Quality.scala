package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity audit: Deequ-style constraint checking over
  * declared foreign-key relations — row count, null keys, and orphan
  * keys (non-null child keys with no parent match) per relation, in
  * long format. Complements the per-column profile (q152) with the
  * cross-TABLE half of a data-quality suite.
  *
  * Scale shape: each relation is ONE left join (the parent side is
  * pre-deduped to its key, so the join never multiplies child rows;
  * AQE broadcasts dimension-sized parents) feeding a 1-row
  * map-side-combined aggregate; relations are independent plans
  * unioned at the leaf. Nothing corpus-sized crosses the wire beyond
  * the join's own key shuffle — and a broadcast parent removes even
  * that.
  *
  * Reference behavior: the reference validates sink headers against
  * table schemas row-locally (internal/component/common/sink.go) but
  * has no cross-table checks; this is the warehouse-grade audit a
  * 100 TB ingest needs before a join silently drops rows.
  */
object Quality {

  /** Audits `(relationName, child, childKeyCol, parent, parentKeyCol)`
    * tuples. Null child keys count as `n_null`, never as orphans
    * (a null key cannot reference anything); `n_orphan` counts
    * non-null child keys absent from the parent key set.
    */
  def fkAudit(
      relations: Seq[(String, DataFrame, String, DataFrame, String)])
      : DataFrame = {
    require(relations.nonEmpty, "graft: at least one relation")
    relations.map { case (name, child, ck, parent, pk) =>
      val p = parent.select(col(pk).as("__pk")).distinct()
      child.select(col(ck).as("__ck"))
        .join(p, col("__ck") === col("__pk"), "left")
        .agg(
          count(lit(1)).cast("long").as("n_rows"),
          count(when(col("__ck").isNull, 1)).cast("long").as("n_null"),
          count(when(col("__ck").isNotNull && col("__pk").isNull, 1))
            .cast("long").as("n_orphan"))
        .select(lit(name).as("relation"), col("n_rows"), col("n_null"),
          col("n_orphan"))
    }.reduce(_ unionAll _)
  }
}
