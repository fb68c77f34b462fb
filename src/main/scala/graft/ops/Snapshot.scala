package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot maintenance: what changed between two builds. */
object Snapshot {

  /** Per-id diff of two corpus snapshots:
    * `(id, status ∈ {added, removed, changed, unchanged})`, comparing
    * the [[Dedup.contentDigest]] of `cols` (injective null-normalized
    * key, so `changed` means the column VALUES differ, not just their
    * rendering).
    *
    * Scale shape: each side reduces to `(id, 16-byte digest)` before
    * the full-outer join — at 100 TB the diff never moves document
    * text, only ids and digests, and the join shuffles both sides by
    * id exactly once. Feed incremental builds: `added`/`changed` rows
    * are the re-process set, `removed` the retraction set.
    */
  def diff(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      cols: Seq[String]): DataFrame = {
    val od = oldDf.select(col(idCol).as("__oid"),
      Dedup.contentDigest(cols).as("__od"))
    val nd = newDf.select(col(idCol).as("__nid"),
      Dedup.contentDigest(cols).as("__nd"))
    od.join(nd, col("__oid") === col("__nid"), "full_outer")
      .select(coalesce(col("__oid"), col("__nid")).as(idCol),
        when(col("__oid").isNull, "added")
          .when(col("__nid").isNull, "removed")
          .when(col("__od") === col("__nd"), "unchanged")
          .otherwise("changed").as("status"))
  }
}
