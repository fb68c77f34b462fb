package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-input reduction devices. */
object JoinReduce {

  /** Semi join with a broadcast-Bloom scan filter: build a Bloom
    * filter over the dim keys, probe it inside the FACT SCAN so
    * non-matching rows never reach the join exchange, then run the
    * exact semi join to cull the filter's false positives. The result
    * is EXACTLY `fact SEMI JOIN dim` — the bloom only prunes.
    *
    * When this wins: the dim side is too large to broadcast as a hash
    * relation but its Bloom is not (1% fpp ≈ 9.6 bits/key — 1e9 keys
    * ≈ 1.2 GB where the hash relation is 10-100× that), so the fact
    * side sheds its non-matching volume BEFORE the shuffle instead of
    * exchanging 100 TB to discard most of it at the join. For dims
    * that fit a broadcast join anyway, skip this and let AQE broadcast.
    *
    * `maxBits` fail-fasts on a filter too big to broadcast; `fpp`
    * trades filter size against leaked (then exactly culled) rows.
    */
  def bloomSemiJoin(
      fact: DataFrame,
      factKey: String,
      dim: DataFrame,
      dimKey: String,
      fpp: Double = 0.01,
      maxBits: Long = 1L << 33): DataFrame = {
    require(fpp > 0 && fpp < 1, "bloomSemiJoin: fpp in (0, 1)")
    val keys = dim.select(col(dimKey)).filter(col(dimKey).isNotNull)
    val nKeys = math.max(1L, keys.count())
    val bits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(nKeys, fpp)
    require(bits <= maxBits,
      s"bloomSemiJoin: filter needs $bits bits for $nKeys keys at fpp=$fpp " +
        s"(max $maxBits) — raise fpp, raise maxBits, or pre-reduce the dim")
    val bf = keys.stat.bloomFilter(dimKey, nKeys, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bf)
    val probe = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.BloomMightContain(
        org.apache.spark.sql.graft.ColumnBridge.expression(col(factKey)), bc))
    // rename the dim key so the semi-join condition stays unambiguous
    // even when both sides share a column name
    val dimKeys = keys.distinct().withColumnRenamed(dimKey, "__dimkey")
    fact
      .filter(col(factKey).isNotNull && probe)
      .join(dimKeys, col(factKey) === col("__dimkey"), "left_semi")
  }
}
