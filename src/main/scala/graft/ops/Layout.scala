package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering so that
  * files are compact in SEVERAL filter dimensions at once — the
  * standard lakehouse device for data skipping when queries filter on
  * more than the partition key. A file's (min, max) zone map per
  * dimension is what scan pruning consults; z-clustering shrinks those
  * bounding boxes by orders of magnitude versus arrival order.
  */
object Layout {

  /** Morton interleave of two bucketized dimensions (`bits` bits
    * each, values must be in [0, 2^bits)): bit i of `x` lands at
    * position 2i, bit i of `y` at 2i+1. Pure integer bit arithmetic —
    * codegen'd, engine-portable, no UDF.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"zValue: bits in [1, 31], got $bits")
    (0 until bits).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** The SQL text of [[zValue]] over column expressions `x`/`y` — for
    * oracle replay in engines without the Column API.
    */
  def zValueSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) * ${1L << (2 * i)} + (($y >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString("(", " + ", ")")

  /** Production write path: range-repartition by the z-value and sort
    * within partitions, so each output file covers a contiguous z
    * range (= a compact box in both dimensions). No global rank, no
    * single-partition window — the range exchange samples boundaries,
    * which is exactly how a 1000-executor layout job has to work.
    */
  def zorderRepartition(
      df: DataFrame,
      xBucket: Column,
      yBucket: Column,
      bits: Int,
      partitions: Int): DataFrame = {
    val z = zValue(xBucket, yBucket, bits)
    df.withColumn("__z", z)
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
  }

  /** Mixture-preserving training order (proportional interleave):
    * assign every row a global `position` such that EVERY PREFIX of
    * the order carries each stratum in ≈ its corpus proportion — the
    * deterministic, shuffle-free answer to "serialize this mixed
    * corpus for training without clumping a source" (a plain sort by
    * source clumps; a random shuffle is non-reproducible; this is
    * the low-discrepancy ordering both avoid). Works for curriculum
    * schedules too: make `orderCols` the difficulty order and each
    * stratum streams easy→hard while the stratum MIX stays flat.
    *
    * Device: within-stratum rank r (the two-phase rank device) maps
    * to the mid-quantile key `(2r − 1) / (2·n_s)` — stratum s's rows
    * sit at evenly-spaced points of [0, 1), so sorting by the key
    * interleaves strata proportionally (the same mid-rank device as
    * quantile normalization, used as a SCHEDULE); the global
    * position is a second rank pass over (key, stratum, order…) —
    * total order, engine-portable (identical doubles sort
    * identically; ties cannot cross strata at the same key unless
    * n_s coincide, and then the stratum column breaks them).
    *
    * Scale shape: two rank-device passes = two range shuffles of
    * WHATEVER `df` carries — project down to (id, stratum, order
    * keys) before calling and join `position` back by id if the full
    * rows are wide; no global window anywhere.
    */
  def proportionalInterleave(
      df: DataFrame,
      strataCol: String,
      orderCols: Seq[String],
      numPartitions: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "proportionalInterleave needs order columns")
    val ranked = Rank.stratifiedRank(df, strataCol, orderCols, numPartitions)
      .withColumn("__key",
        (lit(2L) * col("rk") - 1).cast("double") /
          (lit(2L) * col("n_stratum")).cast("double"))
      .drop("rk", "n_stratum")
    Rank.stratifiedRank(
      ranked.withColumn("__all", lit(1)),
      "__all", Seq("__key", strataCol) ++ orderCols, numPartitions)
      .withColumnRenamed("rk", "position")
      .withColumnRenamed("n_stratum", "n_total")
      .drop("__all", "__key")
  }
}
