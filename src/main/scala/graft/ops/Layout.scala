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
}
