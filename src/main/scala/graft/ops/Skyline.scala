package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier) — multi-criteria selection: keep the
  * rows no other row dominates (≥ on both criteria, > on at least
  * one; both MAXIMIZED here). Börzsönyi et al. 2001 (ICDE) is the
  * classic operator; the textbook dominance form is a quadratic
  * non-equi self-join (Spark would plan BroadcastNestedLoopJoin),
  * which this implementation never does.
  *
  * Scale shape: the frontier distributes because
  * `frontier(S₁ ∪ S₂) = frontier(frontier(S₁) ∪ frontier(S₂))` —
  * phase 1 computes each partition's frontier with a SORT-AND-SCAN
  * (sortWithinPartitions, zero shuffle, O(n log n) per partition);
  * phase 2 re-scans only the survivors (P × per-partition frontier
  * size, typically tiny) on one task. No global sort of the corpus,
  * no window over a corpus-sized partition, no quadratic join.
  */
object Skyline {

  /** Distinct frontier POINTS `(x, y)` of `df` under (maximize x,
    * maximize y). Join the points back to the source relation to
    * recover the full surviving rows (ties all survive — equal
    * points never dominate each other). `x` must cast to double,
    * `y` to long; null criteria rows are excluded (incomparable).
    */
  def frontierPoints2(df: DataFrame, x: Column, y: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // sorted (x desc, y desc) scan: per x-group, the group max y is
    // the first y seen; the group is on the frontier iff its max y
    // strictly exceeds every max y of higher-x groups seen so far
    def scan(it: Iterator[(Double, Long)]): Iterator[(Double, Long)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
      var maxYHigher = Long.MinValue
      var haveCur = false
      var curX = 0d
      var curMaxY = Long.MinValue
      def closeGroup(): Unit = if (haveCur) {
        if (curMaxY > maxYHigher) {
          out += ((curX, curMaxY))
          maxYHigher = curMaxY
        }
        haveCur = false
      }
      it.foreach { case (xv, yv) =>
        if (!haveCur || xv != curX) {
          closeGroup()
          haveCur = true
          curX = xv
          curMaxY = yv // first y of the group is its max (sorted desc)
        }
      }
      closeGroup()
      out.iterator
    }
    val pts = df.select(x.cast("double").as("x"), y.cast("long").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .as[(Double, Long)]
    val local = pts
      .sortWithinPartitions(col("x").desc, col("y").desc)
      .mapPartitions(scan)
    local
      .coalesce(1)
      .sortWithinPartitions(col("_1").desc, col("_2").desc)
      .mapPartitions(scan)
      .toDF("x", "y")
  }
}
