package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._

/** Scale-adaptive parallelism devices (optimization guide §2).
  *
  * The driver's testdata ships ONE parquet row group per table, so a
  * scan is ONE task no matter how `maxPartitionBytes` /
  * `minPartitionNum` slice the byte range (the vectorized reader
  * assigns a row group to the split holding its midpoint) — and every
  * per-row kernel, decimal-ladder aggregate and device pass downstream
  * of a bare scan then runs serially while the other cores idle
  * (measured: q256's three moment passes over a 600k-row lineitem ran
  * 14 tasks across 8 stages at 5.07 s wall; q85's two Lloyd assignment
  * passes 7 tasks / 4.30 s).
  *
  * [[widen]] is the inverse of AQE partition coalescing: it raises a
  * narrow plan to the session's default parallelism, and is a NO-OP
  * whenever the plan already reaches it — at production scale (many
  * files / row groups per table) the condition is false and no
  * exchange is added, so nothing here is tuned to local[32]; the
  * device adapts to `defaultParallelism` wherever it runs.
  */
object Scale {

  /** Raise `df` to the session's default parallelism when (and only
    * when) its plan yields fewer partitions. The round-robin exchange
    * this inserts on narrow inputs costs one local shuffle of the
    * projected input; callers apply it where the downstream per-row
    * work dominates that cost (compiled text kernels, decimal moment
    * ladders, per-centroid distance trees). Result-safe by the suite's
    * own parity rules: every aggregate downstream is either exact
    * (decimal/long) or explicitly order-pinned, so partitioning cannot
    * change any declared query's bytes — re-proven by the full oracle
    * gate after each adoption.
    */
  def widen(df: DataFrame): DataFrame = {
    // Only a NARROW plan (project/filter straight over a leaf) can be
    // task-starved by its source layout — below any exchange the data
    // is already at shuffle parallelism, so there is nothing to widen.
    // The guard also keeps the partition probe safe: under AQE,
    // `df.rdd` on a plan WITH exchanges materializes its query stages
    // (runs real jobs during "planning" — measured q158 3.8 s → 9.5 s
    // when this probe sat over a join); on a narrow plan it only
    // plans, costing milliseconds.
    if (!isNarrow(df.queryExecution.logical)) return df
    val np = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < np) df.repartition(np) else df
  }

  private def isNarrow(p: LogicalPlan): Boolean = p match {
    case _: LeafNode          => true
    case pj: Project          => isNarrow(pj.child)
    case f: Filter            => isNarrow(f.child)
    case a: SubqueryAlias     => isNarrow(a.child)
    case _                    => false
  }
}
