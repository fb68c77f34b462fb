package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column — the
  * clustering pass behind SemDeDup-style pruning, topic bucketing, and
  * IVF coarse quantizers, here as a first-class deterministic operator
  * (the reference's pipelines treat clustering as an external step;
  * a Spark-native corpus engine should own it).
  *
  * Two arithmetic modes:
  *
  *  - `exact = true` (parity mode): every arithmetic step is
  *    engine-portable, so the whole fixed-iteration trajectory is
  *    oracle-checkable — rare for k-means:
  *      - element values and centroid means round to 6 decimals
  *        (round-6 ladder), so float summation order cannot perturb
  *        them;
  *      - squared-distance terms round to 6 decimals and sum as
  *        DECIMAL(18,6) — order-independent exact addition (runs as an
  *        interpreted higher-order function: correct, not fast);
  *      - argmin breaks ties on the smallest cluster id (lexicographic
  *        `least(struct(dist, cl))`);
  *      - initialization is the first k vectors by id, not a seeded
  *        RNG.
  *
  *  - `exact = false` (production mode): distances go through the
  *    compiled `graft_l2sq` kernel (one codegen'd pass per centroid)
  *    and centroid updates through plain double sums; centroid means
  *    still round to 6 decimals, so trajectories stay stable, but
  *    cross-engine bit-parity of distance sums is traded for speed.
  *    On well-separated data both modes produce identical assignments
  *    (KMeansSpec pins this); use parity mode only when an external
  *    oracle must replay the trajectory.
  *
  * Scale shape: centroids are model state (k × dims doubles) — they
  * live as compiled literals in the assignment projection, so
  * assignment is MAP-ONLY (no join, no shuffle of the corpus).
  * The update step is posexplode → groupBy(cluster, dim) with
  * map-side partial aggregation: each task emits at most k × dims
  * partial rows, so the shuffle is k × dims × partitions regardless
  * of corpus size. Each assignment pass reads the corpus once —
  * callers looping many iterations over a hot corpus should pass
  * `persistVectors = true` so the projected vectors are computed once
  * and served from cache. Driver state is k × dims rounded doubles,
  * guarded by `maxModel`.
  */
object KMeans {

  /** Run Lloyd's algorithm with `iters` ASSIGNMENT passes: the corpus
    * is assigned `iters` times with `iters - 1` centroid updates in
    * between (iters = 2 → init, assign, update, final assign — the
    * trajectory q85's oracle replays). Callers porting settings from
    * an "n updates" convention should pass `iters = n + 1`.
    *
    * Returns (idCol, cluster, dist2) where `cluster` is the surviving
    * initial-centroid ordinal and `dist2` the final rounded squared L2
    * distance to that centroid.
    *
    * `persistVectors = true` caches the projected vector column
    * (memory-and-disk) for the duration of the iteration loop AND the
    * returned assignment plan, released via the registerPersisted
    * queue: after materializing, call
    * [[graft.ops.Robust.unpersistPersisted]] (as Verify/Bench do per
    * query) — the madOutliers/winnow contract.
    */
  def lloyd(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 8,
      iters: Int = 2,
      maxModel: Int = 1 << 20,
      exact: Boolean = true,
      persistVectors: Boolean = false): DataFrame = {
    require(k >= 1 && iters >= 1, "kmeans: k and iters must be positive")
    val xe =
      if (exact) transform(col(vecCol), x => round(x.cast("double"), 6))
      else col(vecCol).cast("array<double>")
    // widen: each assignment pass evaluates k per-centroid distance
    // trees per row (exact mode: a decimal zip_with fold per centroid)
    // — over a single-row-group scan that ran as ONE task (guide §2;
    // no-op at real scale)
    val withXe0 = Scale.widen(df.select(col(idCol), xe.as("__xe")))
    val withXe =
      if (persistVectors) graft.ops.Robust.registerPersisted(withXe0)
      else withXe0

    val initRows = withXe.orderBy(col(idCol)).limit(k).collect()
    require(initRows.nonEmpty, "kmeans: empty input")
    var centroids: Seq[(Long, Seq[Double])] = initRows.zipWithIndex.map {
      case (r, j) => j.toLong -> r.getSeq[Double](1)
    }.toSeq
    val dims = centroids.head._2.length
    require(k.toLong * dims <= maxModel,
      s"kmeans: model k*dims = ${k.toLong * dims} exceeds $maxModel — " +
        "the centroid table is no longer config-sized")

    // squared L2 to one centroid. Parity mode: per-dim terms rounded
    // to 6 decimals, summed as DECIMAL(18,6) (order-independent).
    // Production mode: one compiled graft_l2sq pass.
    def dist(c: Seq[Double]): Column =
      if (exact) aggregate(
        zip_with(col("__xe"), typedlit(c), (a, b) => {
          val d = a - b
          round(d * d, 6).cast("decimal(18,6)")
        }),
        lit(BigDecimal(0)).cast("decimal(18,6)"),
        (acc, x) => (acc + x).cast("decimal(18,6)"))
      else call_function("graft_l2sq", col("__xe"), typedlit(c))

    // argmin with tie-break to the smallest cluster id (`least` needs
    // two args; a single surviving cluster is its own argmin)
    def best: Column = {
      val structs = centroids.map { case (cl, c) =>
        struct(dist(c).as("d"), lit(cl).as("c"))
      }
      if (structs.size == 1) structs.head else least(structs: _*)
    }

    val mean =
      if (exact)
        round(sum(col("__x").cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 6)
      else round(sum(col("__x")) / count(lit(1)), 6)
    for (_ <- 1 until iters) {
      val assigned = withXe.select(col("__xe"), best.getField("c").as("__cl"))
      val sums = assigned
        .select(col("__cl"), posexplode(col("__xe")).as(Seq("__i", "__x")))
        .groupBy("__cl", "__i")
        .agg(mean.as("__c"))
        .limit(maxModel + 1).collect()
      require(sums.length <= maxModel, "kmeans: centroid table overflow")
      centroids = sums.groupBy(_.getLong(0)).view
        .mapValues(_.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)
        .toSeq.sortBy(_._1)
    }
    withXe.select(col(idCol),
        best.getField("c").as("cluster"),
        round(best.getField("d").cast("double"), 6).as("dist2"))
  }
}
