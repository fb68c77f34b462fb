package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding quantization — the storage-side counterpart of the ANN
  * operators: at 100 TB of float32 vectors, symmetric max-abs int8
  * cuts the footprint 4× (and IVF/LSH candidate scans read a quarter
  * of the bytes) at a bounded recall cost; the scale rides along per
  * vector so similarity scoring dequantizes on the fly.
  */
object Quantize {

  /** Packed production form: (id, scale float, qvec array<tinyint>)
    * where `x ≈ q * scale`, q ∈ [-127, 127]. Zero vectors quantize to
    * zeros with scale 0.
    */
  def int8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol)
    val amax = aggregate(v, lit(0.0d), (acc, x) => greatest(acc, abs(x.cast("double"))))
    df.select(col(idCol),
      (amax / 127d).cast("float").as("scale"),
      when(amax === 0d, transform(v, _ => lit(0).cast("byte")))
        .otherwise(transform(v,
          x => round(x.cast("double") * 127d / amax).cast("byte")))
        .as("qvec"))
  }

  /** Approximate cosine over packed int8 vectors: integer dot product
    * scaled back by the two vectors' scales. The int multiply-add path
    * is the cheap inner loop a 100 TB scan wants.
    */
  def cosineInt8(qvecA: Column, scaleA: Column, qvecB: Column, scaleB: Column): Column = {
    val dot = aggregate(zip_with(qvecA, qvecB, (a, b) => a.cast("int") * b.cast("int")),
      lit(0L), (acc, x) => acc + x)
    val na = aggregate(transform(qvecA, a => a.cast("int") * a.cast("int")),
      lit(0L), (acc, x) => acc + x)
    val nb = aggregate(transform(qvecB, b => b.cast("int") * b.cast("int")),
      lit(0L), (acc, x) => acc + x)
    (dot.cast("double") * scaleA * scaleB) /
      (sqrt(na.cast("double")) * scaleA * sqrt(nb.cast("double")) * scaleB)
  }

  /** Oracle surface: one row per (vector, position) with the quantized
    * level as BIGINT — scalar rows hash engine-identically, unlike
    * nested arrays. `i` is 1-based to match SQL ordinality.
    */
  def int8Rows(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val exploded = df
      .select(col(idCol), posexplode(col(vecCol)).as(Seq("pos", "x0")))
      .withColumn("x", col("x0").cast("double"))
    val w = Window.partitionBy(idCol)
    exploded
      .withColumn("amax", max(abs(col("x"))).over(w))
      .select(col(idCol),
        (col("pos") + 1).cast("long").as("i"),
        when(col("amax") === 0d, lit(0L))
          .otherwise(round(col("x") * 127d / col("amax")).cast("long")).as("q"))
  }

  /** Per-dimension corpus statistics — the standardization model a
    * feature-normalization pass learns before training or indexing:
    * one row per dimension with n, mean, std (population). Dims are
    * 1-based to match SQL ordinality.
    *
    * Parity device: values and squares round to 6/12 decimals and sum
    * as DECIMAL (exact, order-independent); mean/std derive from those
    * exact sums in fixed double expressions.
    *
    * Scale shape: posexplode fans each vector into d rows, but the
    * per-dim aggregate is map-side combined — the shuffle carries
    * d × partitions partial rows (k-dims-bounded like the k-means
    * update), never the corpus. The model output is d rows.
    */
  def dimStats(df: DataFrame, vecCol: String): DataFrame = {
    val ex = df.select(posexplode(col(vecCol)).as(Seq("__p", "__x0")))
      .select((col("__p") + 1).cast("long").as("dim"),
        col("__x0").cast("double").as("x"))
    val sx = sum(round(col("x"), 6).cast("decimal(18,6)")).cast("double")
    val sq = sum(round(col("x") * col("x"), 12).cast("decimal(28,12)"))
      .cast("double")
    ex.groupBy("dim")
      .agg(count(lit(1)).as("n"), sx.as("__sx"), sq.as("__sq"))
      .select(col("dim"), col("n"),
        round(col("__sx") / col("n"), 6).as("mean"),
        round(sqrt(greatest(col("__sq") / col("n") -
          (col("__sx") / col("n")) * (col("__sx") / col("n")), lit(0d))), 6)
          .as("std"))
  }

  /** Embedding-space outlier detection per group: each group's
    * centroid (per-dim DECIMAL-ladder means, the [[dimStats]] device),
    * each vector's squared distance to ITS group centroid (per-dim
    * round-12 terms summed exactly), and the per-group outlier count
    * above the exact `p`-quantile distance — the curation signal for
    * "this document's embedding does not belong to its source/cluster"
    * (mislabeled, boilerplate, or off-distribution content).
    *
    * Scale shape: the centroid model is groups × dims rows (tiny —
    * broadcast); the distance pass here keeps the declarative per-dim
    * join for oracle parity, which shuffles vecs × dims term rows on
    * the vector id. At 100 TB compile the centroids as literals into a
    * scan-stage kernel instead (the [[standardize]] /
    * `KMeans.lloyd`-assignment device) — distances then ride the scan
    * and only (id, dist) reaches the quantile.
    */
  def centroidOutliers(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      groupCol: String,
      p: Double = 0.95): DataFrame = {
    val ex = df.select(col(idCol).as("__id"), col(groupCol).as("__g"),
      posexplode(col(vecCol)).as(Seq("__p", "__x0")))
      .select(col("__id"), col("__g"),
        (col("__p") + 1).cast("long").as("dim"),
        col("__x0").cast("double").as("x"))
    val cent = ex.groupBy("__g", "dim")
      .agg(round(sum(round(col("x"), 6).cast("decimal(18,6)")).cast("double") /
        count(lit(1)), 6).as("mu"))
    // checkpoint: the per-vector distance table feeds the threshold
    // selection (three bounded passes in Percentiles.exact) AND the
    // final outlier count — without it the explode+join+agg lineage
    // recomputes per consumer
    val dist = ex.join(broadcast(cent), Seq("__g", "dim"))
      .groupBy("__id", "__g")
      .agg(round(sum(round((col("x") - col("mu")) * (col("x") - col("mu")), 12)
        .cast("decimal(28,12)")).cast("double"), 6).as("dist"))
      .localCheckpoint(true)
    // per-group EXACT p-quantile via the distributed two-pass
    // selection (Percentiles.exact) — the builtin percentile would
    // merge a per-group value buffer bounded by distinct distances
    // (corpus-proportional at scale) on one reducer; bit-identical
    // results, so the round-6 threshold is unchanged
    val thr = Percentiles.exactOne(dist, Seq("__g"), "dist", p,
        accuracy = 10000)
      .select(col("__g"), round(col("pct"), 6).as("thr"))
    dist.join(broadcast(thr), "__g")
      .groupBy(col("__g"), col("thr"))
      .agg(count(lit(1)).cast("long").as("n_vecs"),
        sum(when(col("dist") > col("thr"), 1L).otherwise(0L)).cast("long")
          .as("n_outliers"),
        round(max(col("dist")), 6).as("max_dist"))
      .select(col("__g").as(groupCol), col("n_vecs"), col("n_outliers"),
        col("thr"), col("max_dist"))
  }

  /** Map-only standardization: `(x - mean_d) / std_d` with the learned
    * model compiled into the scan as ARRAY literals (O(1) per-dim
    * lookups). Zero-variance dims pass through centered only.
    *
    * Scale shape: the model is d rows collected once (fail-fast
    * `maxDims` guard) and compiled as literals — the corpus is scanned
    * once, no join, no shuffle; at 100 TB the same literals ride every
    * executor's codegen'd projection.
    */
  def standardize(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      maxDims: Int = 8192): DataFrame = {
    val stats = dimStats(df, vecCol).orderBy("dim").limit(maxDims + 1).collect()
    require(stats.length <= maxDims,
      s"standardize: vector dimensionality exceeds maxDims=$maxDims")
    val means = stats.map(_.getAs[Double]("mean"))
    val stds = stats.map(_.getAs[Double]("std"))
    df.select(col(idCol),
      transform(col(vecCol), (x, i) => {
        val m = element_at(typedlit(means), i + 1)
        val s = element_at(typedlit(stds), i + 1)
        when(s === 0d, x.cast("double") - m)
          .otherwise((x.cast("double") - m) / s)
      }).as("vec_std"))
  }
}
