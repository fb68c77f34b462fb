package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off mode comparison for SCALE.md: parity (exact DECIMAL ladder)
  * vs production (compiled l2sq + persisted vectors) k-means at the
  * same k/iters on the sf embeddings table, plus an assignment-equality
  * check between the two trajectories.
  */
object KMeansModeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.registerAll(spark)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def time(tag: String, exact: Boolean, persist: Boolean): Long = {
      // warm once, then median of 3 like Bench
      val runs = (0 until 4).map { _ =>
        val t0 = System.nanoTime()
        graft.ops.KMeans.lloyd(emb, "vec_id", "embedding", k = 8, iters = 2,
          exact = exact, persistVectors = persist)
          .write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1000000L
      }.drop(1).sorted
      println(s"[kmeans-bench] $tag: median ${runs(1)} ms (runs: $runs)")
      runs(1)
    }
    val p = time("parity (exact=true)", exact = true, persist = false)
    val f = time("production (exact=false, persistVectors)", exact = false,
      persist = true)
    println(f"[kmeans-bench] speedup: ${p.toDouble / f}%.2fx")
    val a = graft.ops.KMeans.lloyd(emb, "vec_id", "embedding", k = 8, iters = 2,
      exact = true).select("vec_id", "cluster")
    val b = graft.ops.KMeans.lloyd(emb, "vec_id", "embedding", k = 8, iters = 2,
      exact = false).select("vec_id", "cluster")
    val diff = a.except(b).count() + b.except(a).count()
    println(s"[kmeans-bench] assignment diff rows at $sfDir: $diff")
    spark.stop()
  }
}
