package graft

import graft.ops.Quantize

class QuantizeSpec extends SparkSuite {

  test("dimStats: hand-computed mean/std per dimension") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 10.0f)),
      (2L, Seq(3.0f, 10.0f)),
      (3L, Seq(5.0f, 10.0f))
    ).toDF("vec_id", "embedding")
    val out = Quantize.dimStats(df, "embedding").orderBy("dim").collect()
    assert(out.length == 2)
    // dim 1: mean 3, population std sqrt(8/3)
    assert(out(0).getAs[Long]("dim") == 1L && out(0).getAs[Long]("n") == 3L)
    assert(out(0).getAs[Double]("mean") == 3.0)
    val expStd = BigDecimal(math.sqrt(8.0 / 3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0).getAs[Double]("std") == expStd)
    // dim 2: constant -> std 0
    assert(out(1).getAs[Double]("mean") == 10.0 &&
      out(1).getAs[Double]("std") == 0.0)
  }

  test("standardize: standardized dims have ~0 mean / ~1 std; zero-var centers") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 10.0f)),
      (2L, Seq(3.0f, 10.0f)),
      (3L, Seq(5.0f, 10.0f))
    ).toDF("vec_id", "embedding")
    val std = Quantize.standardize(df, "vec_id", "embedding")
      .orderBy("vec_id").collect()
      .map(_.getAs[scala.collection.Seq[Double]]("vec_std"))
    val d1 = std.map(_(0))
    assert(math.abs(d1.sum / 3) < 1e-6, "standardized mean ~ 0")
    val v = d1.map(x => x * x).sum / 3
    assert(math.abs(v - 1.0) < 1e-4, s"standardized var ~ 1, got $v")
    // zero-variance dim 2 is centered only: all zeros
    assert(std.forall(v2 => math.abs(v2(1)) < 1e-9))
    // map-only application: the scoring plan has no exchange
    val plan = Quantize.standardize(df, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"standardize apply must be map-only:\n$plan")
    intercept[IllegalArgumentException] {
      Quantize.standardize(df, "vec_id", "embedding", maxDims = 1)
    }
  }

  test("centroidOutliers: the planted off-cluster vector is the group's outlier") {
    import spark.implicits._
    // group 0 clusters tightly around (1, 1) with one far point;
    // group 1 is tight with no outlier beyond its p95
    val vecs = Seq(
      (1L, 0L, Array(1.0f, 1.0f)), (2L, 0L, Array(1.1f, 0.9f)),
      (3L, 0L, Array(0.9f, 1.1f)), (4L, 0L, Array(1.0f, 0.9f)),
      (5L, 0L, Array(9.0f, 9.0f)), // planted outlier
      (6L, 1L, Array(-1.0f, -1.0f)), (7L, 1L, Array(-1.0f, -1.0f))
    ).toDF("vec_id", "label", "embedding")
    val out = Quantize.centroidOutliers(vecs, "vec_id", "embedding", "label")
      .orderBy("label").collect()
    assert(out.length == 2)
    val g0 = out(0); val g1 = out(1)
    assert(g0.getAs[Long]("n_vecs") == 5L && g0.getAs[Long]("n_outliers") == 1L, g0)
    // the planted point dominates the max distance by far
    assert(g0.getAs[Double]("max_dist") > 50.0, g0)
    assert(g1.getAs[Long]("n_outliers") == 0L, g1)
  }
}
