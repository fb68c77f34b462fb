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
}
