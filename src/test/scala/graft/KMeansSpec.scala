package graft

import graft.ops.KMeans

class KMeansSpec extends SparkSuite {

  test("lloyd: hand-computed 2-iteration trajectory on a 1-D line") {
    import spark.implicits._
    // init c0=[0], c1=[1]; iter-1 assignment pulls 10,11 to c1, so the
    // updated c1 = mean(1,10,11) = 7.333333 and iter-2 reassigns 1 to c0
    val d = Seq(
      (0L, Seq(0.0f, 0.0f)),
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(10.0f, 0.0f)),
      (3L, Seq(11.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val r = KMeans.lloyd(d, "vec_id", "embedding", k = 2, iters = 2)
      .orderBy("vec_id").collect()
    assert(r.map(_.getLong(1)).toSeq == Seq(0L, 0L, 1L, 1L))
    assert(r(1).getDouble(2) == 1.0) // (1-0)^2
    // (10 - 7.333333)^2 = 7.111113 after the round-6 ladder
    assert(r(2).getDouble(2) == 7.111113)
    assert(r(0).getDouble(2) == 0.0 && java.lang.Double
      .doubleToRawLongBits(r(0).getDouble(2)) == 0L) // +0.0, hash parity
  }

  test("lloyd: duplicate init centroids collapse to the smaller id (tie-break)") {
    import spark.implicits._
    val d = Seq(
      (0L, Seq(0.0f)), (1L, Seq(0.0f)), (2L, Seq(100.0f))
    ).toDF("vec_id", "embedding")
    val r = KMeans.lloyd(d, "vec_id", "embedding", k = 2, iters = 2)
      .orderBy("vec_id").collect()
    // iter 1: every point ties between identical centroids -> cluster 0;
    // cluster 1 goes empty and disappears from the model
    assert(r.map(_.getLong(1)).toSeq == Seq(0L, 0L, 0L))
  }

  test("lloyd: model guard fires before a corpus-sized literal") {
    import spark.implicits._
    val d = Seq((0L, Seq(0.0f, 0.0f)), (1L, Seq(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      KMeans.lloyd(d, "vec_id", "embedding", k = 2, iters = 1, maxModel = 3)
    }
    assert(ex.getMessage.contains("config-sized"))
  }

  test("production mode (exact=false) agrees with parity mode on well-separated data") {
    import spark.implicits._
    // three tight, well-separated blobs: float-sum vs DECIMAL-ladder
    // arithmetic cannot flip any assignment
    val d = (0L to 29L).map { i =>
      val c = i % 3
      (i, Seq(c * 100.0f + (i % 5) * 0.25f, c * -50.0f + (i % 7) * 0.125f))
    }.toDF("vec_id", "embedding")
    val parity = KMeans.lloyd(d, "vec_id", "embedding", k = 3, iters = 3)
      .orderBy("vec_id").collect()
    val fast = KMeans.lloyd(d, "vec_id", "embedding", k = 3, iters = 3,
        exact = false, persistVectors = true)
      .orderBy("vec_id").collect()
    try {
      assert(parity.map(_.getLong(1)).toSeq == fast.map(_.getLong(1)).toSeq,
        "modes must produce identical assignments on separated blobs")
      // centroid means round to 6 decimals in BOTH modes, so the final
      // rounded distances agree too
      assert(parity.map(_.getDouble(2)).toSeq == fast.map(_.getDouble(2)).toSeq)
    } finally spark.catalog.clearCache()
  }

  test("iters parameter counts ASSIGNMENT passes: iters=1 never updates centroids") {
    import spark.implicits._
    val d = Seq(
      (0L, Seq(0.0f)), (1L, Seq(1.0f)), (2L, Seq(10.0f)), (3L, Seq(11.0f))
    ).toDF("vec_id", "embedding")
    // iters=1: assignment against the INITIAL centroids [0],[1] only —
    // 10 and 11 land on c1 at distances 81 and 100
    val r = KMeans.lloyd(d, "vec_id", "embedding", k = 2, iters = 1)
      .orderBy("vec_id").collect()
    assert(r.map(_.getLong(1)).toSeq == Seq(0L, 1L, 1L, 1L))
    assert(r(2).getDouble(2) == 81.0 && r(3).getDouble(2) == 100.0)
  }
}
