package graft

import graft.ops.Basket

class BasketSpec extends SparkSuite {
  import spark.implicits._

  test("cooccurrence: pair supports, in-basket dup collapse, min support") {
    val rows = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L),
      (2L, 20L), // duplicate (basket, item) counts once
      (3L, 10L), (3L, 20L),
      (4L, 30L)  // singleton basket contributes nothing
    ).toDF("basket", "item")
    val out = Basket.cooccurrence(rows, "basket", "item", minSupport = 2L)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    // (10,20) in baskets 1,2,3; (10,30)/(20,30) only in basket 1
    assert(out == Seq((10L, 20L, 3L)), s"got $out")
    val all = Basket.cooccurrence(rows, "basket", "item", minSupport = 1L)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(all == Seq((10L, 20L, 3L), (10L, 30L, 1L), (20L, 30L, 1L)), all)
  }

  test("associationRules: confidence and lift by hand") {
    // baskets: {10,20} ×3, {10} ×1, {20,30} ×1  → N = 5
    val rows = Seq(
      (1L, 10L), (1L, 20L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L),
      (4L, 10L),
      (5L, 20L), (5L, 30L)
    ).toDF("basket", "item")
    val out = Basket.associationRules(rows, "basket", "item",
        minSupport = 2L, minConfidence = 0.0)
      .as[(Long, Long, Long, Long, Long, Double, Double)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    // only pair (10,20): s=3, n10=4, n20=4
    // conf(10→20) = 3/4; lift = 0.75·5/4 = 0.9375 both directions
    assert(out == Seq(
      (10L, 20L, 3L, 4L, 4L, 0.75, 0.9375),
      (20L, 10L, 3L, 4L, 4L, 0.75, 0.9375)), s"got $out")
    // the confidence gate prunes
    val pruned = Basket.associationRules(rows, "basket", "item",
      minSupport = 2L, minConfidence = 0.8).count()
    assert(pruned == 0L)
    intercept[IllegalArgumentException] {
      Basket.associationRules(rows, "basket", "item", minConfidence = 1.5)
    }
  }

  test("cooccurrence: mega-basket fail-fasts via the cap guard") {
    val big = (1L to 50L).map(i => (1L, i)).toDF("basket", "item")
    val e = intercept[Exception] {
      Basket.cooccurrence(big, "basket", "item", maxBasket = 10).collect()
    }
    assert(e.getMessage.contains("basket exceeds"), e.getMessage)
    intercept[IllegalArgumentException] {
      Basket.cooccurrence(big, "basket", "item", minSupport = 0L)
    }
  }
}
