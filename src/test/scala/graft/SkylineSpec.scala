package graft

import org.apache.spark.sql.functions._

import graft.ops.Skyline

class SkylineSpec extends SparkSuite {
  import spark.implicits._

  private def bruteFrontier(pts: Seq[(Double, Long)]): Set[(Double, Long)] =
    pts.filter { case (x, y) =>
      !pts.exists { case (x2, y2) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y)
      }
    }.toSet

  test("frontierPoints2 matches brute-force dominance, with ties and duplicates") {
    val pts = Seq(
      (1.0, 10L), (2.0, 9L), (3.0, 8L), // a proper frontier staircase
      (2.0, 9L), // exact duplicate — frontier point emitted once
      (2.0, 5L), // dominated within its x group
      (1.5, 9L), // dominated by (2.0, 9): same y, higher x
      (3.0, 1L), (0.5, 10L), // dominated by (1.0, 10)
      (4.0, 0L) // max x, frontier regardless of tiny y
    )
    val got = Skyline.frontierPoints2(pts.toDF("a", "b")
      .repartition(4), col("a"), col("b"))
      .as[(Double, Long)].collect().toSet
    assert(got == bruteFrontier(pts), s"got $got\nexp ${bruteFrontier(pts)}")
    // the staircase is what survived
    assert(got == Set((1.0, 10L), (2.0, 9L), (3.0, 8L), (4.0, 0L)))
  }

  test("frontierPoints2: null criteria rows are incomparable and excluded") {
    val df = Seq[(Option[Double], Option[Long])](
      (Some(1.0), Some(5L)), (None, Some(99L)), (Some(9.0), None))
      .toDF("a", "b")
    val got = Skyline.frontierPoints2(df, col("a"), col("b"))
      .as[(Double, Long)].collect().toSet
    assert(got == Set((1.0, 5L)), got)
  }

  test("frontierPoints2 is partitioning-invariant (the frontier merge property)") {
    val pts = (1 to 500).map(i =>
      ((i % 37).toDouble, ((i * 31) % 41).toLong))
    for (p <- Seq(1, 3, 16)) {
      val got = Skyline.frontierPoints2(
        pts.toDF("a", "b").repartition(p), col("a"), col("b"))
        .as[(Double, Long)].collect().toSet
      assert(got == bruteFrontier(pts), s"partitions=$p")
    }
  }
}
