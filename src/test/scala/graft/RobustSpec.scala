package graft

import graft.ops.Robust

class RobustSpec extends SparkSuite {
  import spark.implicits._

  test("madOutliers: hand-computed median/MAD flags only the planted spike") {
    // group a: med = 3, devs (2,1,0,1,97) → MAD = 1,
    // threshold 3·1.4826·1 = 4.4478 → only 100.0 flags
    val df = Seq(
      ("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0), ("a", 4L, 4.0),
      ("a", 5L, 100.0),
      ("b", 6L, 7.0), ("b", 7L, 7.0), ("b", 8L, 7.0)
    ).toDF("g", "id", "v")
    val out = Robust.madOutliers(df, Seq("g"), "v")
      .select("g", "id", "v", "med", "mad")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(out == Seq(("a", 5L, 100.0, 3.0, 1.0)), s"got $out")
  }

  test("madOutliers: constant group has MAD 0 and never flags; nulls pass") {
    val df = Seq(
      ("c", 1L, Some(5.0)), ("c", 2L, Some(5.0)), ("c", 3L, Some(5.0)),
      ("c", 4L, None)
    ).toDF("g", "id", "v")
    assert(Robust.madOutliers(df, Seq("g"), "v").count() == 0L)
    intercept[IllegalArgumentException] {
      Robust.madOutliers(df, Seq("g"), "v", k = 0.0)
    }
  }
}
