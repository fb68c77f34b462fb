package graft

import graft.ops.Concentration

class ConcentrationSpec extends SparkSuite {
  import spark.implicits._

  test("gini: uniform mass is 0, fully concentrated mass approaches 1") {
    val df = Seq(
      ("flat", 1L, 5L), ("flat", 2L, 5L), ("flat", 3L, 5L), ("flat", 4L, 5L),
      ("conc", 5L, 0L), ("conc", 6L, 0L), ("conc", 7L, 0L), ("conc", 8L, 10L),
      ("one", 9L, 42L)
    ).toDF("g", "id", "v")
    val out = Concentration.gini(df, "g", "v", "id")
      .as[(String, Long, Long, Double)].collect().sortBy(_._1).toSeq
    // conc: S1 = 4·10, S0 = 10 → (80 − 50)/40 = 0.75
    assert(out == Seq(
      ("conc", 4L, 10L, 0.75),
      ("flat", 4L, 20L, 0.0),
      ("one", 1L, 42L, 0.0)), s"got $out")
  }

  test("gini: tie order does not change the statistic") {
    // same multiset under shuffled ids — ranks permute within ties only
    val a = Seq(("g", 1L, 3L), ("g", 2L, 3L), ("g", 3L, 9L)).toDF("g", "id", "v")
    val b = Seq(("g", 9L, 3L), ("g", 5L, 9L), ("g", 7L, 3L)).toDF("g", "id", "v")
    val ga = Concentration.gini(a, "g", "v", "id").select("gini").as[Double].head()
    val gb = Concentration.gini(b, "g", "v", "id").select("gini").as[Double].head()
    assert(ga == gb, s"$ga != $gb")
  }

  test("lorenzDeciles: 5 values, 5 buckets — exact cumulative shares") {
    import spark.implicits._
    // cents 100..500, total 1500; cum value 100,300,600,1000,1500
    val df = Seq(("g", 1L, 1.0), ("g", 2L, 2.0), ("g", 3L, 3.0),
      ("g", 4L, 4.0), ("g", 5L, 5.0)).toDF("g", "id", "v")
    val out = Concentration.lorenzDeciles(df, "g", "v", "id", buckets = 5)
      .orderBy("bucket")
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq(
      ("g", 0L, 1L, 0.2, 0.066667), ("g", 1L, 1L, 0.4, 0.2),
      ("g", 2L, 1L, 0.6, 0.4), ("g", 3L, 1L, 0.8, 0.666667),
      ("g", 4L, 1L, 1.0, 1.0)), s"got $out")
  }
}
