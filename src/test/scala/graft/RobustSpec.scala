package graft

import graft.ops.Robust
import org.apache.spark.sql.functions.col

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

  test("mannWhitneyU: separated samples give U1 = 0 and the textbook z") {
    // A = {1,2,3}, B = {4,5,6}: R1 = 6, U1 = 0, cles = 0,
    // z = (0 - 4.5)/sqrt(0.75·7) = -1.963961 (no ties, t-term 0)
    val df = Seq((1.0, "a"), (2.0, "a"), (3.0, "a"),
      (4.0, "b"), (5.0, "b"), (6.0, "b")).toDF("v", "g")
    val r = Robust.mannWhitneyU(df, "v", $"g" === "a")
      .as[(Double, Long, Long, Double, Double)].collect().head
    assert(r._1 == 0.0 && r._2 == 3L && r._3 == 3L && r._4 == 0.0, s"got $r")
    assert(math.abs(r._5 - -1.963961) < 1e-6, s"z: ${r._5}")
  }

  test("mannWhitneyU: ties use average ranks; nulls in neither slice") {
    // A = {1,2}, B = {2,3}: ranks 1, 2.5 | 2.5, 4 → R1 = 3.5,
    // U1 = 0.5, cles = 0.125
    val df = Seq(
      (Some(1.0), Some("a")), (Some(2.0), Some("a")),
      (Some(2.0), Some("b")), (Some(3.0), Some("b")),
      (None, Some("a")), (Some(9.0), None)
    ).toDF("v", "g")
    val r = Robust.mannWhitneyU(df, "v", $"g" === "a")
      .as[(Double, Long, Long, Double, Double)].collect().head
    assert(r._1 == 0.5 && r._2 == 2L && r._3 == 2L && r._4 == 0.125, s"got $r")
  }

  test("spearman: monotone ±1, tie-cancelled 0, constant side NULL") {
    // a: perfectly increasing → 1; b: perfectly decreasing → −1;
    // c: x ties (1,1,2) vs y (5,7,6) → doubled ranks dx (3,3,6),
    //    dy (2,6,4): 3·48 − 12·12 = 0 → ρ = 0;
    // d: constant x → zero variance → NULL
    val df = Seq(
      ("a", 1.0, 10.0), ("a", 2.0, 20.0), ("a", 3.0, 30.0),
      ("b", 1.0, 30.0), ("b", 2.0, 20.0), ("b", 3.0, 10.0),
      ("c", 1.0, 5.0), ("c", 1.0, 7.0), ("c", 2.0, 6.0),
      ("d", 1.0, 2.0), ("d", 1.0, 3.0)
    ).toDF("g", "x", "y")
    val out = Robust.spearman(df, "g", "x", "y")
      .orderBy("g")
      .as[(String, Long, Option[Double])].collect().toSeq
    assert(out == Seq(("a", 3L, Some(1.0)), ("b", 3L, Some(-1.0)),
      ("c", 3L, Some(0.0)), ("d", 2L, None)), s"got $out")
  }

  test("anovaF: two groups by hand; F and eta_sq exact") {
    // a: (1,2,3), b: (2,3,4) → A = 12 + 27 = 39, S = 15, SS = 43,
    // SST = 5.5, SSB = 1.5, SSW = 4 → F = (1.5/1)/(4/4) = 1.5,
    // eta² = 1.5/5.5 = 0.272727
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 3.0), ("b", 4.0)).toDF("g", "v")
    val r = Robust.anovaF(df, "g", "v")
      .as[(Long, Long, Option[Double], Double)].collect().head
    assert(r == ((2L, 6L, Some(1.5), 0.272727)), s"got $r")
  }

  test("anovaF: one group yields NULL F (no between-group df)") {
    val df = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
    val r = Robust.anovaF(df, "g", "v")
      .as[(Long, Long, Option[Double], Double)].collect().head
    assert(r._1 == 1L && r._3.isEmpty, s"got $r")
  }

  test("anovaF: all-constant values yield NULL eta_sq, never NaN") {
    val df = Seq(("a", 7.0), ("a", 7.0), ("b", 7.0), ("b", 7.0))
      .toDF("g", "v")
    val r = Robust.anovaF(df, "g", "v")
      .as[(Long, Long, Option[Double], Option[Double])].collect().head
    // sst = 0: both f's ssw/(n-k) = 0 division and eta's 0/0 guard
    assert(r._4.isEmpty, s"eta_sq must be NULL on zero variance, got $r")
  }

  test("madOutliers: the MAD device's base persists once") {
    // r18: the MAD selection device opts into persistBase — its base
    // contains the whole median device via the deviation join, so the
    // persist evaluates `meds` once instead of once per pass; the
    // persist rides the release queue
    Robust.unpersistPersisted() // earlier tests may not have drained
    val df = ((1 to 40).map(i => ("a", i.toDouble)) :+ (("a", 1000.0)))
      .toDF("g", "v")
    val out = Robust.madOutliers(df, Seq("g"), "v")
    // the planted spike still flags (behavior unchanged by the persist)
    assert(out.select("v").as[Double].collect().toSeq == Seq(1000.0))
    // plan pin: the med and MAD passes read the InMemoryRelation of
    // the slim projection (checked on the optimized logical plan — a
    // LocalRelation fixture's cached scan prints as LocalTableScan
    // physically)
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("InMemoryRelation"),
      s"selection passes must read the persisted projection:\n$plan")
    // both persists registered for caller-side release (the returned
    // DF is lazy so the operator can't unpersist itself);
    // unpersistPersisted drains the queue
    assert(Robust.unpersistPersisted(blocking = true) == 1)
    assert(Robust.unpersistPersisted() == 0, "queue must drain")
    spark.catalog.clearCache()
  }

  test("robustShape: uniform 1..8 is Bowley-symmetric with Moors 1.0") {
    // octiles at 7p: e1..e7 = 1.875, 2.75, 3.625, 4.5, 5.375, 6.25,
    // 7.125 → IQR 3.5, bowley 0, moors (1.75 + 1.75)/3.5 = 1
    val df = ((1 to 8).map(v => ("a", v.toDouble)) ++
      Seq(("b", 5.0), ("b", 5.0), ("b", 5.0))).toDF("g", "v")
    val out = Robust.robustShape(df, Seq("g"), "v")
      .orderBy("g")
      .as[(String, Long, Double, Double, Double, Option[Double],
        Option[Double])].collect().toSeq
    assert(out == Seq(
      ("a", 8L, 2.75, 4.5, 6.25, Some(0.0), Some(1.0)),
      ("b", 3L, 5.0, 5.0, 5.0, None, None)), s"got $out")
  }

  test("jackknifeRatio: replicates, mean and SE match the hand formula") {
    import spark.implicits._
    // y = (2, 4, 6), x = (1, 1, 2): R = 12/4 = 3
    // R(-1) = 10/3, R(-2) = 8/3, R(-3) = 6/2 = 3
    val df = Seq((2.0, 1.0), (4.0, 1.0), (6.0, 2.0)).toDF("y", "x")
    val r = graft.ops.Robust.jackknifeRatio(df, "y", "x").head()
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[Double]("ratio") == 3.0)
    // round-6 replicates: 3.333333, 2.666667, 3.0 → mean 3.0
    assert(r.getAs[Double]("jack_mean") == 3.0)
    // dev² = (0.333333², 0.333333², 0) → Σ ≈ 0.222222 (round-6 terms)
    // SE = sqrt(2/3 · 0.222222) = sqrt(0.148148) ≈ 0.385aaa
    val se = r.getAs[Double]("jack_se")
    assert(math.abs(se - math.sqrt(2.0 / 3.0 * 0.222222)) < 1e-6, s"se=$se")
    assert(r.getAs[Double]("jack_bias") == 0.0)
  }

  test("jackknifeRatio degenerate replicates: NULL and excluded, not a crash") {
    import spark.implicits._
    // one row carries ALL the x mass → its leave-one-out divisor
    // Sx − x_i is 0: that replicate is NULL and EXCLUDED (m = 1), the
    // jackknife constants use m, and the remaining replicate drives
    // the stats: R(−1) = (3−1)/(2−0) = 1
    val df = Seq((1.0, 0.0), (2.0, 2.0)).toDF("y", "x")
    val r = graft.ops.Robust.jackknifeRatio(df, "y", "x").head()
    assert(r.getAs[Long]("n") == 2L)
    assert(r.getAs[Double]("ratio") == 1.5)
    assert(r.getAs[Double]("jack_mean") == 1.0)
    assert(r.getAs[Double]("jack_se") == 0.0) // (m−1)/m = 0
    assert(r.getAs[Double]("jack_bias") == 0.0)
    // n = 1: the only replicate divides by Sx − x_1 = 0 → m = 0 and
    // every jackknife output is NULL; n and the full-sample ratio
    // survive
    val one = Seq((4.0, 2.0)).toDF("y", "x")
    val r1 = graft.ops.Robust.jackknifeRatio(one, "y", "x").head()
    assert(r1.getAs[Long]("n") == 1L)
    assert(r1.getAs[Double]("ratio") == 2.0)
    assert(r1.isNullAt(r1.fieldIndex("jack_mean")))
    assert(r1.isNullAt(r1.fieldIndex("jack_se")))
    assert(r1.isNullAt(r1.fieldIndex("jack_bias")))
  }

  test("winsorizedCorrelation: clamping disarms a planted anti-whale") {
    import spark.implicits._
    val line = (1 to 40).map(i => (i * 1.0, i * 2.0))
    val whale = Seq((1000.0, -5000.0)) // alone it wrecks raw Pearson
    val df = (line ++ whale).toDF("x", "y")
    val r = graft.ops.Robust.winsorizedCorrelation(df, "x", "y").head()
    assert(r.getAs[Long]("n") == 41L)
    // the clamped whale stays one bounded-influence off-line point —
    // r recovers from negative to strongly positive, not to exactly 1
    assert(r.getAs[Double]("winsorized_r") > 0.85, s"got $r")
    assert(r.getAs[Double]("x_hi") < 1000.0) // the whale was clamped
    // raw Pearson for contrast: the whale drags it negative
    val xs = line.map(_._1) :+ 1000.0; val ys = line.map(_._2) :+ -5000.0
    val n = xs.length.toDouble
    val raw = (n * xs.zip(ys).map { case (a, b) => a * b }.sum -
      xs.sum * ys.sum) /
      math.sqrt((n * xs.map(a => a * a).sum - xs.sum * xs.sum) *
        (n * ys.map(b => b * b).sum - ys.sum * ys.sum))
    assert(raw < 0.0, s"raw=$raw")
  }

  test("winsorizedCorrelation: a clean linear pair stays at r = 1") {
    import spark.implicits._
    val df = (1 to 30).map(i => (i * 1.0, 5.0 + 3.0 * i)).toDF("x", "y")
    val r = graft.ops.Robust.winsorizedCorrelation(df, "x", "y").head()
    assert(r.getAs[Double]("winsorized_r") > 0.9999, s"got $r")
  }

  test("cliffsDelta: full separation is 1/large; symmetry is 0/negligible") {
    import spark.implicits._
    val sep = Seq((3.0, true), (4.0, true), (1.0, false), (2.0, false))
      .toDF("v", "a")
    val r1 = graft.ops.Robust.cliffsDelta(sep, "v", col("a")).head()
    assert(r1.getAs[Double]("cliffs_delta") == 1.0)
    assert(r1.getAs[String]("magnitude") == "large")
    // A = {1, 3}, B = {2}: one pair each way → δ = 0
    val sym = Seq((1.0, true), (3.0, true), (2.0, false)).toDF("v", "a")
    val r2 = graft.ops.Robust.cliffsDelta(sym, "v", col("a")).head()
    assert(r2.getAs[Double]("cliffs_delta") == 0.0)
    assert(r2.getAs[String]("magnitude") == "negligible")
  }

  test("olsInfluence: the off-line whale owns the fit") {
    import spark.implicits._
    // 9 points on y = 2x, one far-x point far OFF the line — highest
    // leverage AND residual → top Cook's D by a wide margin
    val pts = (1 to 9).map(i => (i.toLong, i * 1.0, i * 2.0)) :+
      ((10L, 30.0, 10.0))
    val out = graft.ops.Robust.olsInfluence(pts.toDF("id", "x", "y"),
      "id", "x", "y", topK = 3).collect()
    assert(out.head.getAs[Long]("id") == 10L, s"got ${out.toSeq}")
    assert(out.head.getAs[Double]("cooks_d") >
      out(1).getAs[Double]("cooks_d") * 5, s"got ${out.toSeq}")
    assert(out.head.getAs[Double]("leverage") > 0.5)
  }

  test("olsInfluence on a perfect line: residuals zero, D zero") {
    import spark.implicits._
    val pts = (1 to 5).map(i => (i.toLong, i * 1.0, 3.0 + 2.0 * i))
    val out = graft.ops.Robust.olsInfluence(pts.toDF("id", "x", "y"),
      "id", "x", "y", topK = 5).collect()
    assert(out.forall(_.getAs[Double]("resid") == 0.0), s"got ${out.toSeq}")
    assert(out.forall(r => r.getAs[Double]("cooks_d").isNaN ||
      r.getAs[Double]("cooks_d") == 0.0), s"got ${out.toSeq}")
  }

  test("partialCorrelation: x↔y association through a shared driver z") {
    import spark.implicits._
    // x = z, y = z (+ tiny distinct jitter to avoid |r| = 1):
    // rxy ≈ 1 via z; controlling z should collapse it far below raw
    val rows = (1 to 12).map { i =>
      val z = i * 10.0
      (z + (i % 3) * 0.5, z + (i % 4) * 0.5, z)
    }
    val r = graft.ops.Robust.partialCorrelation(
      rows.toDF("x", "y", "z"), "x", "y", "z").head()
    assert(r.getAs[Double]("r_xy") > 0.99)
    assert(math.abs(r.getAs[Double]("r_xy_given_z")) <
      r.getAs[Double]("r_xy"), s"got $r")
  }

  test("brownForsythe: equal spreads around different medians give F = 0") {
    import spark.implicits._
    // both groups are {center − 1, center, center + 1} → all |z| sets
    // identical → SSB = 0, F = 0
    val df = Seq(("a", 9.0), ("a", 10.0), ("a", 11.0),
      ("b", 99.0), ("b", 100.0), ("b", 101.0)).toDF("g", "v")
    val r = graft.ops.Robust.brownForsythe(df, "g", "v").head()
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("n") == 6L)
    assert(r.getAs[Long]("ss_between") == 0L)
    assert(r.getAs[Double]("f") == 0.0)
  }

  test("brownForsythe flags a genuinely wider group") {
    import spark.implicits._
    // three distinct values per group so |x − med| VARIES within each
    // group (a two-value group has constant z → zero within-spread →
    // NULL F by the degenerate guard)
    val tight = (1 to 10).map(i => ("t", 100.0 + (i % 3)))
    val wide = (1 to 10).map(i => ("w", 100.0 + (i % 3) * 50))
    val r = graft.ops.Robust.brownForsythe((tight ++ wide).toDF("g", "v"),
      "g", "v").head()
    assert(r.getAs[Double]("f") > 10.0, s"got $r")
    assert(r.getAs[Long]("ss_between") > 0L)
  }

  test("quantileLift: a constant shift moves every quantile by the shift") {
    import spark.implicits._
    val a = (0 to 100).map(i => ("A", i.toDouble))
    val b = (0 to 100).map(i => ("B", i.toDouble + 10.0))
    val r = graft.ops.Robust.quantileLift((a ++ b).toDF("arm", "v"),
      "arm", "A", "v", Seq(0.25, 0.5, 0.75))
      .orderBy("fraction").collect()
    assert(r.length == 3)
    r.foreach { x =>
      assert(x.getAs[String]("arm") == "B")
      assert(x.getAs[Double]("lift") == 10.0, s"got $x")
    }
    // and the quantiles themselves are the exact order statistics
    assert(r.map(_.getAs[Double]("base_pct")).toSeq == Seq(25.0, 50.0, 75.0))
  }
}
