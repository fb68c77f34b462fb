package graft

import org.apache.spark.sql.functions._

import graft.ops.Eval

class EvalSpec extends SparkSuite {
  import spark.implicits._

  test("gateAgreement: hand-computed kappa and McNemar; NULL gates excluded") {
    // 2x2: both=4, only_a=2, only_b=1, neither=3 → n=10
    // po = 0.7; pa1 = 0.6, pb1 = 0.5 → pe = 0.3 + 0.2 = 0.5
    // kappa = (0.7-0.5)/0.5 = 0.4; mcnemar = (2-1)²/3 = 0.333333
    val rows = Seq.fill(4)((true, true)) ++ Seq.fill(2)((true, false)) ++
      Seq.fill(1)((false, true)) ++ Seq.fill(3)((false, false))
    val df = (rows.map { case (a, b) => (Some(a), Some(b)) } :+
      ((Option.empty[Boolean], Some(true)))).toDF("a", "b")
    val r = Eval.gateAgreement(df, col("a"), col("b"))
      .as[(Long, Long, Long, Long, Long, Double, Option[Double],
        Option[Double])].collect().head
    assert(r == ((10L, 4L, 2L, 1L, 3L, 0.7, Some(0.4), Some(0.333333))),
      s"got $r")
  }

  test("gateAgreement: constant gates → NULL kappa; no discord → NULL chi2") {
    val df = Seq.fill(5)((true, true)).toDF("a", "b")
    val r = Eval.gateAgreement(df, col("a"), col("b"))
      .as[(Long, Long, Long, Long, Long, Double, Option[Double],
        Option[Double])].collect().head
    assert(r._6 == 1.0 && r._7.isEmpty && r._8.isEmpty, s"got $r")
  }

  test("rocCurve: ten one-score bands, cumulative-from-top operating points") {
    // scores 0.0..0.9, positives at >= 0.5 — a perfect detector at
    // threshold band 5: tpr=1, fpr=0
    val df = (0 until 10).map(i => (i / 10.0, i >= 5)).toDF("score", "y")
    val out = Eval.rocCurve(df, "score", col("y"), points = 10)
      .orderBy(col("band").desc)
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
    assert(out.size == 10)
    val byBand = out.map(r => r._1 -> r).toMap
    assert(byBand(9L)._3 == 1L && byBand(9L)._4 == 0L)
    // band 5 = operating point "score >= 0.45..": all 5 pos, 0 neg
    assert(byBand(5L)._3 == 5L && byBand(5L)._4 == 0L)
    assert(byBand(5L)._5 == 1.0 && byBand(5L)._6 == 0.0)
    // bottom band captures everything
    assert(byBand(0L)._3 == 5L && byBand(0L)._4 == 5L)
    assert(byBand(0L)._5 == 1.0 && byBand(0L)._6 == 1.0)
    // thresholds: band b starts at b*(mx-mn+1) div 10 micro
    assert(byBand(5L)._2 == 450000L, s"got ${byBand(5L)._2}")
  }

  test("gainCurve: hand-computed capture shares and lift; last bucket lift 1") {
    // ids 1..10, scores descending (1.0 … 0.1); positives 1,2,3,10
    val df = (1 to 10).map(i =>
      (i.toLong, (11 - i) / 10.0, Set(1, 2, 3, 10).contains(i)))
      .toDF("id", "score", "y")
    val out = Eval.gainCurve(df, "score", col("y"), "id", buckets = 5)
      .orderBy("bucket")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 2L, 0.5, 2.5),       // top 20% captures 2/4 → lift 2.5
      (2L, 2L, 1L, 0.75, 1.875),
      (3L, 2L, 0L, 0.75, 1.25),
      (4L, 2L, 0L, 0.75, 0.9375),
      (5L, 2L, 1L, 1.0, 1.0)), s"got $out")
  }

  test("calibrationBins: confidence vs accuracy per fixed [0,1] band") {
    val df = Seq((0.05, false), (0.05, true), (0.95, true), (0.95, true))
      .toDF("score", "y")
    val out = Eval.calibrationBins(df, "score", col("y"), bins = 10)
      .orderBy("bin")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(out == Seq(
      (0L, 2L, 0.05, 0.5, 0.45),
      (9L, 2L, 0.95, 1.0, 0.05)), s"got $out")
  }

  test("calibrationBins: out-of-domain scores clamp to edge bins") {
    // scores below 0 / above 1 must land in bins 0 / bins-1 — never
    // phantom negative or >= bins indices; the raw score still feeds
    // confidence so pollution is visible (confidence escapes [0,1])
    val df = Seq((-0.3, false), (1.7, true), (0.5, true))
      .toDF("score", "y")
    val out = Eval.calibrationBins(df, "score", col("y"), bins = 10)
      .orderBy("bin")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(out.map(_._1) == Seq(0L, 4L, 9L), s"got $out")
    assert(out.head._3 == -0.3 && out.last._3 == 1.7, s"got $out")
  }

  test("isotonicCalibration pools adjacent violators to the exact rate") {
    import spark.implicits._
    // bins 0..3 with rates 0.0, 0.75, 0.25, 1.0 — bins 1 and 2
    // violate (0.75 > 0.25) and pool to (3+1)/(4+4) = 0.5
    val rows =
      Seq.fill(4)((0.05, false)) ++
      (Seq.fill(3)((0.30, true)) :+ ((0.30, false))) ++
      (Seq.fill(3)((0.60, false)) :+ ((0.60, true))) ++
      Seq.fill(4)((0.90, true))
    val df = rows.toDF("score", "y")
    val out = Eval.isotonicCalibration(df, "score", col("y"), bins = 4)
      .orderBy("bin")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(out.map(_._5) == Seq(0.0, 0.5, 0.5, 1.0), s"got $out")
    assert(out.map(_._4) == Seq(0.0, 0.75, 0.25, 1.0), s"got $out")
    // monotone and mass-preserving by construction
    assert(out.map(_._5).sliding(2).forall(p => p(0) <= p(1)))
    assert(out.map(r => r._2 * r._5).sum == out.map(_._3).sum.toDouble)
  }

  test("twoProportionZ: hand-computed rates and z; degenerate NULLs") {
    import spark.implicits._
    // A: 2/4, B: 1/4 → pooled 3/8; z = 0.25/√(0.375·0.625·0.5)
    val df = Seq((true, true), (true, true), (true, false), (true, false),
      (false, true), (false, false), (false, false), (false, false))
      .toDF("a", "s")
    val r = Eval.twoProportionZ(df, col("a"), col("s")).head()
    assert((r.getAs[Long]("n1"), r.getAs[Long]("x1"),
      r.getAs[Long]("n2"), r.getAs[Long]("x2")) == ((4L, 2L, 4L, 1L)))
    assert(r.getAs[Double]("p1") == 0.5 && r.getAs[Double]("p2") == 0.25)
    assert(math.abs(r.getAs[Double]("z") -
      0.25 / math.sqrt(0.375 * 0.625 * 0.5)) < 1e-6, s"got $r")
    // all-success pool → z NULL, rates still present
    val allPos = Seq((true, true), (false, true)).toDF("a", "s")
    val r2 = Eval.twoProportionZ(allPos, col("a"), col("s")).head()
    assert(r2.isNullAt(r2.fieldIndex("z")) && r2.getAs[Double]("p1") == 1.0)
    // one empty slice → p and z NULL, no divide-by-zero
    val oneSide = Seq((true, true), (true, false)).toDF("a", "s")
    val r3 = Eval.twoProportionZ(oneSide, col("a"), col("s")).head()
    assert(r3.isNullAt(r3.fieldIndex("p2")) && r3.isNullAt(r3.fieldIndex("z")))
  }

  test("calibrationError: hand-computed ECE and MCE") {
    import spark.implicits._
    // bin 0: 4 rows, conf 0.1, acc 0.25 → |gap| 0.15, num = 600000
    // bin 9: 2 rows, conf 0.9, acc 0.5  → |gap| 0.4,  num = 800000
    val df = (Seq((0.1, true)) ++ Seq.fill(3)((0.1, false)) ++
      Seq((0.9, true), (0.9, false))).toDF("score", "y")
    val r = Eval.calibrationError(df, "score", col("y"), bins = 10).head()
    assert(r.getAs[Long]("n") == 6L && r.getAs[Long]("bins_used") == 2L)
    // ECE = (600000 + 800000)/(6·1e6) = 0.233333 (half-up micro)
    assert(r.getAs[Double]("ece") == 0.233333, s"got $r")
    assert(r.getAs[Double]("mce") == 0.4, s"got $r")
  }

  test("isotonicCalibration cascades pools (strictly decreasing input)") {
    import spark.implicits._
    // rates 1.0, 0.5, 0.0 with equal bin mass → one global pool 0.5
    val rows = Seq.fill(2)((0.1, true)) ++
      (Seq((0.45, true), (0.45, false))) ++ Seq.fill(2)((0.8, false))
    val out = Eval.isotonicCalibration(rows.toDF("score", "y"), "score",
        col("y"), bins = 3)
      .orderBy("bin")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(out.map(_._5) == Seq(0.5, 0.5, 0.5), s"got $out")
  }

  test("brierDecomposition matches the hand-computed Murphy split") {
    import spark.implicits._
    // two bins, zero within-bin score variance → raw Brier equals the
    // binned identity rel − res + unc exactly
    val rows = Seq((0.1, true), (0.1, false), (0.9, true), (0.9, true))
    val r = Eval.brierDecomposition(rows.toDF("score", "y"), "score",
      col("y"), bins = 10).head()
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("brier") == 0.21, s"got $r")
    assert(r.getAs[Double]("reliability") == 0.085, s"got $r")
    assert(r.getAs[Double]("resolution") == 0.0625, s"got $r")
    assert(r.getAs[Double]("uncertainty") == 0.1875, s"got $r")
    assert(r.getAs[Double]("brier_binned") == 0.21, s"got $r")
    // perfectly calibrated scores: reliability 0, binned = uncertainty
    val cal = Seq((0.5, true), (0.5, false))
    val c = Eval.brierDecomposition(cal.toDF("score", "y"), "score",
      col("y"), bins = 10).head()
    assert(c.getAs[Double]("reliability") == 0.0, s"got $c")
    assert(c.getAs[Double]("resolution") == 0.0, s"got $c")
    assert(c.getAs[Double]("brier_binned") == 0.25, s"got $c")
  }

  test("wilsonRate: textbook 1/4 and 0/10 intervals at z=1.96") {
    import spark.implicits._
    // 1 pass of 4 → Wilson 95% ≈ [0.0456, 0.6994]; 0 of 10 → lo is
    // EXACTLY 0 and hi ≈ 0.2775 (the normal interval would give
    // [0, 0] — the degenerate case Wilson exists to fix)
    val df = Seq.tabulate(4)(i => ("a", i == 0)) ++
      Seq.tabulate(10)(i => ("b", false))
    val r = graft.ops.Eval.wilsonRate(df.toDF("g", "f"), "g", col("f"))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getDouble(3), x.getDouble(4), x.getDouble(5))).sortBy(_._1)
    assert(r(0) == ("a", 4L, 1L, 0.25, 0.045587, 0.699358), s"got ${r(0)}")
    assert(r(1) == ("b", 10L, 0L, 0.0, 0.0, 0.277533), s"got ${r(1)}")
  }

  test("averagePrecision: textbook ranking by hand") {
    import spark.implicits._
    // scores rank ids 1..5; positives at ranks 1, 3, 4 →
    // AP = (1/1 + 2/3 + 3/4) / 3 = round6(1) + round6(.666667) + .75
    val df = Seq((1L, 0.9, true), (2L, 0.8, false), (3L, 0.7, true),
      (4L, 0.6, true), (5L, 0.5, false)).toDF("id", "score", "y")
    val r = graft.ops.Eval.averagePrecision(df, "id", "score", col("y"))
      .head()
    graft.ops.Robust.unpersistPersisted()
    assert(r.getLong(0) == 5L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 0.805556, s"got $r")
  }

  test("averagePrecision: a perfect ranker scores 1") {
    import spark.implicits._
    val df = (1 to 20).map(i => (i.toLong, 1.0 - i * 0.01, i <= 7))
      .toDF("id", "score", "y")
    val r = graft.ops.Eval.averagePrecision(df, "id", "score", col("y"))
      .head()
    graft.ops.Robust.unpersistPersisted()
    assert(r.getDouble(2) == 1.0, s"got $r")
  }
}
