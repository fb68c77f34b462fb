package graft

import graft.ops.Profile

class ProfileSpec extends SparkSuite {
  import spark.implicits._

  test("columnProfile: exact counters on a fixture with nulls") {
    val df = Seq(
      (Some(1L), Some("a")),
      (Some(2L), None),
      (Some(2L), Some("b")),
      (None, Some("a"))
    ).toDF("id", "s")
    val out = Profile.columnProfile(df, Seq("id", "s"))
      .orderBy("column_name")
      .as[(String, Long, Long, Long, String, String)].collect().toSeq
    assert(out == Seq(
      ("id", 4L, 1L, 2L, "1", "2"),
      ("s", 4L, 1L, 2L, "a", "b")), s"got $out")
  }

  test("columnProfile: approx mode matches exact within HLL error; no Expand in its plan") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val exact = Profile.columnProfile(docs, cols).orderBy("column_name")
      .as[(String, Long, Long, Long, String, String)].collect().toSeq
    val approx = Profile.columnProfile(docs, cols, exact = false)
      .orderBy("column_name")
      .as[(String, Long, Long, Long, String, String)].collect().toSeq
    exact.zip(approx).foreach { case (e, a) =>
      assert(e._1 == a._1 && e._2 == a._2 && e._3 == a._3 &&
        e._5 == a._5 && e._6 == a._6,
        s"non-distinct counters must be identical: $e vs $a")
      // approx_count_distinct default rsd = 5%
      assert(math.abs(a._4 - e._4) <= math.max(1L, (e._4 * 0.1).toLong),
        s"${e._1}: approx ${a._4} too far from exact ${e._4}")
    }
    // the scale claim: HLL mode plans ONE pass — exact count_distinct
    // expands the scan per counted column, approx must not
    val pApprox = Profile.columnProfile(docs, cols, exact = false)
      .queryExecution.executedPlan.toString
    assert(!pApprox.contains("Expand"), s"approx mode must not Expand:\n$pApprox")
    val pExact = Profile.columnProfile(docs, cols)
      .queryExecution.executedPlan.toString
    assert(pExact.contains("Expand"), "exact mode pays the Expand (oracle mode)")
  }

  test("columnProfile: argument validation") {
    intercept[IllegalArgumentException] {
      Profile.columnProfile(Seq((1, 2)).toDF("a", "b"), Seq.empty)
    }
  }

  test("benford: first digits by hand; sub-1 values excluded") {
    // digits: 1 ×3 (1.5, 12, 199), 2 ×1 (250); 0.4 excluded
    val df = Seq(1.5, 12.0, 199.0, 250.0, 0.4).toDF("v")
    val out = Profile.benford(df, "v")
      .as[(Long, Long, Double, Double, Double)].collect()
      .sortBy(_._1).toSeq
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val e1 = r6(math.log10(2.0)); val e2 = r6(math.log10(1.5))
    assert(out == Seq((1L, 3L, 0.75, e1, r6(0.75 - e1)),
      (2L, 1L, 0.25, e2, r6(0.25 - e2))), s"got $out")
  }

  test("keySkew: multiplicities (4,2,1,1) by hand; nulls excluded") {
    // counts sorted (1,1,2,4): p50 pos 1.5 → 1.5; p99 pos 2.97 →
    // 2 + 0.97·2 = 3.94; mean 2 → skew 2.0; top1 4/8 = 0.5
    val df = (Seq.fill(4)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d"))
      .map(Option(_)).:+(None).toDF("k")
    val r = Profile.keySkew(df, "k")
      .as[(Long, Long, Long, Double, Double, Double, Double)]
      .collect().head
    assert(r == ((8L, 4L, 4L, 1.5, 3.94, 0.5, 2.0)), s"got $r")
  }

  test("equalWidthHistogram: integer-cents bins by hand; max in last bin") {
    // cents 100..500, 4 bins, range+1 = 401:
    // (c−100)·4 div 401 → 100→0, 200→0, 300→1, 400→2, 500→3
    val df = Seq(1.0, 2.0, 3.0, 4.0, 5.0).toDF("v")
    val out = Profile.equalWidthHistogram(df, "v", bins = 4)
      .orderBy("bin")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 2L, 100L, 500L), (1L, 1L, 100L, 500L),
      (2L, 1L, 100L, 500L), (3L, 1L, 100L, 500L)), s"got $out")
  }

  test("fdAudit: violating keys by hand; NULL dets excluded, NULL deps uncounted") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (Some("a"), Some("x")),
      (Some("b"), Some("x")), (Some("b"), Some("y")),
      (Some("c"), Some("x")), (Some("c"), Some("y")), (Some("c"), Some("z")),
      (Some("d"), Option.empty[String]),   // NULL dep: 0 distinct → clean
      (Option.empty[String], Some("q")))   // NULL det: excluded entirely
      .toDF("det", "dep")
    val r = Profile.fdAudit(df, "det", "dep")
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert(r == ((4L, 2L, 3L, Some(0.5))), s"got $r")
    // a clean key FD reads zero violations
    val clean = Seq((1, "x"), (2, "y"), (3, "y")).toDF("det", "dep")
    val c = Profile.fdAudit(clean, "det", "dep")
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert(c == ((3L, 0L, 1L, Some(0.0))), s"got $c")
  }

  test("leaveOneGroupOut: removing the dragging group lifts the mean") {
    import spark.implicits._
    // a: (10, 20), b: (100, 200), mean_total = 82.5
    val df = Seq(("a", 10.0), ("a", 20.0), ("b", 100.0), ("b", 200.0))
      .toDF("g", "v")
    val out = Profile.leaveOneGroupOut(df, "g", "v").orderBy("g")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(out == Seq(
      ("a", 2L, 82.5, 150.0, 67.5),
      ("b", 2L, 82.5, 15.0, -67.5)), s"got $out")
  }

  test("leaveOneGroupOut: single group yields NULL without/delta") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 3.0)).toDF("g", "v")
    val r = Profile.leaveOneGroupOut(df, "g", "v").collect().head
    assert(r.getAs[Double]("mean_total") == 2.0)
    assert(r.isNullAt(r.fieldIndex("mean_without")))
    assert(r.isNullAt(r.fieldIndex("delta")))
  }

  test("effectiveSampleSize: equal weights give ESS = n; a whale collapses it") {
    import spark.implicits._
    val eq = (1 to 8).map(i => ("flat", 7L))
    val whale = Seq.tabulate(5)(i => ("skew", if (i < 4) 1L else 96L))
    val r = graft.ops.Profile.effectiveSampleSize(
      (eq ++ whale).toDF("g", "w"), "g", "w")
      .collect().map(x => (x.getString(0), x.getLong(1),
        x.getAs[Double]("ess"), x.getAs[Double]("deff"))).sortBy(_._1)
    assert(r(0) == ("flat", 8L, 8.0, 1.0), s"got ${r(0)}")
    // (1+1+1+1+96): ESS = 100²/9220, deff = 5·9220/100² — hand-computed
    assert(r(1) == ("skew", 5L, 1.084599, 4.61), s"got ${r(1)}")
  }

  test("effectiveSampleSize: sum_w past the 7e15 budget raises, never nulls") {
    import spark.implicits._
    // the guard's scenario is NON-ANSI mode (round-14 ADVICE): there
    // the decimal ess/deff arithmetic silently NULLs on overflow
    // instead of throwing, and the decimal→long sum_w cast would too —
    // a blown budget must still fail LOUDLY via the raise_error guard.
    // (Under ANSI, the suite's mode, the ess multiply throws first;
    // either way the failure is loud, which is the invariant.)
    val df = Seq(("g", 4000000000000000L), ("g", 4000000000000000L))
      .toDF("g", "w") // Σw = 8e15 > 7e15 budget (still < int64 max)
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val ansi = spark.conf.get("spark.sql.ansi.enabled")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      val e = intercept[Exception] {
        graft.ops.Profile.effectiveSampleSize(df, "g", "w").collect()
      }
      assert(msgs(e).exists(_.contains("7e15 integer budget")), msgs(e))
    } finally spark.conf.set("spark.sql.ansi.enabled", ansi)
    // ANSI mode still fails loudly (decimal overflow), never nulls
    val e2 = intercept[Exception] {
      graft.ops.Profile.effectiveSampleSize(df, "g", "w").collect()
    }
    assert(msgs(e2).nonEmpty)
    // just inside the budget still emits the exact long
    val ok = Seq(("g", 3000000000000000L), ("g", 3000000000000000L))
      .toDF("g", "w")
    val r = graft.ops.Profile.effectiveSampleSize(ok, "g", "w")
      .select("sum_w").as[Long].head()
    assert(r == 6000000000000000L)
  }

  test("fdHistogram: FD width 2·IQR/∛n by hand on 1..8") {
    import spark.implicits._
    // n=8 → k=2 (2³ ≤ 8); IQR = 6.25 − 2.75 = 3.5 → width 3.5, min 1
    val r = graft.ops.Profile.fdHistogram(
      (1 to 8).map(_.toDouble).toDF("v"), "v")
      .orderBy("bin").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    assert(r.toSeq == Seq((0L, 4L, 1.0), (1L, 3L, 4.5), (2L, 1L, 8.0)),
      s"got ${r.toSeq}")
  }

  test("fdHistogram: zero IQR yields an empty histogram, not a crash") {
    import spark.implicits._
    val r = graft.ops.Profile.fdHistogram(
      Seq.fill(10)(5.0).toDF("v"), "v").collect()
    assert(r.isEmpty)
  }
}
