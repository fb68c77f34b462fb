package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.TimeSeries

class TimeSeriesSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gapFillHourly: dense grid, n=0 gaps, LOCF totals") {
    val ev = Seq(
      ("a", ts("2024-01-01 00:10:00"), 10.0),
      ("a", ts("2024-01-01 00:40:00"), 5.0),
      // hours 01 and 02 empty for a
      ("a", ts("2024-01-01 03:20:00"), 7.0),
      ("b", ts("2024-01-01 02:15:00"), 1.0)
    ).toDF("k", "ts", "v")
    val out = TimeSeries.gapFillHourly(ev, "k", "ts", "v")
      .orderBy("k", "hr")
      .select("k", "n", "filled_total")
      .as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("a", 2L, 15.0), // hour 00: both events
      ("a", 0L, 15.0), // gap: carried forward
      ("a", 0L, 15.0),
      ("a", 1L, 7.0),  // new observation replaces the carry
      ("b", 1L, 1.0)   // single-hour key: one-row grid
    ), s"got $out")
  }

  test("gapFillHourly: span guard surfaces sentinel timestamps") {
    val ev = Seq(
      ("a", ts("1970-01-01 00:00:00"), 1.0), // epoch sentinel
      ("a", ts("2024-01-01 00:00:00"), 2.0)
    ).toDF("k", "ts", "v")
    val e = intercept[Exception] {
      TimeSeries.gapFillHourly(ev, "k", "ts", "v", maxSpanHours = 1000)
        .collect()
    }
    assert(e.getMessage.contains("span exceeds"), e.getMessage)
  }

  test("meanShiftDaily: emits only full double-frames; shift = recent - prior means") {
    // 15 consecutive days for one key: values 1..10 then 21..25 —
    // day 14 is the first with both 7-day frames full
    val days = (1 to 15).map { d =>
      val v = if (d <= 10) d.toDouble else 10.0 + d
      ("k", ts(f"2024-01-${d}%02d 12:00:00"), v)
    }.toDF("k", "ts", "v")
    val out = TimeSeries.meanShiftDaily(days, "k", "ts", "v", w = 7)
      .orderBy("day")
      .select("daily_total", "ma_recent", "ma_prior", "shift")
      .as[(Double, Double, Double, Double)].collect().toSeq
    assert(out.size == 2, s"days 14 and 15 only, got ${out.size}")
    // day 14: recent = mean(8,9,10,21,22,23,24), prior = mean(1..7)
    val r14 = (8 + 9 + 10 + 21 + 22 + 23 + 24) / 7.0
    assert(out.head._2 == math.rint(r14 * 1e6) / 1e6, s"got ${out.head}")
    assert(out.head._3 == 4.0, s"prior mean(1..7) = 4, got ${out.head}")
    assert(out.head._4 == math.rint((r14 - 4.0) * 1e6) / 1e6)
    // a key with under 2w days emits nothing
    val short = (1 to 13).map(d => ("s", ts(f"2024-02-${d}%02d 01:00:00"), 1.0))
      .toDF("k", "ts", "v")
    assert(TimeSeries.meanShiftDaily(short, "k", "ts", "v", 7).count() == 0)
  }

  test("rollingMedian: bounded trailing frame, interpolated midpoint") {
    val rows = Seq(
      ("u", 1L, ts("2024-01-01 00:00:00"), 1.0),
      ("u", 2L, ts("2024-01-01 01:00:00"), 100.0),
      ("u", 3L, ts("2024-01-01 02:00:00"), 2.0),
      ("u", 4L, ts("2024-01-01 03:00:00"), 3.0),
      ("v", 5L, ts("2024-01-01 00:00:00"), 9.0)
    ).toDF("k", "id", "ts", "v")
    val out = TimeSeries.rollingMedian(rows, "k", Seq("ts", "id"), "v",
        window = 3)
      .select("id", "med_3").as[(Long, Double)].collect().sortBy(_._1).toSeq
    // frames: [1]→1, [1,100]→50.5, [1,100,2]→2, [100,2,3]→3; v: [9]→9
    assert(out == Seq((1L, 1.0), (2L, 50.5), (3L, 2.0), (4L, 3.0),
      (5L, 9.0)), s"got $out")
    // the spike never dominates: a window mean would report 34.3 at id 3
  }

  test("theilSenDaily: median pairwise slope shrugs off the outlier day") {
    // daily counts 1, 2, 10 → slopes 1, 4.5, 8 → median 4.5 (an OLS
    // fit through the same points gives ~4.5 here too, but a 100-count
    // day would drag OLS while the median stays put — second fixture)
    def rows(k: String, day: Int, n: Int) = Seq.fill(n)(
      (k, ts(f"2024-01-${day}%02d 12:00:00"), 1.0))
    val df = (rows("k", 1, 1) ++ rows("k", 2, 2) ++ rows("k", 3, 10))
      .toDF("k", "ts", "v")
    val out = TimeSeries.theilSenDaily(df, "k", "ts")
      .as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(("k", 3L, 4.5)), s"got $out")
    // with a planted 100-count day the median slope stays bounded
    val spiky = (rows("k", 1, 2) ++ rows("k", 2, 3) ++ rows("k", 3, 4) ++
      rows("k", 4, 100)).toDF("k", "ts", "v")
    val slope = TimeSeries.theilSenDaily(spiky, "k", "ts")
      .select("slope").as[Double].head()
    // pairwise slopes: 1,1,96,97/2=48.5,98/3,32.67 → median stays ~24.8
    assert(slope < 50.0, s"median slope must not follow the spike: $slope")
    intercept[IllegalArgumentException] {
      TimeSeries.theilSenDaily(df, "k", "ts", maxDays = 1)
    }
  }

  test("twap: holds each value until the next observation; singleton is null") {
    val base = ts("2024-01-01 00:00:00")
    def at(sec: Long) = new java.sql.Timestamp(base.getTime + sec * 1000)
    val df = Seq(
      ("k", at(0), 1L, 10.0), ("k", at(10), 2L, 20.0), ("k", at(30), 3L, 99.0),
      ("solo", at(0), 4L, 7.0)
    ).toDF("k", "ts", "id", "v")
    val out = TimeSeries.twap(df, "k", "ts", "id", "v")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(_._1).toSeq
    // k: 10·10s + 20·20s over 30s = 500/30 s-weighted; last value and
    // the singleton never contribute (no next observation)
    assert(out == Seq(
      ("k", 3L, Some(500000000.0 / 30000000.0)),
      ("solo", 1L, None)), s"got $out")
  }

  test("epoch buckets are UTC-hour/day aligned longs") {
    val one = Seq(("k", ts("2024-01-02 03:59:59"), 1.0)).toDF("k", "ts", "v")
    val hr = one.select(TimeSeries.epochHour(col("ts"))).as[Long].head()
    val day = one.select(TimeSeries.epochDay(col("ts"))).as[Long].head()
    assert(hr == 473379L, s"hours since epoch, got $hr")   // 19724*24+3
    assert(day == 19724L, s"days since epoch, got $day")
  }

  test("holtLinear: hand-stepped recurrence; singleton day has zero trend") {
    // k: days [10, 20] with α=β=0.5 (exact halves — no ulp games in
    // the hand check): l2 = 0.5·20 + 0.5·10 = 15, b2 = 0.5·5 = 2.5,
    // forecast(2) = 15 + 2·2.5 = 20. solo: level = y, trend = 0.
    val df = Seq(
      ("k", ts("2024-01-01 05:00:00"), 4.0),
      ("k", ts("2024-01-01 09:00:00"), 6.0),   // day 1 total 10
      ("k", ts("2024-01-02 01:00:00"), 20.0),  // day 2 total 20
      ("solo", ts("2024-01-01 00:00:00"), 7.0)
    ).toDF("k", "ts", "v")
    val out = TimeSeries.holtLinear(df, "k", "ts", "v",
        alpha = 0.5, beta = 0.5, horizon = 2)
      .as[(String, Long, Double, Double, Double)].collect()
      .sortBy(_._1).toSeq
    assert(out == Seq(("k", 2L, 15.0, 2.5, 20.0),
      ("solo", 1L, 7.0, 0.0, 7.0)), s"got $out")
  }

  test("autocorr: y = 1,2,3,4 on consecutive days — hand ACF") {
    // ȳ = 2.5, den = 30 − 25 = 5; lag 1: num = 20 − 2.5·15 + 3·6.25
    // = 1.25 → 0.25; lag 2: num = 11 − 25 + 12.5 = −1.5 → −0.3
    val df = Seq(
      ("g", ts("2024-01-01 05:00:00"), 1.0),
      ("g", ts("2024-01-02 06:00:00"), 2.0),
      ("g", ts("2024-01-03 07:00:00"), 3.0),
      ("g", ts("2024-01-04 08:00:00"), 4.0)
    ).toDF("k", "ts", "v")
    val out = TimeSeries.autocorr(df, "k", "ts", "v", maxLag = 2)
      .orderBy("lag")
      .as[(String, Long, Long, Long, Option[Double])].collect().toSeq
    assert(out == Seq(("g", 1L, 4L, 3L, Some(0.25)),
      ("g", 2L, 4L, 2L, Some(-0.3))), s"got $out")
  }

  test("autocorr: constant series yields NULL (zero variance guard)") {
    val df = Seq(("g", ts("2024-01-01 05:00:00"), 2.0),
      ("g", ts("2024-01-02 06:00:00"), 2.0)).toDF("k", "ts", "v")
    val out = TimeSeries.autocorr(df, "k", "ts", "v", maxLag = 1)
      .as[(String, Long, Long, Long, Option[Double])].collect().toSeq
    assert(out == Seq(("g", 1L, 2L, 1L, None)), s"got $out")
  }

  test("dowProfile: ISO weekday from epoch-day arithmetic; shares by hand") {
    // 2024-01-01 and 2024-01-08 are Mondays (isodow 1), 2024-01-02 a
    // Tuesday; Mon total 30 over 2 days, Tue 30 over 1; grand 60/3
    val df = Seq(
      ("g", ts("2024-01-01 05:00:00"), 10.0),
      ("g", ts("2024-01-08 06:00:00"), 20.0),
      ("g", ts("2024-01-02 07:00:00"), 30.0)
    ).toDF("k", "ts", "v")
    val out = TimeSeries.dowProfile(df, "k", "ts", "v")
      .orderBy("isodow")
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    assert(out == Seq(("g", 1L, 2L, 30.0, 0.5, 0.75),
      ("g", 2L, 1L, 30.0, 0.5, 1.5)), s"got $out")
  }

  test("cusum: hand-computed excursions; ties break to the earliest day") {
    // daily totals 1,1,5,1 → μ=2; walk n·S_t − t·S: [-400,-800,400,0]
    // (cents·n); C⁺ peaks 1200 at day 3 (→ 3.0 units); C⁻ ties 400 at
    // days 2 and 4 → earliest day 2 (→ 1.0 units)
    val ev = Seq(
      ("g", ts("2024-01-01 10:00:00"), 1.0),
      ("g", ts("2024-01-02 10:00:00"), 1.0),
      ("g", ts("2024-01-03 10:00:00"), 5.0),
      ("g", ts("2024-01-04 10:00:00"), 1.0)).toDF("g", "ts", "v")
    val out = TimeSeries.cusum(ev, "g", "ts", "v")
      .as[(String, Long, Double, Double, java.sql.Date, Double,
        java.sql.Date)].collect().head
    assert(out == (("g", 4L, 2.0, 3.0, java.sql.Date.valueOf("2024-01-03"),
      1.0, java.sql.Date.valueOf("2024-01-02"))), s"got $out")
  }

  test("crossCorr: exact r=1 at the true lag; shorter overlaps off-lag") {
    // B is A shifted one day later (×10): lag +1 aligns perfectly
    val ev = (Seq(1.0, 2.0, 3.0, 5.0).zipWithIndex.map { case (v, i) =>
      ("a", ts(f"2024-01-${i + 1}%02d 01:00:00"), v)
    } ++ Seq(1.0, 2.0, 3.0, 5.0).zipWithIndex.map { case (v, i) =>
      ("b", ts(f"2024-01-${i + 2}%02d 01:00:00"), v * 10)
    }).toDF("t", "ts", "v")
    val out = TimeSeries.crossCorr(ev, "ts", "v",
      col("t") === "a", col("t") === "b", maxLag = 2)
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((4L, Some(1.0))), s"got ${out(1L)}")
    // lag 0 overlaps days 2-4: a=[2,3,5] vs b=[10,20,30] — monotone
    // but not affine → r < 1
    assert(out(0L)._1 == 3L && out(0L)._2.exists(r => r < 1.0 && r > 0.9),
      s"got ${out(0L)}")
    // lag −2: b two days EARLIER than a — only a day 4 ↔ b day 2
    // aligns → a single pair, degenerate → NULL ccf
    assert(out(-2L) == ((1L, None)), s"got ${out(-2L)}")
  }

  test("mannKendall: strictly rising series gives S = n(n-1)/2") {
    import spark.implicits._
    val rows = (1 to 6).map(d =>
      (java.sql.Timestamp.valueOf(f"2024-01-0$d 10:00:00"), d * 10.0))
    val r = graft.ops.TimeSeries.mannKendall(rows.toDF("ts", "value"),
      "ts", "value").head()
    assert(r.getAs[Long]("n_days") == 6L)
    assert(r.getAs[Long]("s_stat") == 15L)
    assert(r.getAs[String]("trend") == "increasing")
    // var = 6·5·17/18 = 28.333333; z = 14/sqrt(var)
    assert(r.getAs[Double]("var_s") == 28.333333)
    assert(math.abs(r.getAs[Double]("z") - 14.0 / math.sqrt(510.0 / 18.0)) < 1e-6)
  }

  test("mannKendall: constant series has S = 0, z = 0, no trend") {
    import spark.implicits._
    val rows = (1 to 5).map(d =>
      (java.sql.Timestamp.valueOf(f"2024-01-0$d 10:00:00"), 7.0))
    val r = graft.ops.TimeSeries.mannKendall(rows.toDF("ts", "value"),
      "ts", "value").head()
    assert(r.getAs[Long]("s_stat") == 0L)
    assert(r.getAs[Double]("z") == 0.0)
    assert(r.getAs[String]("trend") == "none")
  }

  test("seasonalityStrength: a pure weekly cycle scores 1") {
    import spark.implicits._
    // 28 days, value depends ONLY on weekday → residuals all zero
    val rows = (0 until 28).map { i =>
      (java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, 1, 9, 0).plusDays(i)),
        10.0 + (i % 7) * 5.0)
    }
    val r = graft.ops.TimeSeries.seasonalityStrength(
      rows.toDF("ts", "value"), "ts", "value").head()
    assert(r.getAs[Long]("n_days") == 28L)
    assert(r.getAs[Double]("ssr") == 0.0)
    assert(r.getAs[Double]("strength") == 1.0, s"got $r")
  }

  test("seasonalityStrength: weekday-independent noise scores ~0") {
    import spark.implicits._
    // a 2-value alternation with period 2 is orthogonal-ish to the
    // 7-day cycle over 28 days: weekday means all equal → SSR = SST
    val rows = (0 until 28).map { i =>
      (java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, 1, 9, 0).plusDays(i)),
        if (i % 2 == 0) 10.0 else 20.0)
    }
    val r = graft.ops.TimeSeries.seasonalityStrength(
      rows.toDF("ts", "value"), "ts", "value").head()
    assert(math.abs(r.getAs[Double]("strength")) < 0.01, s"got $r")
  }

  test("changepoint locates an obvious level shift") {
    import spark.implicits._
    // daily totals 10,10,10 then 50,50,50 — best split after day 3
    val rows = (1 to 6).map { d =>
      (java.sql.Timestamp.valueOf(f"2024-01-0$d 12:00:00"),
        if (d <= 3) 10.0 else 50.0)
    }
    val df = rows.toDF("ts", "value")
    val r = graft.ops.TimeSeries.changepoint(df, "ts", "value").head()
    assert(r.getAs[java.sql.Date]("split_day").toString == "2024-01-04")
    assert(r.getAs[Long]("n_left") == 3L && r.getAs[Long]("n_right") == 3L)
    assert(r.getAs[Double]("mean_left") == 10.0)
    assert(r.getAs[Double]("mean_right") == 50.0)
    // perfect split: SSE drops by the full between-groups term
    // n·(Δ/2)² form: total SSE = 6·(20)² = 2400, split SSE = 0
    assert(r.getAs[Double]("sse_drop") == 2400.0)
  }

  test("changepoint split_day is the first PRESENT day of the right segment") {
    import spark.implicits._
    // gap: days 1,2 then 9,10 — split lands on day 9, not day 3
    val rows = Seq((1, 5.0), (2, 5.0), (9, 99.0), (10, 99.0)).map {
      case (d, v) =>
        (java.sql.Timestamp.valueOf(f"2024-01-$d%02d 08:00:00"), v)
    }
    val r = graft.ops.TimeSeries.changepoint(rows.toDF("ts", "value"), "ts", "value").head()
    assert(r.getAs[java.sql.Date]("split_day").toString == "2024-01-09")
  }

  test("binomialRows: exact Pascal rows, row sums are powers of two") {
    val rows = graft.ops.TimeSeries.binomialRows(12)
    assert(rows.count { case (n, _, _, _) => n == 12 } == 13)
    assert(rows.find { case (n, k, _, _) => n == 5 && k == 2 }.get._3 == 10L)
    (0 to 12).foreach { n =>
      val sum = rows.collect { case (`n`, _, c, _) => c }.sum
      assert(sum == (1L << n), s"n=$n sum=$sum")
    }
  }

  test("signTrendBH: exact sign-test p-values and integral BH step-up") {
    import spark.implicits._
    def day(d: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-$d%02d 08:00:00")
    // "up": 9 strictly rising steps → p = C(9,9)/2⁹ = 1/512;
    // "down": 9 strictly falling → p = 1; "tie": constant → all
    // comparisons are ties, the group drops from the output
    val rows =
      (1 to 10).map(d => ("up", day(d), d * 10.0)) ++
      (1 to 10).map(d => ("down", day(d), (11 - d) * 10.0)) ++
      (1 to 10).map(d => ("tie", day(d), 7.0))
    val out = graft.ops.TimeSeries.signTrendBH(
      rows.toDF("event_type", "ts", "value"), "event_type", "ts", "value")
      .orderBy("bh_rank").collect().toSeq
    assert(out.size == 2, s"got $out")
    val up = out.head
    assert(up.getAs[String]("event_type") == "up")
    assert(up.getAs[Long]("n_days") == 9L && up.getAs[Long]("ups") == 9L)
    assert(up.getAs[Double]("p_value") == 1.0 / 512.0, s"got $up")
    // BH at 0.05, m=2: 1/512 ≤ 0.05·1/2 → reject rank 1 only
    assert(up.getAs[Boolean]("rejected"), s"got $up")
    val down = out(1)
    assert(down.getAs[String]("event_type") == "down")
    assert(down.getAs[Double]("p_value") == 1.0, s"got $down")
    assert(!down.getAs[Boolean]("rejected"), s"got $down")
  }
}
