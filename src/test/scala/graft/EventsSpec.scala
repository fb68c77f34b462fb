package graft

import java.sql.Timestamp

import graft.ops.Events

class EventsSpec extends SparkSuite {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("funnelStages: order matters, greedy matching, tie-break on tieCol") {
    import spark.implicits._
    val evs = Seq(
      // user 1: full funnel in order
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "click"),
      (1L, ts("2024-01-01 10:02:00"), 3L, "purchase"),
      // user 2: purchase BEFORE click -> stops at view
      (2L, ts("2024-01-01 10:00:00"), 4L, "purchase"),
      (2L, ts("2024-01-01 10:01:00"), 5L, "view"),
      (2L, ts("2024-01-01 10:02:00"), 6L, "click"),
      // user 3: view+click only
      (3L, ts("2024-01-01 10:00:00"), 7L, "view"),
      (3L, ts("2024-01-01 10:03:00"), 8L, "click"),
      // user 4: simultaneous ts, tie col orders view(9) < click(10) -> both
      (4L, ts("2024-01-01 10:00:00"), 9L, "view"),
      (4L, ts("2024-01-01 10:00:00"), 10L, "click"),
      // user 5: non-funnel events only -> in no stage
      (5L, ts("2024-01-01 10:00:00"), 11L, "error"),
      // user 6: repeated views then late purchase, no click
      (6L, ts("2024-01-01 10:00:00"), 12L, "view"),
      (6L, ts("2024-01-01 10:01:00"), 13L, "view"),
      (6L, ts("2024-01-01 10:02:00"), 14L, "purchase")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Events.funnelStages(evs, "user_id", "ts", "event_id",
      "event_type", Seq("view", "click", "purchase"))
      .orderBy("stage").collect()
    // stage1: users 1,2,3,4,6; stage2: 1,2,3,4; stage3: 1
    assert(out.map(_.getAs[Long]("n_users")).toSeq == Seq(5L, 4L, 1L))
    assert(out(0).isNullAt(out(0).fieldIndex("conversion")))
    assert(out(1).getAs[Double]("conversion") == 0.8)
    assert(out(2).getAs[Double]("conversion") == 0.25)

    // empty input -> one row per stage, all zero
    val empty = Events.funnelStages(evs.filter("user_id < 0"), "user_id",
      "ts", "event_id", "event_type", Seq("view", "click"))
      .orderBy("stage").collect()
    assert(empty.map(_.getAs[Long]("n_users")).toSeq == Seq(0L, 0L))

    intercept[IllegalArgumentException] {
      Events.funnelStages(evs, "user_id", "ts", "event_id", "event_type",
        Seq("view", "view"))
    }
  }

  test("funnelStages plan: one user exchange, type filter in the scan stage") {
    import spark.implicits._
    val evs = Seq((1L, ts("2024-01-01 10:00:00"), 1L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val plan = Events.funnelStages(evs, "user_id", "ts", "event_id",
      "event_type", Seq("view", "click")).queryExecution.optimizedPlan.toString
    // the scan must be filtered before the aggregate (cheap pin: the
    // isin filter survives optimization below the first aggregate)
    assert(plan.contains("view"), s"type filter missing:\n$plan")
  }

  test("intervalJoinCount matches brute force incl. bucket-boundary pairs") {
    import spark.implicits._
    // left at :00 of each minute; right placed to straddle bucket edges
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 10:10:00")),
      (3L, ts("2024-01-01 10:20:00"))
    ).toDF("event_id", "ts")
    val right = Seq(
      ts("2024-01-01 09:55:01"), // 299s before left1: in window
      ts("2024-01-01 09:54:59"), // 301s before left1: out
      ts("2024-01-01 10:05:00"), // exactly +300s from left1: in (<=)
      ts("2024-01-01 10:09:30"), // 30s before left2: in
      ts("2024-01-01 10:30:00")  // 600s after left3: out
    ).toDF("ts")
    val out = graft.ops.Events.intervalJoinCount(
      left, "event_id", "ts", right, "ts", 300L)
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // brute force: l1 -> {09:55:01, 10:05:00}; l2 -> {10:05:00, 10:09:30};
    // l3 -> none (10:30 is 600s away)
    assert(out == Seq((1L, 2L), (2L, 2L), (3L, 0L)))
    // plan: bucketed equi join, no nested loop / cartesian
    val plan = graft.ops.Events.intervalJoinCount(
      left, "event_id", "ts", right, "ts", 300L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"interval join must stay an equi join:\n$plan")
  }

  test("retentionCohorts: gaps, multiple cohorts, within-week dedup") {
    import spark.implicits._
    val evs = Seq(
      // user 1: cohort week of Jan 1 (Mon), active offsets 0 and 2
      (1L, ts("2024-01-02 09:00:00")),
      (1L, ts("2024-01-03 09:00:00")), // same week: counted once
      (1L, ts("2024-01-16 09:00:00")),
      // user 2: same cohort, offset 0 only
      (2L, ts("2024-01-04 12:00:00")),
      // user 3: cohort week of Jan 8, offsets 0 and 1
      (3L, ts("2024-01-08 00:00:00")),
      (3L, ts("2024-01-15 23:59:59"))
    ).toDF("user_id", "ts")
    val out = Events.retentionCohorts(evs, "user_id", "ts")
      .orderBy("cohort_week", "week_offset").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(
      ("2024-01-01", 0L, 2L), ("2024-01-01", 2L, 1L),
      ("2024-01-08", 0L, 1L), ("2024-01-08", 1L, 1L)))
  }

  test("slidingDistinctUsers: trailing window membership, only observed days") {
    import spark.implicits._
    // u1 active Jan 1 and Jan 9; u2 active Jan 1 (twice — dedups)
    val evs = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-09 10:00:00")),
      (2L, ts("2024-01-01 11:00:00")),
      (2L, ts("2024-01-01 23:00:00"))
    ).toDF("user_id", "ts")
    val out = Events.slidingDistinctUsers(evs, "user_id", "ts", windowDays = 7)
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1))).toSeq
    // Jan 1: both users; Jan 9: only u1 (Jan 1 is outside [Jan 3, Jan 9]);
    // Jan 2–8 emit nothing (unobserved) even though windows cover them
    assert(out == Seq(("2024-01-01", 2L), ("2024-01-09", 1L)), s"got $out")
    intercept[IllegalArgumentException] {
      Events.slidingDistinctUsers(evs, "user_id", "ts", windowDays = 0)
    }
  }

  test("linearAttribution: equal split, lookback bounds, (none) fallback") {
    import spark.implicits._
    val evs = Seq(
      // u1: click + view inside window, then converts → ½ each
      (1L, ts("2024-01-01 00:00:00"), 10L, "click"),
      (1L, ts("2024-01-01 01:00:00"), 11L, "view"),
      (1L, ts("2024-01-01 02:00:00"), 12L, "purchase"),
      // u1: a touch AT the conversion instant does not count (strict <)
      (1L, ts("2024-01-01 02:00:00"), 13L, "click"),
      // u2: touch outside the 1-hour window → (none)
      (2L, ts("2024-01-01 00:00:00"), 20L, "click"),
      (2L, ts("2024-01-01 03:00:00"), 21L, "purchase")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Events.linearAttribution(evs, "user_id", "ts", "event_id",
        "event_type", "purchase", Seq("click", "view"),
        windowUs = 3600000000L * 2)
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq(("(none)", 0L, 1.0), ("click", 1L, 0.5),
      ("view", 1L, 0.5)), s"got $out")
  }

  test("peakConcurrency: sweep line with half-open interval semantics") {
    import spark.implicits._
    val base = Timestamp.valueOf("2024-01-01 00:00:00")
    def at(sec: Long) = new Timestamp(base.getTime + sec * 1000)
    val evs = Seq(
      // g1: starts at 0, 10, 20 with 15s duration → pairwise overlaps,
      // never a triple: peak 2, first reached at t=10
      ("g1", at(0), 1L), ("g1", at(10), 2L), ("g1", at(20), 3L),
      // g2: second interval starts exactly when the first ENDS —
      // half-open means they never overlap: peak 1 at t=0
      ("g2", at(0), 4L), ("g2", at(15), 5L)
    ).toDF("g", "ts", "id")
    val out = Events.peakConcurrency(evs, "g", "ts", "id",
        durationUs = 15000000L)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val baseUs = base.getTime * 1000
    assert(out == Seq(("g1", 2L, baseUs + 10000000L), ("g2", 1L, baseUs)),
      s"got $out")
  }

  test("kaplanMeier: hand-computed life table with right censoring") {
    import spark.implicits._
    val base = Timestamp.valueOf("2024-01-01 00:00:00")
    def day(d: Long) = new Timestamp(base.getTime + d * 86400000L)
    // A and B convert on day 1; C never converts → censored at the
    // corpus horizon (max ts = day 3, duration 3); D converts day 3.
    // Life table: day 1: d=2, n=4, S=0.5; day 3: d=1, at risk =
    // {C (dur 3, censored), D (dur 3)} = 2, S = 0.5·(1−1/2) = 0.25.
    val evs = Seq(
      (1L, day(0), "signup"), (1L, day(1), "purchase"),
      (2L, day(0), "signup"), (2L, day(1), "purchase"),
      (3L, day(0), "signup"), (3L, day(2), "click"),
      (4L, day(0), "signup"), (4L, day(3), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val out = Events.kaplanMeier(evs, "user_id", "ts",
        org.apache.spark.sql.functions.col("event_type") === "purchase")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 2L, 4L, 0.5), (3L, 1L, 2L, 0.25)), s"got $out")
  }

  test("kaplanMeier: censored-only days get no row but stay at risk") {
    import spark.implicits._
    val base = Timestamp.valueOf("2024-01-01 00:00:00")
    def day(d: Long) = new Timestamp(base.getTime + d * 86400000L)
    // horizon = day 4. A converts day 1; B censored (dur 4);
    // C converts day 4. day 1: d=1 n=3 S=0.666667;
    // day 4: d=1, at risk = {B, C} = 2 → S = round(0.666667·0.5, 6)
    val evs = Seq(
      (1L, day(0), "s"), (1L, day(1), "p"),
      (2L, day(0), "s"), (2L, day(2), "x"),
      (3L, day(0), "s"), (3L, day(4), "p")
    ).toDF("user_id", "ts", "event_type")
    val out = Events.kaplanMeier(evs, "user_id", "ts",
        org.apache.spark.sql.functions.col("event_type") === "p")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 1L, 3L, 0.666667), (4L, 1L, 2L, 0.333334)),
      s"got $out")
  }

  test("subsequenceSupport: greedy min-chain finds triples incl. repeats") {
    import spark.implicits._
    val base = Timestamp.valueOf("2024-01-01 00:00:00")
    def at(sec: Long) = new Timestamp(base.getTime + sec * 1000)
    // user 1: a,b,c in order → only (a,b,c);
    // user 2: a,a,b → only (a,a,b) — recurrence via strict >
    val evs = Seq(
      (1L, at(1), "a"), (1L, at(2), "b"), (1L, at(3), "c"),
      (2L, at(1), "a"), (2L, at(2), "a"), (2L, at(3), "b")
    ).toDF("user_id", "ts", "event_type")
    val out = Events.subsequenceSupport(evs, "user_id", "ts", "event_type")
      .as[(String, String, String, Long)].collect()
      .sortBy(r => (r._1, r._2, r._3)).toSeq
    assert(out == Seq(("a", "a", "b", 1L), ("a", "b", "c", 1L)), s"got $out")
  }

  test("rfmSegments: distinct metrics rank straight into buckets") {
    import spark.implicits._
    val base = Timestamp.valueOf("2024-01-01 00:00:00")
    def day(d: Long) = new Timestamp(base.getTime + d * 86400000L)
    // 5 users; user i purchases i times on days 1..i with value 10·i.
    // horizon = day 5 (user 5's last buy). recency: u1 = 4d ... u5 =
    // 0d — so r_bucket is REVERSED vs f/m (most recent = rank 1).
    val evs = (1L to 5L).flatMap { u =>
      (1L to u).map(d => (u, day(d), "purchase", 10.0 * u))
    }.toDF("user_id", "ts", "event_type", "value")
    val out = Events.rfmSegments(evs, "user_id", "ts",
        org.apache.spark.sql.functions.col("event_type") === "purchase",
        "value")
      .select("user_id", "r_bucket", "f_bucket", "m_bucket", "segment")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 5L, 1L, 1L, "r5f1m1"), (2L, 4L, 2L, 2L, "r4f2m2"),
      (3L, 3L, 3L, 3L, "r3f3m3"), (4L, 2L, 4L, 4L, "r2f4m4"),
      (5L, 1L, 5L, 5L, "r1f5m5")), s"got $out")
  }

  test("growthAccounting: new/retained/resurrected/churned ledger by hand") {
    import spark.implicits._
    // u1: W1, W2, W4 → new, retained, resurrected; churns at W3
    // u2: W1 only → new; churns at W2
    // u3: W4 only → new; silence past W4 (max week) is not churn
    val ev = Seq(
      ("u1", ts("2024-01-01 10:00:00")), ("u1", ts("2024-01-09 10:00:00")),
      ("u1", ts("2024-01-23 10:00:00")),
      ("u2", ts("2024-01-02 10:00:00")),
      ("u3", ts("2024-01-24 10:00:00"))
    ).toDF("user_id", "ts")
    val out = Events.growthAccounting(ev, "user_id", "ts")
      .orderBy("week")
      .select(org.apache.spark.sql.functions.col("week").cast("string"),
        org.apache.spark.sql.functions.col("n_new"),
        org.apache.spark.sql.functions.col("n_retained"),
        org.apache.spark.sql.functions.col("n_resurrected"),
        org.apache.spark.sql.functions.col("n_churned"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("2024-01-01", 2L, 0L, 0L, 0L),
      ("2024-01-08", 0L, 1L, 0L, 1L),
      ("2024-01-15", 0L, 0L, 0L, 1L),
      ("2024-01-22", 1L, 0L, 1L, 0L)), s"got $out")
  }

  test("cohortLtv: two-week triangle by hand; null value counts 0") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      ("u1", ts("2024-01-01 10:00:00"), Some(10.0)),
      ("u1", ts("2024-01-09 10:00:00"), Some(20.0)),
      ("u2", ts("2024-01-02 10:00:00"), Some(5.0)),
      ("u2", ts("2024-01-09 11:00:00"), None), // null revenue, age 1
      ("u3", ts("2024-01-10 10:00:00"), Some(7.0))
    ).toDF("user_id", "ts", "value")
    val out = Events.cohortLtv(ev, "user_id", "ts", "value")
      .orderBy("cohort_week", "age_week")
      .select(col("cohort_week").cast("string"), col("age_week"),
        col("n_users"), col("week_rev"), col("cum_rev"),
        col("ltv_per_user"))
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    assert(out == Seq(
      ("2024-01-01", 0L, 2L, 15.0, 15.0, 7.5),
      ("2024-01-01", 1L, 2L, 20.0, 35.0, 17.5),
      ("2024-01-08", 0L, 1L, 7.0, 7.0, 7.0)), s"got $out")
  }

  test("debounce: lag-to-previous-event, not previous-kept; per-key windows") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def ts(s: String) = Timestamp.valueOf(s)
    // u1 at 0s, 30s, 50s with gap 40: 30s drops (30−0 ≤ 40); 50s ALSO
    // drops (50−30 = 20 ≤ 40 — the previous EVENT, kept or not,
    // anchors); u1 at 100s keeps (100−50 = 50 > 40); u2 independent
    val ev = Seq(
      ("u1", ts("2024-01-01 00:00:00"), "a"),
      ("u1", ts("2024-01-01 00:00:30"), "a"),
      ("u1", ts("2024-01-01 00:00:50"), "a"),
      ("u1", ts("2024-01-01 00:01:40"), "a"),
      ("u2", ts("2024-01-01 00:00:10"), "a")
    ).toDF("user_id", "ts", "event_type")
    val out = Events.debounce(ev, Seq("user_id"), "ts",
        Seq("event_type"), minGapSeconds = 40L)
      .select(col("user_id"), col("ts").cast("string"))
      .as[(String, String)].collect().toSeq.sorted
    assert(out == Seq(("u1", "2024-01-01 00:00:00"),
      ("u1", "2024-01-01 00:01:40"), ("u2", "2024-01-01 00:00:10")),
      s"got $out")
  }
}
