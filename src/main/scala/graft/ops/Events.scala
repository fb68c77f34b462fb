package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics: ordered funnels and cohort retention.
  * The reference's event pipelines stop at routing/aggregation
  * (ref `pkg/component/component.go` source→sink loops); these are the
  * sequence-aware reports a product-analytics or training-telemetry
  * pipeline runs downstream of it.
  */
object Events {

  /** Ordered conversion funnel: a user reaches stage k iff the stage
    * types occur as a SUBSEQUENCE of their event stream (each stage
    * strictly after the previous match, order by (ts, tieCol)).
    * Greedy earliest matching — provably equivalent to the
    * min-position chain (`t2 = min pos of stage2 after t1`, …) a SQL
    * derivation uses, and deterministic because the sort key is
    * unique.
    *
    * Returns one row per stage: `stage`, `stage_name`, `n_users`,
    * `conversion` (fraction of the previous stage's users, NULL for
    * stage 1).
    *
    * Scale shape: the stream is filtered to the funnel's event types
    * in the scan stage (for a 3-stage funnel over 100 TB of telemetry
    * this is usually a 10-100× cut before anything moves), then ONE
    * shuffle groups by user; each user's filtered events are sorted
    * and folded in a single `aggregate` pass carrying only the stage
    * index — per-user memory is that user's funnel-type events, never
    * the corpus. Stage counts come out of the same aggregation as
    * k conditional sums (map-side combined), so the funnel table
    * itself never shuffles again.
    */
  def funnelStages(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      tieCol: String,
      typeCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty && stages.distinct.size == stages.size,
      "funnelStages: stages must be non-empty and distinct")
    val k = stages.size
    val evs = events
      .filter(col(typeCol).isin(stages.map(x => x: Any): _*))
      .select(col(userCol).as("__u"),
        struct(col(tsCol).as("ts"), col(tieCol).as("tie"),
          col(typeCol).as("t")).as("__e"))
    // greedy subsequence depth: fold the (ts, tie)-sorted stream,
    // advancing the stage cursor when the next needed stage appears
    val depth = aggregate(
      array_sort(collect_list(col("__e"))),
      lit(0),
      (acc, x) => when(acc < k &&
        x.getField("t") === element_at(typedlit(stages), acc + 1), acc + 1)
        .otherwise(acc))
    val perUser = evs.groupBy(col("__u")).agg(depth.as("__d"))
    stageCounts(perUser, "__d", stages)
  }

  /** Collapse per-user funnel depths into the stage table: one row per
    * stage with `n_users` (depth ≥ stage) and `conversion` from the
    * previous stage. Shared by the batch fold and the streaming
    * funnel's emitted depth updates.
    */
  def stageCounts(
      perUserDepth: DataFrame,
      depthCol: String,
      stages: Seq[String]): DataFrame = {
    val k = stages.size
    // coalesce: a global agg over ZERO users yields one all-NULL row,
    // and the funnel must report 0 there
    val cs = (1 to k).map(i =>
      coalesce(sum(when(col(depthCol) >= i, 1L).otherwise(0L)), lit(0L))
        .as(s"__c$i"))
    val counts = perUserDepth.agg(cs.head, cs.tail: _*)
    // unpivot the single counts row into (stage, name, users, conversion)
    val rows = explode(array((1 to k).map { i =>
      struct(lit(i.toLong).as("stage"), lit(stages(i - 1)).as("stage_name"),
        col(s"__c$i").as("n_users"),
        (if (i == 1) lit(null).cast("double")
         else round(col(s"__c$i").cast("double") /
           nullif(col(s"__c${i - 1}"), lit(0L)), 6)).as("conversion"))
    }: _*))
    counts.select(rows.as("__r")).select(col("__r.*"))
  }

  /** Time-window interval join as an EQUI join: for every left row,
    * the count of right rows with `|rightTs - leftTs| <= windowSec`
    * (proximity on floor-microsecond timestamps, engine-exact). The
    * naive Spark plan for this predicate is a broadcast nested loop or
    * a cartesian product; this operator buckets time at the window
    * width, explodes the RIGHT side to its three candidate buckets
    * (b-1, b, b+1 — every within-window pair shares one of them, and
    * the buckets are distinct so no pair double-counts), and joins on
    * the bucket key with the exact range predicate as a post-filter.
    *
    * Scale shape: right side grows 3× (bounded, map-only), then ONE
    * hash-partitioned equi join on the bucket key and one count keyed
    * by the left id — all shuffle-parallel, no nested loop anywhere.
    * Hot seconds (bucket skew) are the one failure mode at 100 TB:
    * AQE skew-join splits oversized buckets, and a caller with a
    * known-hot window should pre-filter or salt the bucket key.
    */
  def intervalJoinCount(
      left: DataFrame,
      leftId: String,
      leftTs: String,
      right: DataFrame,
      rightTs: String,
      windowSec: Long): DataFrame = {
    require(windowSec >= 1, "intervalJoinCount: windowSec must be positive")
    val w = windowSec * 1000000L
    val l = left.select(col(leftId).as("__lid"),
      unix_micros(col(leftTs)).as("__lus"))
      .withColumn("__b", expr(s"__lus div ${w}L"))
    val r = right.select(unix_micros(col(rightTs)).as("__rus"))
      .withColumn("__rb", expr(s"__rus div ${w}L"))
      .select(col("__rus"),
        explode(array(col("__rb") - 1, col("__rb"), col("__rb") + 1))
          .as("__b"))
    // LEFT join + conditional count (not filter-then-count): a left row
    // with bucket neighbors but no in-range ones must still emit 0
    l.join(r, Seq("__b"), "left")
      .groupBy(col("__lid"))
      .agg(sum(when(col("__rus").isNotNull &&
        abs(col("__rus") - col("__lus")) <= w, 1L).otherwise(0L))
        .as("n_nearby"))
      .withColumnRenamed("__lid", leftId)
  }

  /** Weekly cohort retention: users are cohorted by the ISO week of
    * their first event; for each (cohort, week offset) the number of
    * users active in that week. The classic retention triangle.
    *
    * Scale shape: ONE user-keyed shuffle — `min(week)` and the
    * distinct-week set are computed in the same aggregation (both
    * map-side combined; a user's distinct weeks are calendar-bounded,
    * ~52/year, so the set never grows with event volume), then the
    * exploded (cohort, offset) pairs collapse through a tiny
    * cohort-keyed aggregate. The event table is read once and never
    * joined back to itself.
    */
  def retentionCohorts(
      events: DataFrame,
      userCol: String,
      tsCol: String): DataFrame = {
    val w = events.select(col(userCol).as("__u"),
      date_trunc("week", col(tsCol)).cast("date").as("__wk"))
    w.groupBy(col("__u"))
      .agg(min(col("__wk")).as("__cohort"), collect_set(col("__wk")).as("__wks"))
      .select(col("__cohort"), explode(col("__wks")).as("__wk"))
      .groupBy(col("__cohort"),
        (datediff(col("__wk"), col("__cohort")) / 7).cast("long")
          .as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .withColumnRenamed("__cohort", "cohort_week")
  }

  /** Trailing `windowDays`-day distinct active users per observed day
    * (the rolling-DAU/WAU/MAU metric) — EXACT, without a per-day
    * `count_distinct` over the raw stream. Each (user, active-day)
    * pair CONTRIBUTES to the `windowDays` days it keeps the user
    * active in; deduplicating contributions leaves one row per
    * (user, reported-day), so the final count is a plain map-side-
    * combined `count`, not a distinct aggregate.
    *
    * Scale shape: distinct (user, day) is one shuffle of user-day
    * pairs (≪ events); the explode is a constant `windowDays`× blowup
    * of THAT deduped relation; the contribution dedup and the day
    * count are two more keyed map-side-combined aggregates. No
    * expansion ever multiplies the raw event stream, and no state
    * grows with window width beyond the ×w factor. For wide windows
    * (90d+) at 100 TB, the sketch alternative is per-day HLL sketches
    * union-merged across the window (the q131 mergeable-rollup
    * device) at ~1.5 KB/day instead of ×w rows — this operator is the
    * exact path and the oracle for that one.
    *
    * Only days observed in the data are reported (a day with zero
    * events emits no row, even inside another day's window).
    */
  def slidingDistinctUsers(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1 && windowDays <= 3660,
      s"graft: windowDays must be in [1, 3660], got $windowDays")
    val du = events
      .select(col(userCol).as("__u"), to_date(col(tsCol)).as("__d"))
      .distinct()
    val observed = du.select(col("__d")).distinct()
    du.select(col("__u"),
        explode(sequence(col("__d"), date_add(col("__d"), windowDays - 1)))
          .as("__d"))
      .distinct()
      .join(observed, Seq("__d"), "left_semi")
      .groupBy(col("__d").as("day"))
      .agg(count(lit(1)).cast("long").as(s"n_active_${windowDays}d"))
  }

  /** Linear multi-touch attribution: every conversion splits one unit
    * of credit equally across the user's touch events inside the
    * trailing `windowUs` lookback (strictly before the conversion);
    * conversions with no touch in window credit the `(none)` channel
    * whole. The marketing-analytics complement of q130's last-touch
    * `asofJoin` — last-touch answers "what closed it", linear answers
    * "what participated".
    *
    * Output: `(channel, n_touches, credit)` — touch count and exact
    * credit sum per channel. Credit fractions `1/n` are IEEE doubles
    * rounded to 6 decimals and summed as DECIMAL(18,6) (the round-6
    * ladder), so totals are order-independent and engine-portable.
    *
    * Scale shape: conversions join touches on the USER key (one
    * shuffle each side); the range predicate prunes to the lookback.
    * Per-user cost is conversions×touches — bounded by per-user
    * activity, the usual power-user skew handled by AQE skew splits;
    * for pathological users apply an upstream per-user event cap. The
    * per-conversion fan-in count and the channel rollup are both
    * map-side-combined aggregates.
    */
  def linearAttribution(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String,
      conversionType: String,
      touchTypes: Seq[String],
      windowUs: Long): DataFrame = {
    require(touchTypes.nonEmpty, "graft: touchTypes must be non-empty")
    require(windowUs > 0, s"graft: windowUs must be positive, got $windowUs")
    val conv = events.filter(col(typeCol) === conversionType)
      .select(col(userCol).as("__u"), unix_micros(col(tsCol)).as("__cus"),
        col(idCol).as("__cid"))
    val touch = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("__u"), unix_micros(col(tsCol)).as("__tus"),
        col(typeCol).as("__ch"))
    val joined = conv.join(touch,
      conv("__u") === touch("__u") &&
        col("__tus") >= col("__cus") - lit(windowUs) &&
        col("__tus") < col("__cus"),
      "left")
    val perConv = joined.groupBy("__cid")
      .agg(sum(when(col("__ch").isNotNull, 1L).otherwise(0L)).as("__n"),
        collect_list(col("__ch")).as("__chs"))
    val credited = perConv.select(col("__n"),
      explode(when(col("__n") > 0, col("__chs"))
        .otherwise(array(lit("(none)")))).as("channel"),
      when(col("__n") > 0,
        round(lit(1.0) / col("__n").cast("double"), 6))
        .otherwise(lit(1.0)).cast("decimal(18,6)").as("__credit"))
    credited.groupBy("channel")
      .agg(sum(when(col("channel") =!= "(none)", 1L).otherwise(0L))
        .cast("long").as("n_touches"),
        round(sum(col("__credit")).cast("double"), 6).as("credit"))
  }

  /** Peak concurrency per group by SWEEP LINE: each event contributes
    * an interval `[ts, ts + durationUs)`; the answer is the maximum
    * number of simultaneously-open intervals and the first instant it
    * is reached — "how many sessions were open at the worst moment",
    * the capacity-planning question. Boundaries (+1 at start, −1 at
    * end) are ordered `(time, delta, id)`, so at a shared instant the
    * −1 sorts first — exactly half-open semantics (an interval ending
    * at t does not overlap one starting at t).
    *
    * Scale shape: the running concurrency is a per-group prefix sum
    * over 2N boundary rows — it rides [[Rank.stratifiedPrefixSum]]'s
    * two-phase device (ONE range shuffle, partition-local scans, a
    * P×S-row broadcast side table; never a single-task global
    * window). The peak extraction is a group-keyed max plus one
    * boundary-relation re-scan for the argmin instant, both map-side
    * combined.
    */
  def peakConcurrency(
      events: DataFrame,
      groupCol: String,
      tsCol: String,
      idCol: String,
      durationUs: Long): DataFrame = {
    require(durationUs > 0, s"graft: durationUs must be positive")
    val base = events.select(col(groupCol).as("__g"),
      unix_micros(col(tsCol)).as("__us"), col(idCol).as("__id"))
    val bounds = base
      .select(col("__g"), col("__us"), lit(1L).as("__d"), col("__id"))
      .unionAll(base.select(col("__g"),
        (col("__us") + lit(durationUs)).as("__us"), lit(-1L).as("__d"),
        col("__id")))
    val run = Rank.stratifiedPrefixSum(bounds, "__g",
        Seq("__us", "__d", "__id"), "__d")
      .withColumn("__run", col("prefix") + col("__d"))
    val peaks = run.groupBy("__g").agg(max(col("__run")).as("peak"))
    run.join(peaks, Seq("__g"))
      .filter(col("__run") === col("peak"))
      .groupBy(col("__g"), col("peak"))
      .agg(min(col("__us")).as("peak_us"))
      .select(col("__g").as(groupCol), col("peak").cast("long").as("peak"),
        col("peak_us").cast("long").as("peak_us"))
  }

  /** Kaplan–Meier product-limit estimator (Kaplan & Meier 1958) for
    * time-to-event with right censoring — "time to first conversion"
    * where subjects who never convert are censored at the observation
    * horizon, the survival-analysis complement of [[retentionCohorts]]
    * (retention conditions on calendar cohorts; KM handles subjects
    * entering at different times and leaving unobserved).
    *
    * Per subject: origin = first event, event time = first row where
    * `isEvent`; duration = whole days (integral microsecond division,
    * engine-portable). Subjects without an event are censored at
    * `max(ts)` over the corpus. Life table at each day with ≥1 event:
    * `deaths`, `at_risk` (subjects with duration ≥ day), and
    * `survival = Π (1 − d_i/n_i)` with each factor AND each partial
    * product rounded to 6 decimals — a fixed left-to-right IEEE chain
    * both engines reproduce (round-6 is idempotent on round-6
    * doubles, so DuckDB's first-element-seeded `list_reduce` equals
    * Spark's 1.0-seeded `aggregate`).
    *
    * Scale shape: one subject-key shuffle to the per-subject
    * (duration, observed) relation; the life table after the day
    * aggregate is TIME-SPAN-sized (≤ days in the corpus window — a
    * decade of daily granularity is ~3.7k rows), so the unpartitioned
    * windows over it are bounded by calendar time, not corpus size.
    * The horizon is a 1-row broadcast. The cumulative-product array
    * per row is ≤ span-days long (the q177 "collect only the bounded
    * core" shape).
    */
  def kaplanMeier(
      events: DataFrame,
      subjectCol: String,
      tsCol: String,
      isEvent: Column): DataFrame = {
    val us = unix_micros(col(tsCol))
    val perSubj = events
      .groupBy(col(subjectCol).as("__s"))
      .agg(min(us).as("__t0"),
        min(when(isEvent, us)).as("__te"))
    val horizon = events.agg(max(us).as("__hz"))
    val subj = perSubj.crossJoin(broadcast(horizon))
      .select(col("__s"),
        expr("(coalesce(__te, __hz) - __t0) div 86400000000").as("__dur"),
        col("__te").isNotNull.cast("long").as("__obs"))
    val lt = subj.groupBy("__dur")
      .agg(sum(col("__obs")).as("__d"), count(lit(1)).as("__c"))
    // span-days-sized from here on: unpartitioned windows are bounded
    val wPrev = Window.orderBy("__dur")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy("__dur")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = lt
      .withColumn("__n", sum(col("__c")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("__atrisk", col("__n") - coalesce(sum(col("__c")).over(wPrev), lit(0L)))
      .filter(col("__d") > 0)
      .withColumn("__f",
        round(lit(1.0) - col("__d").cast("double") / col("__atrisk"), 6))
    risk
      .withColumn("__fs", collect_list(col("__f")).over(wAll))
      .select(col("__dur").cast("long").as("day"),
        col("__d").cast("long").as("deaths"),
        col("__atrisk").cast("long").as("at_risk"),
        round(aggregate(col("__fs"), lit(1.0d),
          (acc, x) => round(acc * x, 6)), 6).as("survival"))
  }

  /** Sequential-pattern support (the existence core of
    * PrefixSpan/GSP, Agrawal & Srikant 1996): for every ordered
    * event-type triple (a, b, c), how many subjects exhibit it as a
    * strict-time subsequence `t_a < t_b < t_c`. Uses the greedy
    * min-chain equivalence: a subsequence exists iff
    * `t1 = min t(a)`, `t2 = min t(b) > t1`, `t3 = min t(c) > t2`
    * succeeds — greedy-earliest matching never loses a later match,
    * so three bounded joins replace a cubic self-join.
    *
    * Returns `(step1, step2, step3, n_subjects)` for triples with
    * support ≥ `minSupport` — steps may repeat (a, a, b): the chain's
    * strict `>` handles recurrence naturally.
    *
    * Scale shape: every join is subject-keyed; the blow-up factor is
    * the TYPE alphabet, not the stream — stage i holds ≤ |types|^i
    * rows per subject (alphabets are small by construction; gate
    * upstream if not: `|types|² × subjects` must fit the shuffle).
    * The corpus is scanned once per stage, filtered to min-chains
    * map-side before each shuffle.
    */
  def subsequenceSupport(
      events: DataFrame,
      subjectCol: String,
      tsCol: String,
      typeCol: String,
      minSupport: Long = 1L): DataFrame = {
    val ev = events.select(col(subjectCol).as("__s"),
      col(typeCol).as("__t"), unix_micros(col(tsCol)).as("__us"))
      .filter(col("__t").isNotNull)
    val s1 = ev.groupBy("__s", "__t")
      .agg(min(col("__us")).as("__t1"))
      .select(col("__s"), col("__t").as("step1"), col("__t1"))
    val s2 = ev.join(s1, "__s")
      .filter(col("__us") > col("__t1"))
      .groupBy(col("__s"), col("step1"), col("__t").as("step2"))
      .agg(min(col("__us")).as("__t2"))
    val s3 = ev.join(s2, "__s")
      .filter(col("__us") > col("__t2"))
      .groupBy(col("__s"), col("step1"), col("step2"),
        col("__t").as("step3"))
      .agg(min(col("__us")).as("__t3"))
    // s3 is already distinct per (subject, triple) — a plain count
    // avoids the count-distinct Expand (the q164 lesson)
    s3.groupBy("step1", "step2", "step3")
      .agg(count(lit(1)).cast("long").as("n_subjects"))
      .filter(col("n_subjects") >= minSupport)
  }

  /** RFM behavioral segmentation (Hughes 1994): per subject, recency
    * (whole days from last transaction to the corpus horizon),
    * frequency (transaction count), monetary (DECIMAL(18,2) value
    * sum), each quantile-bucketed 1..`nBuckets` by the exact integral
    * split ([[Rank.quantileBuckets]]' `(rk−1)·B DIV n + 1` — same
    * arithmetic on any engine and any partitioning; ranks break ties
    * by subject id, so the segmentation is a pure function of the
    * data). Bucket 1 = smallest metric (most recent / fewest / least
    * valuable); the `segment` string is `r<R>f<F>m<M>`.
    *
    * Scale shape: one subject-keyed aggregate, then three
    * stratified-rank passes over the SUBJECT-sized relation (each the
    * two-phase range-shuffle device above the completeness window, a
    * map-side KeyTable lookup below it — no global window); the
    * horizon is a 1-row broadcast.
    *
    * ==Cache contract== each stage PERSISTS its subject-sized input
    * (MEMORY_AND_DISK) before entering the next rank device; being
    * lazy, the operator cannot release them itself — after
    * materializing the result, call
    * [[graft.ops.Robust.unpersistPersisted]] (as Verify/Bench do per
    * query) or the cached blocks accumulate across calls in a
    * long-lived session.
    */
  def rfmSegments(
      events: DataFrame,
      subjectCol: String,
      tsCol: String,
      isTxn: Column,
      valueCol: String,
      nBuckets: Int = 5): DataFrame = {
    val us = unix_micros(col(tsCol))
    val horizon = events.agg(max(us).as("__hz"))
    val per = events.filter(isTxn)
      .groupBy(col(subjectCol).as("__u"))
      .agg(max(us).as("__last"), count(lit(1)).as("frequency"),
        sum(col(valueCol).cast("decimal(18,2)")).as("__m"))
      .crossJoin(broadcast(horizon))
      .select(col("__u"),
        expr("(__hz - __last) div 86400000000").as("recency_days"),
        col("frequency").cast("long").as("frequency"),
        col("__m").cast("double").as("monetary"))
      .withColumn("__g", lit(1))
    // each stage PERSISTS before entering the next rank device: the
    // value-pinned device reads its input 3× (boundary sample + row
    // side + side table), and the stages NEST — unpersisted, device 3
    // would re-execute devices 1–2 on every read (measured +2.5 s at
    // sf0.1, round 12). The per-user table is subject-count-sized;
    // persistence is safe under value pinning (eviction-recompute
    // reproduces identical buckets), released via the
    // registerPersisted queue.
    def bucketOf(metric: String, as: String)(df: DataFrame): DataFrame =
      Rank.quantileBuckets(Robust.registerPersisted(df), "__g",
        Seq(metric, "__u"), nBuckets)
        .withColumnRenamed("bucket", as).drop("rk", "n_stratum")
    val b = bucketOf("recency_days", "r_bucket")(
      bucketOf("frequency", "f_bucket")(
        bucketOf("monetary", "m_bucket")(per)))
    b.select(col("__u").as(subjectCol), col("recency_days"),
        col("frequency"), col("monetary"),
        col("r_bucket").cast("long"), col("f_bucket").cast("long"),
        col("m_bucket").cast("long"),
        concat(lit("r"), col("r_bucket"), lit("f"), col("f_bucket"),
          lit("m"), col("m_bucket")).as("segment"))
  }

  /** Weekly growth accounting (the new/retained/resurrected/churned
    * decomposition): every active (user, week) is classified as
    * `new` (first-ever week), `retained` (also active the
    * immediately preceding week) or `resurrected` (active before,
    * but not last week); `churned` at week w counts users active in
    * w−1 and not in w. Identity per week:
    * `active(w) = new + retained + resurrected` and
    * `retained(w) = active(w−1) − churned(w)` — the growth ledger
    * behind q93's retention triangle.
    *
    * Churn attribution is bounded to observed weeks: a user's
    * silence after the last week in the data is not yet churn.
    *
    * Scale shape: one distinct (user, week) aggregate, one per-user
    * window (user-cardinality partitions) for the previous/next
    * active week, one broadcast of the 1-row max-week stats, one
    * (week, class) count — nothing corpus-sized past the first
    * aggregate.
    */
  def growthAccounting(
      events: DataFrame,
      userCol: String,
      tsCol: String): DataFrame = {
    val uw = events
      .filter(col(userCol).isNotNull)
      .select(col(userCol).as("__u"),
        date_trunc("week", col(tsCol)).cast("date").as("__wk"))
      .distinct()
    val w = Window.partitionBy("__u").orderBy("__wk")
    val seq0 = uw
      .withColumn("__prev", lag(col("__wk"), 1).over(w))
      .withColumn("__next", lead(col("__wk"), 1).over(w))
    val maxWk = uw.agg(max(col("__wk")).as("__maxwk"))
    val cls = seq0.select(col("__wk"),
      when(col("__prev").isNull, lit("new"))
        .when(datediff(col("__wk"), col("__prev")) === 7, lit("retained"))
        .otherwise(lit("resurrected")).as("__cls"))
      .groupBy("__wk")
      .agg(sum(when(col("__cls") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("__cls") === "retained", 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("__cls") === "resurrected", 1L).otherwise(0L))
          .as("n_resurrected"))
    // a churn event lands on week prev+7 — emit it there, bounded to
    // the observed range
    val churn = seq0.crossJoin(broadcast(maxWk))
      .filter((col("__next").isNull ||
        datediff(col("__next"), col("__wk")) > 7) &&
        date_add(col("__wk"), 7) <= col("__maxwk"))
      .select(date_add(col("__wk"), 7).as("__wk"))
      .groupBy("__wk").agg(count(lit(1)).as("n_churned"))
    cls.join(churn, Seq("__wk"), "full_outer")
      .select(col("__wk").as("week"),
        coalesce(col("n_new"), lit(0L)).cast("long").as("n_new"),
        coalesce(col("n_retained"), lit(0L)).cast("long").as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).cast("long")
          .as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).cast("long").as("n_churned"))
  }

  /** Burst throttling (debounce): drop an event when ANOTHER event of
    * the same key precedes it within `minGapSeconds` — the telemetry
    * rate-limit pass that runs before sessionization so retry storms
    * and double-fires don't inflate counts. Stateless lag-to-previous-
    * EVENT semantics (each row looks one row back, kept or not); the
    * chained keep-anchored form needs per-key state — that is the
    * streaming dedup family's job (q83), not a batch window's.
    *
    * The gap is the floor-seconds difference (timestamp→long cast =
    * DuckDB `date_diff('second', …)` boundary counting — the q32
    * sessionize device), so the kept set is engine-portable;
    * `orderCols` must make the per-key order total.
    *
    * Scale shape: ONE window partitioned by the key (user-cardinality
    * partitions — never a global window); filter runs in the same
    * stage.
    */
  def debounce(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      orderCols: Seq[String],
      minGapSeconds: Long): DataFrame = {
    require(minGapSeconds >= 0,
      s"minGapSeconds must be >= 0, got $minGapSeconds")
    require(keyCols.nonEmpty, "debounce needs at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((col(tsCol) +: orderCols.map(col)): _*)
    val secs = col(tsCol).cast("long")
    val prev = lag(secs, 1).over(w)
    events
      .withColumn("__gap", secs - prev)
      .filter(col("__gap").isNull || col("__gap") > lit(minGapSeconds))
      .drop("__gap")
  }

  /** Cohort LTV triangle: cumulative per-user revenue by acquisition
    * week × weeks-since-acquisition — the MONETARY extension of
    * [[retentionCohorts]] (retention answers "do they come back",
    * this answers "what are they worth by age"). `valueCol` rows with
    * NULL contribute nothing; a user's cohort is the week of their
    * FIRST event of any kind. NULL users are excluded entirely (the
    * [[growthAccounting]] contract — an anonymous sentinel is not a
    * cohort member, and counting it would skew `ltv_per_user`).
    *
    * Output per (cohort week, age week): `n_users` (cohort size —
    * constant down the row), `week_rev`, `cum_rev`, and
    * `ltv_per_user` (= cum/size, round 6).
    *
    * Parity chain: weekly revenue sums are exact DECIMAL(18,2); the
    * cumulative is a window over the cohort×age table (weeks², never
    * data-sized) summing decimals — order-free; only the final
    * per-user division is a double, rounded 6.
    *
    * Scale shape: one user-keyed aggregate for cohorts (map-side
    * combined), one broadcast-back join, one (cohort, age) aggregate;
    * the cumulative window runs on the weeks²-sized triangle.
    */
  def cohortLtv(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      valueCol: String): DataFrame = {
    val base = events
      .filter(col(userCol).isNotNull)
      .select(col(userCol).as("__u"),
      date_trunc("week", col(tsCol)).cast("date").as("__wk"),
      coalesce(col(valueCol).cast("decimal(18,2)"),
        lit(0).cast("decimal(18,2)")).as("__v"))
    val cohorts = base.groupBy("__u").agg(min(col("__wk")).as("__cohort"))
    val sizes = cohorts.groupBy("__cohort")
      .agg(countDistinct(col("__u")).as("__n_users"))
    val weekly = base.join(cohorts, "__u")
      .groupBy(col("__cohort"),
        (datediff(col("__wk"), col("__cohort")) / 7).cast("long")
          .as("age_week"))
      .agg(sum(col("__v")).cast("decimal(28,2)").as("__rev"))
    val wCum = Window.partitionBy("__cohort").orderBy("age_week")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    weekly
      .withColumn("__cum", sum(col("__rev")).over(wCum)
        .cast("decimal(38,2)"))
      .join(broadcast(sizes), "__cohort")
      .select(col("__cohort").as("cohort_week"), col("age_week"),
        col("__n_users").cast("long").as("n_users"),
        col("__rev").cast("double").as("week_rev"),
        col("__cum").cast("double").as("cum_rev"),
        round(col("__cum").cast("double") /
          col("__n_users").cast("double"), 6).as("ltv_per_user"))
  }

  /** First-order Markov transition matrix over per-user event
    * streams: for each ordered (prev_type → next_type) step, the
    * count and row-normalized probability — the behavioral model a
    * telemetry pipeline fits before simulating load, detecting
    * anomalous flows, or generating synthetic sessions.
    *
    * Scale shape: ONE shuffle on the user key (the `lag` window is
    * per-user, exactly the sessionize exchange), then the transition
    * aggregate map-side combines into a ≤ T² cell table for T event
    * types — the corpus crosses one exchange, the matrix is bounded
    * by the type vocabulary, never the data.
    *
    * Probability parity: counts are exact longs; the 6-dp probability
    * uses half-up INTEGER division `(2·c·10⁶ + tot) div (2·tot)` — a
    * plain `round(c/tot, 6)` lands on exact .5 micro boundaries for
    * small-integer ratios, where Spark (exact decimal expansion) and
    * DuckDB (double arithmetic) round differently (the q235 device).
    */
  def transitionMatrix(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val steps = df
      .select(col(userCol), col(tsCol), col(tieCol), col(typeCol).as("next_type"))
      .withColumn("prev_type", lag(col("next_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
    val counts = steps.groupBy("prev_type", "next_type")
      .agg(count(lit(1)).as("n_steps"))
    val totals = Window.partitionBy("prev_type")
    counts
      .withColumn("__tot", sum(col("n_steps")).over(totals))
      .select(col("prev_type"), col("next_type"),
        col("n_steps").cast("long").as("n_steps"),
        (expr("(2L * n_steps * 1000000L + __tot) div (2L * __tot)")
          .cast("double") / lit(1000000.0d)).as("p"))
  }

  /** Stationary distribution of [[transitionMatrix]]'s chain by
    * driver-side power iteration: π ← πP from the uniform start until
    * the sup-norm step change is below `tol` (or `maxIter`). The
    * matrix is a bounded T² table by construction (event-type
    * vocabulary, not corpus), so the collect is result-sized — the
    * same class as the k-means centroid pull. Returns
    * `(state, pi, n_out_steps)` with π rounded to 6 dp.
    *
    * States with no outgoing steps (absorbing under the observed
    * data) keep their mass: the iteration treats a missing row as a
    * self-loop, the standard stochastic completion.
    */
  def stationaryDistribution(
      transitions: DataFrame,
      tol: Double = 1e-12,
      maxIter: Int = 200,
      roundOutput: Boolean = true): DataFrame = {
    val spark = transitions.sparkSession
    val rows = transitions
      .select(col("prev_type"), col("next_type"),
        col("n_steps").cast("double")).collect()
    val states = rows.flatMap(r => Seq(r.getString(0), r.getString(1)))
      .distinct.sorted
    val idx = states.zipWithIndex.toMap
    val t = states.length
    val cnt = Array.ofDim[Double](t, t)
    rows.foreach(r => cnt(idx(r.getString(0)))(idx(r.getString(1))) = r.getDouble(2))
    val rowSum = cnt.map(_.sum)
    val p = Array.tabulate(t, t) { (i, j) =>
      if (rowSum(i) == 0.0) { if (i == j) 1.0 else 0.0 } // stochastic completion
      else cnt(i)(j) / rowSum(i)
    }
    var pi = Array.fill(t)(1.0 / t)
    var it = 0
    var delta = Double.MaxValue
    while (it < maxIter && delta > tol) {
      val next = new Array[Double](t)
      var i = 0
      while (i < t) {
        val w = pi(i); val row = p(i)
        var j = 0
        while (j < t) { next(j) += w * row(j); j += 1 }
        i += 1
      }
      delta = next.indices.map(j => math.abs(next(j) - pi(j))).max
      pi = next
      it += 1
    }
    import spark.implicits._
    states.indices.map { i =>
      (states(i),
        if (roundOutput)
          java.math.BigDecimal.valueOf(pi(i))
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        else pi(i), // unrounded for fixpoint contracts (q242): a 6-dp
                    // π carries ~5e-7 residual that is NOT the chain's
        rowSum(i).toLong)
    }.toDF("state", "pi", "n_out_steps")
  }
}
