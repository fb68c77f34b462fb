package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series operators over an irregular event stream:
  * gap-filling (resample to a dense hourly grid with LOCF) and
  * two-window mean-shift detection. Complements the event operators in
  * [[Events]] (sessionize/funnel/retention act on the RAW stream; these
  * act on its REGULARIZED aggregate series).
  *
  * Scale shape, both ops: the corpus crosses one hash shuffle to the
  * (key, bucket) aggregate; everything after runs on the AGGREGATED
  * series (keys × buckets rows — e.g. 5 types × 720 hours, never
  * corpus-sized). The dense-grid explode generates `span` rows per key
  * map-side from a 2-column (min, max) row; a `raise_error` guard
  * fail-fasts a runaway span (a 1970 sentinel timestamp would
  * otherwise explode ~500k rows per key). Per-key windows order by the
  * bucket id over the aggregated series — group size = span, bounded
  * by the guard.
  */
object TimeSeries {

  /** Epoch-hour bucket id (hours since 1970-01-01 UTC) — integral and
    * engine-portable (DuckDB: `epoch(date_trunc('hour', ts)) / 3600`).
    * unix_seconds of a truncated hour is an exact multiple of 3600 and
    * ≪ 2^53, so the double division is exact.
    */
  def epochHour(ts: Column): Column =
    (unix_seconds(date_trunc("hour", ts)) / 3600).cast("long")

  /** Epoch-day bucket id. */
  def epochDay(ts: Column): Column =
    (unix_seconds(date_trunc("day", ts)) / 86400).cast("long")

  /** Resample an event stream to a DENSE per-key hourly grid:
    * aggregate to (key, hour) buckets, generate every hour between
    * each key's first and last active hour, and carry the last
    * observed total forward across gaps (LOCF — last observation
    * carried forward). Gap hours report `n = 0` and the carried
    * `filled_total`; hours before a key's first observation cannot
    * exist (the grid starts at the first active hour).
    *
    * Output: `(key, hr, n, filled_total)` — `hr` is [[epochHour]].
    */
  def gapFillHourly(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      maxSpanHours: Int = 200000): DataFrame = {
    val hourly = df
      .groupBy(col(keyCol), epochHour(col(tsCol)).as("hr"))
      .agg(count(lit(1)).as("__n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("__tot"))
    val span = hourly.groupBy(keyCol)
      .agg(min("hr").as("__mn"), max("hr").as("__mx"))
      // fail-fast, map-side: a sentinel timestamp (1970/2999) in the
      // input would silently explode the grid — surface it instead
      .withColumn("__mx", when(col("__mx") - col("__mn") < maxSpanHours,
        col("__mx")).otherwise(raise_error(concat(
        lit(s"gapFillHourly: key span exceeds $maxSpanHours hours for "),
        col(keyCol).cast("string")))))
    val grid = span.select(col(keyCol),
      explode(sequence(col("__mn"), col("__mx"))).as("hr"))
    val wFill = Window.partitionBy(keyCol).orderBy("hr")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq(keyCol, "hr"), "left")
      .select(col(keyCol), col("hr"),
        coalesce(col("__n"), lit(0L)).cast("long").as("n"),
        last(col("__tot"), ignoreNulls = true).over(wFill)
          .cast("double").as("filled_total"))
  }

  /** Two-window mean-shift detection over the per-key DAILY series:
    * for each (key, day) with a full 14-day history, compare the mean
    * of the most recent `w` days (ROWS -w+1..0) against the mean of
    * the `w` days before them (ROWS -2w+1..-w). A large |shift| flags
    * a level change — the windowed-baseline changepoint heuristic
    * (CUSUM's two-sample cousin, expressible as pure window algebra —
    * no recursive state, so it stays declarative and engine-portable).
    *
    * Output: `(key, day, daily_total, ma_recent, ma_prior, shift)` —
    * only days where BOTH windows are full (2w days of history).
    * Means divide DECIMAL sums as doubles, rounded to 6.
    */
  def meanShiftDaily(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      w: Int = 7): DataFrame = {
    require(w >= 1, s"window must be >= 1 day, got $w")
    val daily = df
      .groupBy(col(keyCol), epochDay(col(tsCol)).as("day"))
      .agg(sum(col(valueCol).cast("decimal(18,2)")).as("__tot"))
    val ord = Window.partitionBy(keyCol).orderBy("day")
    val wRecent = ord.rowsBetween(-(w - 1), 0)
    val wPrior = ord.rowsBetween(-(2 * w - 1), -w)
    daily
      .withColumn("__nr", count(lit(1)).over(wRecent))
      .withColumn("__np", count(lit(1)).over(wPrior))
      .withColumn("__sr", sum(col("__tot")).over(wRecent))
      .withColumn("__sp", sum(col("__tot")).over(wPrior))
      // ROWS frames count PRESENT days only: a gap day would silently
      // widen the time span, so demand full frames on a dense series
      // (the daily grid here is dense whenever every day has events;
      // compose with gapFillHourly-style densification when not)
      .filter(col("__nr") === w && col("__np") === w)
      // means through the engine-proof micro device (the q271
      // hazard class — revenue sums run to thousands, where the
      // ROUND(double,6) divergence window widens); shift is the
      // exact DIFFERENCE of the two micro integers, so it equals
      // ma_recent − ma_prior bit-for-bit and never divides a
      // (possibly negative) numerator
      .withColumn("__mrm", Parity.microRatio(col("__sr"), lit(w)))
      .withColumn("__mpm", Parity.microRatio(col("__sp"), lit(w)))
      .select(col(keyCol), col("day"),
        col("__tot").cast("double").as("daily_total"),
        (col("__mrm").cast("double") / lit(1e6)).as("ma_recent"),
        (col("__mpm").cast("double") / lit(1e6)).as("ma_prior"),
        ((col("__mrm") - col("__mpm")).cast("double") / lit(1e6))
          .as("shift"))
  }

  /** Trailing exact median over the last `window` observations per
    * key — rolling robust smoothing (the median filter signal
    * processing runs before changepoint/outlier logic; unlike a
    * moving average it ignores isolated spikes entirely). Appends
    * `med_<window>` to every input row.
    *
    * Scale shape: ONE shuffle on the key; the frame is ROWS-bounded
    * (`window` values), so the per-row aggregation buffer is
    * constant-sized — the corpus-proportional-buffer concern of the
    * exact-percentile family (Percentiles.scala) does not apply to
    * bounded frames. Partitions are key-sized and the window exec
    * spills; a single hot key is the usual skew caveat (pre-split hot
    * keys upstream). The interpolated-median semantics match SQL
    * `percentile` / DuckDB `quantile_cont` windows bit-for-bit.
    * `orderCols` must totally order each key's rows (include a unique
    * id last) or frame contents are nondeterministic.
    */
  def rollingMedian(
      df: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      valueCol: String,
      window: Int = 7): DataFrame = {
    require(window >= 1 && window <= 100000,
      s"graft: window must be in [1, 1e5], got $window")
    require(orderCols.nonEmpty, "graft: orderCols must be non-empty")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-(window - 1), 0)
    df.withColumn(s"med_$window",
      expr(s"percentile($valueCol, 0.5)").over(w))
  }

  /** Theil–Sen robust trend per key: the MEDIAN of all pairwise
    * slopes `(n_j − n_i)/(day_j − day_i)` over the key's daily
    * counts (Theil 1950 / Sen 1968) — a 29.3%-breakdown trend
    * estimate that one anomalous day cannot drag, where the q139
    * OLS slope follows every outlier. Returns
    * `(key…, n_pairs, slope)`.
    *
    * Scale shape: the corpus collapses to (key × day) daily counts
    * first (ONE map-side-combined shuffle); pairwise slopes are a
    * per-key self-join of that tiny relation — |days|² per key,
    * bounded by the observation span, never by corpus size, and
    * `maxDays` fail-fasts a key that would expand quadratically
    * beyond it. The median runs [[Percentiles.exactTenths]]'s
    * distributed selection over slopes QUANTIZED to half-up micro
    * integers (6-dp slope precision): a raw-double median
    * interpolates between two arbitrary doubles, where the engines'
    * different formula orders sit one ulp apart (the q163/10×-gate
    * class — it held here only because tied small-rational slopes
    * usually hit the vlo==vhi shortcut), while every interpolation
    * over integer-valued doubles is exact in any formula order, and
    * the one closing /1e6 is a single correctly-rounded op on both
    * engines.
    */
  def theilSenDaily(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      maxDays: Int = 10000): DataFrame = {
    require(maxDays >= 2, s"graft: maxDays must be >= 2, got $maxDays")
    val daily = df.groupBy(col(keyCol).as("__k"),
        epochDay(col(tsCol)).as("__day"))
      .agg(count(lit(1)).as("__n"))
    val spans = daily.groupBy("__k").agg(count(lit(1)).as("__days"))
      .select(col("__k"),
        when(col("__days") <= maxDays, col("__days"))
          .otherwise(raise_error(concat(
            lit(s"theilSenDaily: key exceeds $maxDays observed days: "),
            col("__k").cast("string")))).as("__days"))
    val a = daily.select(col("__k"), col("__day").as("__da"),
      col("__n").as("__na"))
    val b = daily.select(col("__k"), col("__day").as("__db"),
      col("__n").as("__nb"))
    val num = col("__nb") - col("__na")
    val den = col("__db") - col("__da") // > 0 under the __da < __db cut
    val slopes = a.join(b, "__k").filter(col("__da") < col("__db"))
      .join(broadcast(spans), "__k") // the guard evaluates per key
      .select(col("__k"),
        when(num < 0, -graft.ops.Parity.microRatio(-num, den))
          .otherwise(graft.ops.Parity.microRatio(num, den))
          .cast("double").as("__sm"))
    Percentiles.exactTenths(slopes, Seq("__k"), "__sm", Seq(0.5))
      .select(col("__k").as(keyCol), col("n").as("n_pairs"),
        (element_at(col("pcts"), 1) / lit(1e6)).as("slope"))
  }

  /** Time-weighted average (TWAP) per key: each observation holds its
    * value until the NEXT observation, so the average is
    * `Σ vᵢ·(tᵢ₊₁ − tᵢ) / (t_last − t_first)` — the right mean for
    * irregularly-sampled series (a price quoted once overnight must
    * weigh the whole night, not one tick). Keys with a single
    * observation have zero span and yield NULL.
    *
    * Scale shape: ONE key shuffle (the lead window); per-term
    * products `round(v·Δus, 6)` accumulate as exact DECIMAL(28,6)
    * (order-independent; 28 digits hold ~10²² µs-weighted mass,
    * centuries of microseconds at price scale) and the closing
    * division is one IEEE op.
    */
  def twap(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      valueCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__k")).orderBy(col("__us"), col("__id"))
    val base = df.select(col(keyCol).as("__k"),
      unix_micros(col(tsCol)).as("__us"), col(idCol).as("__id"),
      col(valueCol).cast("double").as("__v"))
    base
      .withColumn("__next", lead(col("__us"), 1).over(w))
      .withColumn("__term",
        round(col("__v") * (col("__next") - col("__us")).cast("double"), 6)
          .cast("decimal(28,6)"))
      .groupBy(col("__k").as(keyCol))
      .agg(count(lit(1)).cast("long").as("n_obs"),
        min(col("__us")).as("__t0"), max(col("__us")).as("__t1"),
        sum(col("__term")).as("__wsum"))
      .select(col(keyCol), col("n_obs"),
        (col("__wsum").cast("double") /
          (col("__t1") - col("__t0")).cast("double")).as("twap"))
  }

  /** Holt linear (double) exponential smoothing (Holt 1957) per key
    * over daily totals, plus an `h`-day-ahead forecast
    * `level + h·trend` — the trend-aware upgrade of q06's seasonal
    * mean forecast for capacity planning over telemetry.
    *
    * Recurrence (α = level gain, β = trend gain), each value rounded
    * to 6 per step so the chain is a fixed IEEE sequence both engines
    * replay: `l_t = α·y_t + (1−α)(l_{t−1} + b_{t−1})`,
    * `b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}`; seeded l₁ = y₁, b₁ = 0.
    * CAUTION for parity: `1−α` is computed ONCE in Scala and embedded
    * as a literal on both sides — `1.0 - 0.3` and the literal `0.7`
    * are DIFFERENT doubles (1 ulp), which would silently fork the
    * chain; the oracle SQL must interpolate
    * [[holtOneMinus]](alpha/beta), not write `0.7e0`.
    *
    * Scale shape: one corpus-scale (key, day) DECIMAL aggregate
    * (map-side combined); the fold then runs per key over the
    * SPAN-DAYS-sized daily array (the q180 bounded-chain device —
    * calendar-bounded, not corpus-bounded). Inherently sequential
    * smoothing never touches more than one key's days in one task.
    */
  def holtLinear(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      alpha: Double = 0.3,
      beta: Double = 0.1,
      horizon: Int = 7): DataFrame = {
    require(alpha > 0 && alpha <= 1 && beta >= 0 && beta <= 1,
      s"graft: alpha in (0,1], beta in [0,1], got $alpha, $beta")
    require(horizon >= 0, s"graft: horizon must be >= 0, got $horizon")
    val ca = lit(alpha); val c1a = lit(holtOneMinus(alpha))
    val cb = lit(beta); val c1b = lit(holtOneMinus(beta))
    val daily = df.filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol).as("__k"),
        to_date(date_trunc("DAY", col(tsCol))).as("__day"))
      .agg(sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("__y"))
    val ser = daily.groupBy("__k")
      .agg(transform(
        sort_array(collect_list(struct(col("__day"), col("__y")))),
        s => s.getField("__y")).as("__ys"),
        count(lit(1)).as("n_days"))
    val fold = aggregate(
      slice(col("__ys"), lit(2), greatest(size(col("__ys")) - 1, lit(0))),
      array(element_at(col("__ys"), 1), lit(null).cast("double")),
      (acc, x) => {
        val prevL = element_at(acc, 1)
        val prevB = coalesce(element_at(acc, 2), lit(0.0d))
        val l = round(ca * x + c1a * (prevL + prevB), 6)
        array(l, round(cb * (l - prevL) + c1b * prevB, 6))
      })
    ser.withColumn("__lb", fold)
      .select(col("__k").as(keyCol), col("n_days").cast("long").as("n_days"),
        element_at(col("__lb"), 1).as("level"),
        coalesce(element_at(col("__lb"), 2), lit(0.0d)).as("trend"),
        round(element_at(col("__lb"), 1) +
          lit(horizon.toDouble) * coalesce(element_at(col("__lb"), 2),
            lit(0.0d)), 6).as("forecast"))
  }

  /** `1 − x` computed once here so Spark literals and interpolated
    * oracle SQL share the exact double (see [[holtLinear]]). */
  def holtOneMinus(x: Double): Double = 1.0 - x

  /** Sample autocorrelation of the daily `valCol` total at lags
    * 1..`maxLag`, per `groupCol` (Box–Jenkins): the
    * is-yesterday-predictive readout that decides whether q193's
    * trend smoothing is even warranted. Uses the full-series-mean
    * estimator `Σ(y_t−ȳ)(y_{t+k}−ȳ) / Σ(y_t−ȳ)²` over the lag-k day
    * pairs that exist (missing days simply pair with nothing —
    * identical on both engines).
    *
    * Parity chain: daily totals, their squares, and the lag cross
    * products are exact DECIMALs ((18,2) totals, (37,4) products);
    * the estimator is then ONE fixed double expression over those
    * exact scalars — `(sxy − ȳ·(sh+st) + m·ȳ²)/(syy − s²/n)` — with
    * no order-dependent double summation anywhere. Lag rows with a
    * non-positive variance denominator yield NULL (constant series),
    * mirrored by the oracle's CASE guard.
    *
    * Scale shape: the corpus collapses in ONE map-side-combined
    * aggregate to the (group × day) table; the lag pairing is an
    * EQUI-join (the lag index explodes 1..maxLag on the right side,
    * joining on `date_sub(day, k)` — never a range/theta join) over
    * that tiny table, and the stats join back via broadcast.
    */
  def autocorr(
      df: DataFrame,
      groupCol: String,
      tsCol: String,
      valCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val daily = df.filter(col(valCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol).as("__g"),
        to_date(date_trunc("day", col(tsCol))).as("__d"))
      .agg(sum(col(valCol).cast("decimal(18,2)")).cast("decimal(18,2)")
        .as("__y"))
    val stats = daily.groupBy("__g").agg(
      count(lit(1)).as("__n"),
      sum(col("__y")).cast("decimal(28,2)").as("__s"),
      sum(col("__y") * col("__y")).cast("decimal(38,4)").as("__syy"))
    val rhs = daily
      .select(col("__g").as("__g2"), col("__d").as("__d2"),
        col("__y").as("__yb"),
        explode(sequence(lit(1), lit(maxLag))).as("lag"))
      .withColumn("__da", date_sub(col("__d2"), col("lag")))
    val pairs = daily
      .join(rhs, col("__g") === col("__g2") && col("__d") === col("__da"))
      .groupBy(col("__g"), col("lag"))
      .agg(count(lit(1)).as("__m"),
        sum(col("__y") * col("__yb")).cast("decimal(38,4)").as("__sxy"),
        sum(col("__y")).cast("decimal(28,2)").as("__sh"),
        sum(col("__yb")).cast("decimal(28,2)").as("__st"))
    val joined = pairs.join(broadcast(stats), "__g")
    val nD = col("__n").cast("double")
    val ybar = col("__s").cast("double") / nD
    val num = col("__sxy").cast("double") -
      ybar * (col("__sh").cast("double") + col("__st").cast("double")) +
      col("__m").cast("double") * ybar * ybar
    val den = col("__syy").cast("double") -
      col("__s").cast("double") * col("__s").cast("double") / nD
    joined.select(col("__g").as(groupCol), col("lag").cast("long").as("lag"),
      col("__n").cast("long").as("n_days"),
      col("__m").cast("long").as("n_pairs"),
      when(den > lit(0.0d), round(num / den, 6)).as("acf"))
  }

  /** Day-of-week seasonality profile of the daily `valCol` total per
    * `groupCol`: each ISO weekday's share of the group's total and
    * its mean-vs-overall-daily-mean ratio — the calendar complement
    * of [[autocorr]] (lag-7 structure read directly). Weekday is
    * computed from the epoch-day index (`((ed + 3) mod 7) + 1`,
    * 1 = Monday) — portable arithmetic, never an engine DOW builtin
    * (Spark's `dayofweek` is 1 = Sunday, DuckDB's is 0 = Sunday).
    *
    * Parity chain: daily and weekday totals are exact DECIMALs; the
    * share and ratio are single double divisions of exact scalars,
    * rounded to 6. Scale shape: the corpus collapses in one
    * map-side-combined aggregate to (group × day); everything after
    * is (group × 7)-sized with the group totals broadcast back.
    */
  def dowProfile(
      df: DataFrame,
      groupCol: String,
      tsCol: String,
      valCol: String): DataFrame = {
    val daily = df.filter(col(valCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol).as("__g"),
        to_date(date_trunc("day", col(tsCol))).as("__d"))
      .agg(sum(col(valCol).cast("decimal(18,2)")).cast("decimal(18,2)")
        .as("__y"))
      .withColumn("__dow",
        ((datediff(col("__d"), to_date(lit("1970-01-01"))) + lit(3)) % 7 +
          lit(1)).cast("long"))
    val byDow = daily.groupBy("__g", "__dow")
      .agg(count(lit(1)).as("__nd"),
        sum(col("__y")).cast("decimal(28,2)").as("__t"))
    val tot = daily.groupBy("__g")
      .agg(count(lit(1)).as("__n"),
        sum(col("__y")).cast("decimal(28,2)").as("__s"))
    byDow.join(broadcast(tot), "__g")
      .select(col("__g").as(groupCol), col("__dow").as("isodow"),
        col("__nd").cast("long").as("n_days"),
        col("__t").cast("double").as("total"),
        round(col("__t").cast("double") / col("__s").cast("double"), 6)
          .as("share"),
        round((col("__t").cast("double") / col("__nd").cast("double")) /
          (col("__s").cast("double") / col("__n").cast("double")), 6)
          .as("rel_mean"))
  }

  /** CUSUM level-shift scan (Page 1954) over the daily `valCol`
    * total per `groupCol`: the largest positive and negative
    * cumulative excursions of the deviation-from-mean walk, and the
    * day each peaks — the changepoint screen run before trusting a
    * drift statistic like q148's PSI (a mean shift mid-window
    * poisons both halves of a two-sample comparison).
    *
    * EXACT integral device: with target μ = mean daily total, the
    * classic recursions `C⁺_t = max(0, C⁺_{t-1} + x_t − μ)` /
    * `C⁻_t = max(0, C⁻_{t-1} + μ − x_t)` equal the running-min/max
    * identities `C⁺_t = W_t − min_{j≤t} W_j`,
    * `C⁻_t = max_{j≤t} W_j − W_t` over the walk
    * `W_t = Σ_{j≤t}(x_j − μ)`. Scaling by n removes the division:
    * `n·W_t = n·S_t − t·S_n` in integer cents — every intermediate
    * is an exact DECIMAL(38,0); the only doubles are the final
    * `/(n·100)` readouts, rounded 6. No fold, no libm — the whole
    * scan is two windows over the (group × day) relation.
    *
    * Ties break to the EARLIEST peak day: the argmax key is the
    * single integral `excursion·10⁶ − epoch_day` (DuckDB's arg_max
    * takes no struct keys; the 10⁶ multiplier dominates any epoch
    * day through year ~4707, so the encoding is exactly the
    * (excursion, −day) lexicographic order) — engine-portable.
    *
    * Scale shape: one map-side-combined aggregate to (group × day);
    * the windows partition by group over day-count-bounded rows;
    * group stats broadcast back.
    */
  def cusum(
      df: DataFrame,
      groupCol: String,
      tsCol: String,
      valCol: String): DataFrame = {
    val daily = df.filter(col(valCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol).as("__g"),
        to_date(date_trunc("day", col(tsCol))).as("__d"))
      .agg((sum(col(valCol).cast("decimal(18,2)")) * 100)
        .cast("decimal(38,0)").as("__c"))
    val stats = daily.groupBy("__g")
      .agg(count(lit(1)).as("__n"),
        sum(col("__c")).cast("decimal(38,0)").as("__s"))
    val wOrd = Window.partitionBy("__g").orderBy("__d")
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val walked = daily.join(broadcast(stats), "__g")
      .withColumn("__t", count(lit(1)).over(wRun))
      .withColumn("__w",
        (sum(col("__c")).over(wRun) * col("__n") -
          col("__t") * col("__s")).cast("decimal(38,0)"))
    val cused = walked
      .withColumn("__cpos", (col("__w") - min(col("__w")).over(wRun))
        .cast("decimal(38,0)"))
      .withColumn("__cneg", (max(col("__w")).over(wRun) - col("__w"))
        .cast("decimal(38,0)"))
      .withColumn("__ed", datediff(col("__d"), to_date(lit("1970-01-01"))))
    val den = col("__nn").cast("double") * lit(100.0d)
    cused.groupBy("__g")
      .agg(max(col("__n")).as("__nn"), max(col("__s")).as("__ss"),
        max(col("__cpos")).as("__mp"), max(col("__cneg")).as("__mn"),
        max_by(col("__d"),
          (col("__cpos") * 1000000 - col("__ed")).cast("decimal(38,0)"))
          .as("__dp"),
        max_by(col("__d"),
          (col("__cneg") * 1000000 - col("__ed")).cast("decimal(38,0)"))
          .as("__dn"))
      .select(col("__g").as(groupCol),
        col("__nn").cast("long").as("n_days"),
        round(col("__ss").cast("double") /
          (col("__nn").cast("double") * lit(100.0d)), 6).as("mean_daily"),
        round(col("__mp").cast("double") / den, 6).as("max_cusum_pos"),
        col("__dp").as("day_pos"),
        round(col("__mn").cast("double") / den, 6).as("max_cusum_neg"),
        col("__dn").as("day_neg"))
  }

  /** Cross-correlation function between two daily series drawn from
    * the same event log (Box & Jenkins): Pearson r between series A
    * at day d and series B at day d + lag, for lag in
    * [−maxLag, maxLag] — the lead/lag readout between two event
    * types ("do clicks lead purchases, and by how many days?"),
    * the cross-series complement of [[autocorr]].
    *
    * Each lag's correlation is the plain Pearson of the ALIGNED
    * pairs (pairwise-complete; days missing from either series drop
    * out of that lag). Parity chain: daily totals exact
    * DECIMAL(18,2); the five pair sums in DECIMAL(38,4)/( 28,2);
    * one fixed double expression + correctly-rounded √ per lag,
    * round 6. Degenerate lags (constant side, < 2 pairs) are NULL.
    *
    * Scale shape: two map-side-combined daily aggregates; the lag
    * pairing is an equi-join on the shifted date over day-count ×
    * (2·maxLag+1) rows; everything after is lag-sized.
    */
  def crossCorr(
      df: DataFrame,
      tsCol: String,
      valCol: String,
      aFilter: Column,
      bFilter: Column,
      maxLag: Int): DataFrame = {
    require(maxLag >= 0, s"maxLag must be >= 0, got $maxLag")
    def daily(f: Column, out: String) =
      df.filter(f && col(valCol).isNotNull)
        .groupBy(to_date(date_trunc("day", col(tsCol))).as("__d"))
        .agg(sum(col(valCol).cast("decimal(18,2)")).cast("decimal(18,2)")
          .as(out))
    val a = daily(aFilter, "__a")
    val b = daily(bFilter, "__b")
      .select(col("__d").as("__db"), col("__b"),
        explode(sequence(lit(-maxLag), lit(maxLag))).as("lag"))
      .withColumn("__da", date_sub(col("__db"), col("lag")))
    val pairs = a.join(b, col("__d") === col("__da"))
      .groupBy("lag")
      .agg(count(lit(1)).as("__m"),
        sum(col("__a")).cast("decimal(28,2)").as("__sa"),
        sum(col("__b")).cast("decimal(28,2)").as("__sb"),
        sum(col("__a") * col("__a")).cast("decimal(38,4)").as("__saa"),
        sum(col("__b") * col("__b")).cast("decimal(38,4)").as("__sbb"),
        sum(col("__a") * col("__b")).cast("decimal(38,4)").as("__sab"))
    val m = col("__m").cast("double")
    val num = m * col("__sab").cast("double") -
      col("__sa").cast("double") * col("__sb").cast("double")
    val va = m * col("__saa").cast("double") -
      col("__sa").cast("double") * col("__sa").cast("double")
    val vb = m * col("__sbb").cast("double") -
      col("__sb").cast("double") * col("__sb").cast("double")
    pairs.select(col("lag").cast("long").as("lag"),
      col("__m").cast("long").as("n_pairs"),
      when(col("__m") > 1 && va > lit(0.0d) && vb > lit(0.0d),
        round(num / sqrt(va * vb), 6)).as("ccf"))
  }

  /** Single change-point by binary segmentation on the daily total
    * series: the split day t minimizing SSE_left + SSE_right (CUSUM's
    * [[cusum]] flags drift direction; this LOCATES the level shift
    * and quantifies it — the first split of the classic binary
    * segmentation recursion, which at depth 1 is also the likelihood-
    * ratio test location for one mean change).
    *
    * The candidate scan is closed-form from prefix moments:
    * SSE(1..i) = S2 − S1²/n per side, with S1/S2 carried as EXACT
    * integer cents / cents² (DECIMAL(38,0) — a long S2 overflows at
    * ~2^63 cents², i.e. ~3e9 value-units of daily magnitude) and ONE
    * fixed double expression per candidate. Ties break to the
    * earliest day. The daily table is bounded (calendar-sized), so
    * the global window is over ≤ a few thousand rows — the documented
    * bounded-series exemption to the no-global-window rule
    * ([[autocorr]], [[holtLinear]] share it).
    *
    * Returns one row: `split_day` (first day of the RIGHT segment),
    * `n_left/n_right`, 6-dp `mean_left/mean_right/shift`, and
    * `sse_drop` = SSE_total − min split SSE (≥ 0, 6-dp).
    */
  /** Mann–Kendall trend test on the daily total series: S = Σ_{i<j}
    * sgn(x_j − x_i), its tie-corrected variance, and the
    * continuity-corrected z — the NONPARAMETRIC "is this drifting"
    * gate ([[theilSenDaily]] estimates the slope; this one tells you
    * whether to believe a trend exists at all, immune to whales and
    * to any monotone rescaling of the values).
    *
    * Exactness: daily totals are exact integer cents, so every sign
    * and every tie count is an integer decision; S, the tie term
    * Σt(t−1)(2t+5) and n(n−1)(2n+5) stay integral; only the final
    * var/18, z division and √ are IEEE doubles. The O(n²) pair scan
    * runs on the BOUNDED daily table (calendar-sized — the documented
    * exemption [[autocorr]]/[[changepoint]] share), never the corpus.
    */
  def mannKendall(
      df: DataFrame,
      tsCol: String,
      valueCol: String): DataFrame = {
    val daily = df.filter(col(valueCol).isNotNull)
      .groupBy(to_date(date_trunc("day", col(tsCol))).as("day"))
      .agg((sum(col(valueCol).cast("decimal(18,2)")) * 100)
        .cast("long").as("__c"))
    val a = daily.select(col("day").as("__da"), col("__c").as("__ca"))
    val b = daily.select(col("day").as("__db"), col("__c").as("__cb"))
    val s = a.join(b, col("__da") < col("__db"))
      .agg(coalesce(sum(when(col("__cb") > col("__ca"), 1L)
        .when(col("__cb") < col("__ca"), -1L).otherwise(0L)), lit(0L))
        .as("__s"))
    val ties = daily.groupBy("__c").agg(count(lit(1)).as("__t"))
      .agg(coalesce(sum(col("__t") * (col("__t") - 1) *
        (lit(2L) * col("__t") + 5)), lit(0L)).as("__tt"),
        sum(col("__t")).cast("long").as("__n"))
    val nL = col("__n")
    val varS = (nL * (nL - 1) * (lit(2L) * nL + 5) - col("__tt")).cast("double") /
      lit(18.0d)
    s.crossJoin(ties)
      .select(col("__n").cast("long").as("n_days"),
        col("__s").cast("long").as("s_stat"),
        round(varS, 6).as("var_s"),
        when(varS > 0 && col("__s") =!= 0,
          round((col("__s").cast("double") -
            when(col("__s") > 0, 1.0d).otherwise(-1.0d)) / sqrt(varS), 6))
          .otherwise(lit(0.0d)).as("z"),
        when(col("__s") > 0, lit("increasing"))
          .when(col("__s") < 0, lit("decreasing"))
          .otherwise(lit("none")).as("trend"))
  }

  /** Seasonality strength of the daily series against the weekly
    * cycle: 1 − SSR/SST, where SSR is the residual sum of squares
    * after removing per-weekday means and SST the total about the
    * grand mean — 0 means the weekday profile explains nothing,
    * near 1 means the series IS its weekly cycle (the R² of the
    * weekday-means model; the deseasonalize-or-not decision gate in
    * front of [[autocorr]]/q231).
    *
    * Exactness: totals are micro-unit longs; weekday means come from
    * half-up integer micro division (engine-identical), so residuals
    * are EXACT integer differences; both sums of squares ride
    * scale-0 DECIMAL(38,0) (single correct double rounding); the
    * ratio is one double division. Weekday = epoch-day arithmetic
    * (no engine DOW builtins — Spark counts Sunday 1, DuckDB 0).
    */
  def seasonalityStrength(
      df: DataFrame,
      tsCol: String,
      valueCol: String): DataFrame = {
    val daily = df.filter(col(valueCol).isNotNull)
      .groupBy(to_date(date_trunc("day", col(tsCol))).as("day"))
      .agg((sum(col(valueCol).cast("decimal(18,2)")) * 1000000)
        .cast("long").as("__m"))
      .withColumn("__dow",
        pmod(datediff(col("day"), to_date(lit("1970-01-01"))), lit(7)))
    val wk = daily.groupBy("__dow")
      .agg(count(lit(1)).as("__nw"), sum(col("__m")).cast("long").as("__sw"))
      .select(col("__dow"),
        expr("(2L * __sw + __nw) div (2L * __nw)").as("__mw"))
    val tot = daily.agg(count(lit(1)).as("__n"),
      sum(col("__m")).cast("long").as("__s"),
      sum((col("__m").cast("decimal(19,0)") * col("__m").cast("decimal(19,0)"))
        .cast("decimal(38,0)")).as("__ss"))
    val joined = daily.join(broadcast(wk), "__dow")
      .select(((col("__m") - col("__mw")).cast("decimal(19,0)") *
        (col("__m") - col("__mw")).cast("decimal(19,0)")).cast("decimal(38,0)")
        .as("__r2"))
      .agg(sum(col("__r2")).as("__ssr"))
    val sst = col("__ss").cast("double") -
      col("__s").cast("double") * col("__s").cast("double") /
        col("__n").cast("double")
    joined.crossJoin(tot)
      .select(col("__n").cast("long").as("n_days"),
        round(sst / lit(1.0e12), 6).as("sst"),
        round(col("__ssr").cast("double") / lit(1.0e12), 6).as("ssr"),
        when(sst > 0,
          round(lit(1.0d) - col("__ssr").cast("double") / sst, 6))
          .as("strength"))
  }

  def changepoint(
      df: DataFrame,
      tsCol: String,
      valCol: String): DataFrame = {
    val daily = df.filter(col(valCol).isNotNull)
      .groupBy(to_date(date_trunc("day", col(tsCol))).as("day"))
      .agg((sum(col(valCol).cast("decimal(18,2)")) * 100)
        .cast("decimal(38,0)").as("__c"))
    val wRun = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = daily
      .withColumn("__i", count(lit(1)).over(wRun))
      .withColumn("__s1", sum(col("__c")).over(wRun).cast("decimal(38,0)"))
      .withColumn("__s2", sum((col("__c") * col("__c")).cast("decimal(38,0)"))
        .over(wRun).cast("decimal(38,0)"))
      // first PRESENT day of the right segment (the series may have
      // calendar gaps; day+1 could name a day with no data)
      .withColumn("__nextday", lead(col("day"), 1).over(Window.orderBy("day")))
    val tot = pre.agg(max(col("__i")).as("__n"),
      max_by(col("__s1"), col("__i")).as("__t1"),
      max_by(col("__s2"), col("__i")).as("__t2"))
    // candidate split after row i (left = 1..i, right = i+1..n):
    // identical IEEE tree on both engines — each moment is an exact
    // integral decimal cast to double once
    val d = (c: Column) => c.cast("double")
    val scored = pre.crossJoin(broadcast(tot))
      .filter(col("__i") < col("__n"))
      .withColumn("__sse",
        (d(col("__s2")) - d(col("__s1")) * d(col("__s1")) / d(col("__i"))) +
        ((d(col("__t2")) - d(col("__s2"))) -
          (d(col("__t1")) - d(col("__s1"))) * (d(col("__t1")) - d(col("__s1"))) /
            (d(col("__n")) - d(col("__i")))))
    val best = scored
      .withColumn("__rk", row_number().over(
        Window.orderBy(col("__sse"), col("day"))))
      .filter(col("__rk") === 1)
    val totalSse = (t2: Column, t1: Column, n: Column) =>
      d(t2) - d(t1) * d(t1) / d(n)
    best
      .select(
        col("__nextday").as("split_day"),
        col("__i").cast("long").as("n_left"),
        (col("__n") - col("__i")).cast("long").as("n_right"),
        (expr("(2L * cast(__s1 as long) * 10000L + __i) div (2L * __i)")
          .cast("double") / lit(1000000.0d)).as("mean_left"),
        (expr("(2L * cast(__t1 - __s1 as long) * 10000L + (__n - __i)) " +
          "div (2L * (__n - __i))").cast("double") / lit(1000000.0d))
          .as("mean_right"),
        round((totalSse(col("__t2"), col("__t1"), col("__n")) - col("__sse")) /
          lit(10000.0d), 6).as("sse_drop"))
  }

  /** Pascal's triangle rows (n, k, C(n,k), 2ⁿ) for n ≤ `maxN` — the
    * broadcast side of [[signTrendBH]]'s EXACT binomial tail, shared
    * with the DuckDB oracle as a generated VALUES list (the
    * blocklist-keywords convention for cross-engine constants).
    * `maxN ≤ 40` keeps every BH comparison product inside a long
    * (2⁴⁰·20·m; see [[signTrendBH]]). */
  def binomialRows(maxN: Int): Seq[(Int, Int, Long, Long)] = {
    require(maxN >= 0 && maxN <= 40, s"maxN must be in [0, 40], got $maxN")
    (0 to maxN).flatMap { n =>
      var c = 1L
      (0 to n).map { k =>
        val row = (n, k, c, 1L << n)
        // binomial recurrence keeps every intermediate integral
        c = c * (n - k) / (k + 1)
        row
      }
    }
  }

  /** Per-group sign test for an upward day-over-day trend with
    * Benjamini–Hochberg FDR control across the groups — "which event
    * types are REALLY trending up, correcting for having asked the
    * question once per type". Classic nonparametric pair (sign test:
    * Arbuthnott 1710/Dixon & Mood 1946; BH: Benjamini & Hochberg
    * 1995), chosen here because BOTH are exact in integer arithmetic
    * — no Φ, no libm, engine-portable to the bit.
    *
    *   1. Daily totals per group (exact decimal cents), restricted to
    *      the last `lastDays` calendar days of the corpus.
    *   2. Per group: n = days whose total DIFFERS from the previous
    *      observed day's, x = days strictly ABOVE it (ties drop,
    *      standard sign-test practice; comparisons are vs the
    *      previous OBSERVED day, so gap days don't break pairs).
    *   3. One-sided exact p = P(X ≥ x | Bin(n, ½)) = Σ_{k≥x} C(n,k)
    *      / 2ⁿ — numerator summed as exact longs from the broadcast
    *      [[binomialRows]] table, and 2ⁿ division is by a power of
    *      two, so the double p-value is EXACT.
    *   4. BH step-up at `alphaNum/alphaDen` (default 1/20 = 0.05):
    *      reject ranks 1..i* where i* = max{i : p_(i) ≤ α·i/m} —
    *      decided entirely in integers: num·alphaDen·m ≤ 2ⁿ·alphaNum·i
    *      (each group carries its own 2ⁿ). Rank ties break on the
    *      group name — a total order, so ranks are engine-identical.
    *
    * Output per group: `n_days` (n), `ups` (x), `p_value`, `bh_rank`,
    * `rejected`.
    *
    * Scale shape: ONE (group, day) shuffle to the calendar-bounded
    * daily table; the lag window and the BH ranking run over
    * group-sized tables (the documented bounded-series exemption —
    * for corpus-sized m, swap the ranking onto
    * [[Rank.stratifiedRank]]'s device). The binomial table is
    * Σ(n+1) ≤ 861 broadcast rows. Long budget: the BH comparison is
    * ≤ 2^`lastDays`·alphaDen·m — `lastDays` ≤ 40 (enforced) keeps it
    * exact for m up to ~10⁴ groups.
    */
  def signTrendBH(
      df: DataFrame,
      groupCol: String,
      tsCol: String,
      valueCol: String,
      lastDays: Int = 28,
      alphaNum: Long = 1L,
      alphaDen: Long = 20L): DataFrame = {
    require(lastDays >= 2 && lastDays <= 40,
      s"lastDays must be in [2, 40], got $lastDays")
    require(alphaNum >= 1 && alphaDen > alphaNum,
      s"alpha must be a proper fraction, got $alphaNum/$alphaDen")
    val spark = df.sparkSession
    import spark.implicits._
    val daily = df.filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol).as("g"),
        to_date(date_trunc("day", col(tsCol))).as("day"))
      .agg((sum(col(valueCol).cast("decimal(18,2)")) * 100)
        .cast("long").as("__c"))
    // the corpus's last `lastDays` calendar days (bounded-table window)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val recent = daily
      .withColumn("__maxd", max(col("day")).over(w))
      .filter(datediff(col("__maxd"), col("day")) < lastDays)
    val lagW = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("day")
    val stats = recent
      .withColumn("__prev", lag(col("__c"), 1).over(lagW))
      .filter(col("__prev").isNotNull && col("__c") =!= col("__prev"))
      .groupBy("g")
      .agg(count(lit(1)).cast("int").as("n"),
        sum(when(col("__c") > col("__prev"), 1L).otherwise(0L))
          .cast("int").as("x"))
    val binom = spark.createDataset(binomialRows(lastDays - 1))
      .toDF("__bn", "__bk", "__bc", "__p2")
    // exact tail numerator: Σ_{k ≥ x} C(n, k); 2ⁿ rides along
    val tails = stats.join(broadcast(binom),
      col("n") === col("__bn") && col("__bk") >= col("x"))
      .groupBy("g", "n", "x")
      .agg(sum(col("__bc")).cast("long").as("__num"),
        max(col("__p2")).cast("long").as("__pow2"))
    val mW = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
      .orderBy((col("__num").cast("double") / col("__pow2").cast("double"))
        .asc, col("g").asc)
    val ranked = tails
      .withColumn("__m", count(lit(1)).over(mW))
      .withColumn("__i", row_number().over(rankW))
      // the BH inequality, in integers: num·αden·m ≤ 2ⁿ·αnum·i
      .withColumn("__ok",
        col("__num") * alphaDen * col("__m") <=
          col("__pow2") * alphaNum * col("__i"))
    ranked
      .withColumn("__istar",
        max(when(col("__ok"), col("__i")).otherwise(0L)).over(mW))
      .select(col("g").as(groupCol),
        col("n").cast("long").as("n_days"),
        col("x").cast("long").as("ups"),
        // division by a power of two — the double is exact
        (col("__num").cast("double") / col("__pow2").cast("double"))
          .as("p_value"),
        col("__i").cast("long").as("bh_rank"),
        (col("__i") <= col("__istar")).as("rejected"))
  }
}
