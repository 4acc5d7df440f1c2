package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Rounding.round

/** The reference read API's `/series` surface: time-bucketed per-source
  * aggregation over raw events with agg ∈ {avg, sum, count, p95}
  * (reference: `services/read-api/main.py:293-370`, SURVEY §2.4 A3).
  *
  * Reference "source" ≡ our `event_type`; "metric" ≡ `value`.
  *
  * Scale: one hash-aggregate over the scan — Spark plans partial
  * (map-side) + final aggregation automatically, so at 100 TB this is a
  * single shuffle on (event_type, bucket), with filters and the 3-column
  * projection pushed into the parquet scan. Cardinality of the group key
  * is bounded (|event_type| × minutes), so the final agg is tiny.
  */
object SeriesOps {

  def seriesAvg(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy(col("event_type"), date_trunc("minute", col("ts")).as("bucket"))
      .agg(round(avg(col("value")), 6).as("avg_value"))
      .orderBy(col("event_type"), col("bucket"))

  /** EWMA smoothing weight for [[seriesEwma]]. */
  private val Alpha = 0.2

  /** Exponentially-weighted moving average of the per-minute KPI series,
    * per event_type — the classic streaming smoother (the stateful analog
    * is one double of state per key in a `transformWithState` processor;
    * this is its batch form). The recurrence s ← α·x + (1−α)·s is a
    * sequential left fold over the bucket-ordered series: both engines
    * fold the SAME rounded per-minute averages in the SAME order with the
    * SAME association, so the smoothed level is engine-exact. Shape: the
    * per-minute aggregate shuffles once; the fold runs on the (tiny)
    * per-key bucket list.
    */
  def seriesEwma(spark: SparkSession, dir: String): DataFrame = {
    val buckets = Tables
      .events(spark, dir)
      .groupBy(col("event_type"), date_trunc("minute", col("ts")).as("bucket"))
      // bucket mean from exact micro-unit long sums (order-free), then
      // ONE double division + the shared round-6 — bit-identical across
      // engines AND to the streaming EwmaProcessor's sequential fold,
      // where a raw double `avg(value)` could differ by an ulp with
      // summation order and flip the 6-dp rounding
      .agg(count(lit(1)).as("n_ev"),
           sum(graft.functions.Rounding.microUnits(col("value"))).as("sm"))
      .withColumn("av", round(col("sm").cast("double") /
        (col("n_ev") * lit(1000000L)).cast("double"), 6))
    val vals = transform(
      sort_array(collect_list(struct(col("bucket"), col("av")))),
      _.getField("av"))
    buckets
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_buckets"), vals.as("vals"))
      .select(
        col("event_type"), col("n_buckets"),
        round(
          aggregate(
            slice(col("vals"), lit(2), size(col("vals")) - 1),
            element_at(col("vals"), 1),
            (s, x) => (lit(Alpha) * x) + (lit(1 - Alpha) * s)),
          6).as("ewma_value"))
      .orderBy(col("event_type"))
  }

  /** Holt smoothing constants — written as EXPLICIT literals on both
    * sides (0.3/0.7, 0.1/0.9) rather than `1 − α` arithmetic so the
    * engines cannot disagree by an ulp on the complement.
    */
  private val HoltAlpha = 0.3
  private val HoltAlphaC = 0.7
  private val HoltBeta = 0.1
  private val HoltBetaC = 0.9

  /** Holt double-exponential smoothing per event type — the forecasting
    * step above [[seriesEwma]]'s level-only smoother: the minute-bucket
    * series folds through the classic (level, trend) recursion
    * (`l' = α·x + (1−α)(l+b)`, `b' = β(l'−l) + (1−β)b`, initialized
    * l=v₂, b=v₂−v₁) and emits the fitted level, trend, and the 3-step
    * linear forecast `l + 3b` — the "where is this KPI heading" number
    * a capacity dashboard shows next to the EWMA.
    *
    * Parity discipline (same as the EWMA): the recursion is inherently
    * ordered, so both engines fold the SAME sorted value list with the
    * SAME IEEE expression tree — Spark's `aggregate` over a
    * struct-state, DuckDB's `list_reduce` over a struct list with the
    * init prepended (its accumulator must share the element type).
    * Types with fewer than two buckets yield NULL on both sides (the
    * guard also keeps ANSI `element_at` from erroring).
    *
    * Scale shape: one (type, minute) aggregation shuffle, then one
    * per-type fold whose buffer is the type's MINUTE series — calendar-
    * bounded like [[autocorrLags]]'s window, never event-bounded.
    */
  def seriesHolt(spark: SparkSession, dir: String): DataFrame = {
    val buckets = Tables
      .events(spark, dir)
      .groupBy(col("event_type"), date_trunc("minute", col("ts")).as("bucket"))
      .agg(round(avg(col("value")), 6).as("av"))
    val vals = transform(
      sort_array(collect_list(struct(col("bucket"), col("av")))),
      _.getField("av"))
    val folded = aggregate(
      slice(col("vals"), lit(3), greatest(size(col("vals")) - 2, lit(0))),
      struct(element_at(col("vals"), 2).as("l"),
             (element_at(col("vals"), 2) - element_at(col("vals"), 1)).as("b")),
      (s, x) => {
        val l = s.getField("l")
        val b = s.getField("b")
        val lNew = lit(HoltAlpha) * x + lit(HoltAlphaC) * (l + b)
        struct(lNew.as("l"),
               (lit(HoltBeta) * (lNew - l) + lit(HoltBetaC) * b).as("b"))
      })
    buckets
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_buckets"), vals.as("vals"))
      .select(col("event_type"), col("n_buckets"),
              when(size(col("vals")) >= 2, folded).as("st"))
      .select(
        col("event_type"), col("n_buckets"),
        round(col("st.l"), 6).as("level"),
        round(col("st.b"), 6).as("trend"),
        round(col("st.l") + lit(3.0) * col("st.b"), 6).as("forecast_3"))
      .orderBy(col("event_type"))
  }

  def seriesSum(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy(col("event_type"), date_trunc("minute", col("ts")).as("bucket"))
      .agg(round(sum(col("value")), 4).as("sum_value"))
      .orderBy(col("event_type"), col("bucket"))

  def seriesCount(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy(col("event_type"), date_trunc("minute", col("ts")).as("bucket"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("event_type"), col("bucket"))

  /** `PERCENTILE_CONT(0.95)` — interpolated, exactly Spark's built-in
    * `percentile` ≡ DuckDB `quantile_cont` (read-api/main.py:306-314).
    * Hour buckets keep groups large enough for a meaningful p95.
    */
  def seriesP95(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(round(percentile(col("value"), lit(0.95)), 6).as("p95_value"))
      .orderBy(col("event_type"), col("bucket"))

  /** Robust per-type statistics: exact nearest-rank p05/p95 cutoffs,
    * the winsorized mean (values clamped into [p05, p95]) and the
    * trimmed mean (values outside dropped) — the outlier-resistant
    * aggregates an anomaly-prone metric stream needs alongside plain
    * averages. Nearest-rank index is `⌊n·q⌋+1` (1-based), matching
    * [[graft.functions.ExactPercentile]]'s floor semantics.
    *
    * Exactness over scale, explicitly: exact order statistics need the
    * per-key multiset, so this buffers each type's values in one
    * aggregation (the documented [[graft.functions.ExactPercentile]]
    * caveat — groups here are the handful of event types). The 100 TB
    * form keeps the IDENTICAL clamp + micro-unit sum (a pure map +
    * partial aggregation) but takes its cutoffs from the mergeable KLL
    * sketch family already in the library (`kll_by_day`) instead of the
    * exact sort. All sums are exact integer micro-units folded over the
    * SORTED list, so both engines agree bit-for-bit.
    */
  def robustStats(spark: SparkSession, dir: String): DataFrame = {
    val micros = graft.functions.Rounding.microUnits _
    Tables
      .events(spark, dir)
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(col("value"))).as("lst"),
           count(lit(1)).as("n"))
      .withColumn("p05",
                  element_at(col("lst"),
                             (floor(col("n").cast("double") * lit(0.05)) +
                               lit(1)).cast("int")))
      .withColumn("p95",
                  element_at(col("lst"),
                             (floor(col("n").cast("double") * lit(0.95)) +
                               lit(1)).cast("int")))
      .withColumn("winsor_sum",
                  aggregate(col("lst"), lit(0L),
                            (acc, x) =>
                              acc + micros(least(greatest(x, col("p05")),
                                                 col("p95")))))
      .withColumn("trim",
                  filter(col("lst"),
                         x => x >= col("p05") && x <= col("p95")))
      .withColumn("n_trim", size(col("trim")).cast("long"))
      .withColumn("trim_sum",
                  aggregate(col("trim"), lit(0L), (acc, x) => acc + micros(x)))
      .select(
        col("event_type"), col("n"), col("p05"), col("p95"),
        round(col("winsor_sum").cast("double") / lit(1000000.0) /
                col("n").cast("double"), 6).as("winsor_mean"),
        col("n_trim"),
        round(col("trim_sum").cast("double") / lit(1000000.0) /
                col("n_trim").cast("double"), 6).as("trim_mean"))
      .orderBy(col("event_type"))
  }

  /** Per-type linear trend (OLS of value against time) — the "is this
    * metric drifting" question a monitoring surface answers next to the
    * EWMA level. All five regression sums are EXACT LONG integers (x =
    * whole seconds since the key's first event, ≤ a few 10⁶; y = value
    * millis), so partial aggregation is associative bit-for-bit and
    * order-free; the closed-form slope/intercept/r² then combine those
    * exact longs with IDENTICALLY-ORDERED double arithmetic on both
    * engines — deterministic because the inputs are exact and the ops
    * are the same IEEE sequence, the repo's standard float discipline.
    *
    * Scale shape: one groupBy for the per-key epoch (min ts), broadcast
    * back (key space = event types), then ONE partial-aggregated sum
    * pass — at 100 TB this is two scans and one tiny shuffle; no
    * window, no sort, no per-key buffering (contrast [[robustStats]]'s
    * exact order statistics).
    */
  def trendOls(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .events(spark, dir)
      .select(col("event_type"), unix_micros(col("ts")).as("us"),
              // milli-units (not micro) keep Σy² small; the BINDING
              // range constraint is Σx² — x spans the dataset's time
              // range in seconds (~2.6·10⁶ for 30 days), so the long
              // sums are exact up to ~10⁶ rows per key (every test SF;
              // sf0.1 is ~2·10⁴). Beyond that, lift the five sums to
              // DECIMAL(38,0) — same algebra, same oracle — exactly as
              // t_closeness documents for its cross products.
              floor(col("value") * lit(1000) + lit(0.5)).cast("long").as("y"))
    val t0 = ev.groupBy(col("event_type")).agg(min(col("us")).as("us0"))
    val sums = ev
      .join(broadcast(t0), "event_type")
      .select(col("event_type"), expr("(us - us0) div 1000000").as("x"),
              col("y"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
           sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
           sum(col("x") * col("x")).as("sxx"),
           sum(col("y") * col("y")).as("syy"))
    def d(c: Column): Column = c.cast("double")
    val cov = d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))
    val varX = d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val varY = d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy"))
    // degenerate keys (single event, or zero time/value variance) must
    // yield NULL, not IEEE NaN/Infinity: DuckDB's x/0 is NULL, and a
    // divide here would diverge from the oracle on such keys
    def safeDiv(num: Column, den: Column): Column =
      when(den === lit(0.0), lit(null)).otherwise(num / den)
    sums
      .select(
        col("event_type"), col("n"),
        round(safeDiv(cov, varX), 6).as("slope_millis_per_sec"),
        round(safeDiv(d(col("sy")) - safeDiv(cov, varX) * d(col("sx")),
                      d(col("n"))), 6).as("intercept_millis"),
        round(safeDiv(cov * cov, varX * varY), 6).as("r2"))
      .orderBy(col("event_type"))
  }

  /** Data-drift monitor: total-variation distance between each type's
    * value distribution in the first half of the month and the second —
    * the input-drift check an ML-adjacent pipeline runs on every
    * feature. Values band into width-10 buckets (capped at band 50);
    * TV = ½·Σ|p_i − q_i| is computed as the exact integer numerator
    * Σ|c_i·N_b − d_i·N_a| over 2·N_a·N_b, and the `drifted` verdict
    * (TV > 0.1) is the cross-multiplied `5·Σ > N_a·N_b` — like
    * t_closeness, no float ever decides it. Absent bands contribute
    * nothing on either side, so no dense grid is needed.
    *
    * Scale shape: ONE shuffle (the (type, band) groupBy with both
    * halves' counts as conditional sums — never two scans); the totals
    * join and final fold run on the band frame (metadata scale).
    */
  def driftTv(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit("2024-01-16 00:00:00").cast("timestamp")
    val counts = Tables
      .events(spark, dir)
      .select(col("event_type"), (col("ts") < cut).as("fh"),
              least(floor(col("value") / lit(10)).cast("long"), lit(50L))
                .as("band"))
      .groupBy(col("event_type"), col("band"))
      .agg(sum(when(col("fh"), 1L).otherwise(0L)).as("c"),
           sum(when(!col("fh"), 1L).otherwise(0L)).as("d"))
    val totals = counts
      .groupBy(col("event_type"))
      .agg(sum(col("c")).as("na"), sum(col("d")).as("nb"))
    counts
      .join(totals, "event_type")
      .groupBy(col("event_type"))
      .agg(max(col("na")).as("n_first"), max(col("nb")).as("n_second"),
           sum(abs(col("c") * col("nb") - col("d") * col("na")))
             .as("tv_num"))
      .select(
        col("event_type"), col("n_first"), col("n_second"), col("tv_num"),
        // one empty half → 0/0; DuckDB yields NULL there, so mirror it
        round(when(col("n_first") === 0 || col("n_second") === 0, lit(null))
                .otherwise(col("tv_num").cast("double") /
                  (lit(2.0) * col("n_first").cast("double") *
                    col("n_second").cast("double"))), 6).as("tv_distance"),
        (col("tv_num") * 5 > col("n_first") * col("n_second")).as("drifted"))
      .orderBy(col("event_type"))
  }

  /** Per-type autocorrelation of the hourly KPI series at lags 1–3 —
    * the seasonality probe a monitoring surface runs next to
    * [[trendOls]]'s drift check (a strong lag-24 analog would mean
    * "daily rhythm", lag-1 "momentum"). Follows the repo's float
    * discipline end-to-end: the hourly series is exact integer cents;
    * every sum the ACF needs (series n/Σx/Σx², and per-lag pair count,
    * Σx_t·x_{t−k}, and the two one-sided pair sums) is an exact long,
    * so partial aggregation is order-free; r_k then combines those
    * longs with the IDENTICAL double expression the oracle evaluates
    * (mean-centered numerator over pairs ÷ full-series moment), with
    * degenerate denominators nulled like DuckDB's x/0. Lags step over
    * OBSERVED hourly buckets (both engines lag the same grid), and the
    * per-type hour series is unique on its sort key, so the window is
    * deterministic.
    *
    * Scale shape: one (type, hour) aggregation shuffle, then the lag
    * window and final per-type aggregation share the event_type
    * partitioning. The window partition is the per-type HOURLY series —
    * bounded by the calendar (~10⁵ rows per decade), never by event
    * volume, the same manifest-not-corpus window argument as
    * `compaction_plan`.
    */
  def autocorrLags(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables
      .events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(sum(floor(col("value") * lit(100) + lit(0.5)).cast("long")).as("x"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("hr"))
    val lagged = hourly.select(
      col("event_type"), col("x"),
      lag(col("x"), 1).over(w).as("x1"),
      lag(col("x"), 2).over(w).as("x2"),
      lag(col("x"), 3).over(w).as("x3"))
    val sums = lagged
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"), sum(col("x")).as("s"),
        sum(col("x") * col("x")).as("ss"),
        count(col("x1")).as("m1"), sum(col("x") * col("x1")).as("c1"),
        sum(when(col("x1").isNotNull, col("x"))).as("sa1"),
        sum(col("x1")).as("sb1"),
        count(col("x2")).as("m2"), sum(col("x") * col("x2")).as("c2"),
        sum(when(col("x2").isNotNull, col("x"))).as("sa2"),
        sum(col("x2")).as("sb2"),
        count(col("x3")).as("m3"), sum(col("x") * col("x3")).as("c3"),
        sum(when(col("x3").isNotNull, col("x"))).as("sa3"),
        sum(col("x3")).as("sb3"))
    def d(c: Column): Column = c.cast("double")
    val mean = d(col("s")) / d(col("n"))
    val den = d(col("ss")) - d(col("n")) * mean * mean
    def rOf(k: Int): Column = {
      val num = d(col(s"c$k")) - mean * d(col(s"sa$k")) -
        mean * d(col(s"sb$k")) + d(col(s"m$k")) * mean * mean
      round(when(den === lit(0.0), lit(null)).otherwise(num / den), 6)
    }
    sums
      .select(col("event_type"),
              explode(array((1 to 3).map(k =>
                struct(lit(k.toLong).as("lag_k"),
                       col(s"m$k").as("n_pairs"),
                       rOf(k).as("autocorr"))): _*)).as("p"))
      .select(col("event_type"), col("p.lag_k").as("lag_k"),
              col("p.n_pairs").as("n_pairs"), col("p.autocorr").as("autocorr"))
      .orderBy(col("event_type"), col("lag_k"))
  }

  /** Time-WEIGHTED average per event type — TimescaleDB's `time_weight`
    * hyperfunction (the reference's cold store is TimescaleDB, and a
    * plain `avg` over irregular samples is wrong whenever arrival rate
    * correlates with value): each sample holds its value until the next
    * one (LOCF), so the mean is `Σ valueᵢ·(tᵢ₊₁ − tᵢ) / (t_max − t_min)`
    * with the last sample contributing zero width. The weighted sum is
    * EXACT integers (cents × µs gaps — bounded ~10¹⁷ here; DECIMAL(38,0)
    * at the 100 TB scale, the t_closeness convention), so only the final
    * division is a double.
    *
    * Scale shape: one `lead` window partitioned by event_type ordered
    * by (ts, event_id) — the same keyed-window precedent as
    * [[graft.operators.TemporalOps.asofJoin]] — then one aggregation.
    */
  def seriesTwa(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
    Tables
      .events(spark, dir)
      .select(col("event_type"), col("ts"), col("event_id"),
              unix_micros(col("ts")).as("us"),
              floor(col("value") * lit(100) + lit(0.5)).cast("long")
                .as("cents"))
      .withColumn("next_us", lead(col("us"), 1).over(w))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(when(col("next_us").isNotNull,
                    col("cents") * (col("next_us") - col("us")))
                 .otherwise(0L)).as("wsum"),
           min(col("us")).as("us0"), max(col("us")).as("us1"))
      .select(
        col("event_type"), col("n_events"),
        expr("(us1 - us0) div 1000000").as("duration_secs"),
        round(when(col("us1") === col("us0"), lit(null))
                .otherwise(col("wsum").cast("double") /
                  (col("us1") - col("us0")).cast("double") / lit(100.0)),
              6).as("twa_value"))
      .orderBy(col("event_type"))
  }

  /** Heartbeat/uptime aggregation — TimescaleDB's `heartbeat_agg`: a
    * source is "up" while consecutive events arrive within
    * [[UptimeGapSecs]]; longer silences are OUTAGES. Per type: gap
    * count, total downtime, longest outage, and the SLA uptime
    * percentage — the verdict decided on exact integer µs (down·10³
    * vs span for the 99.9% three-nines gate, cross-multiplied). Same
    * single keyed lag window + aggregation shape as [[seriesTwa]].
    */
  def uptimeReport(spark: SparkSession, dir: String): DataFrame = {
    val gapUs = UptimeGapSecs * 1000000L
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
    Tables
      .events(spark, dir)
      .select(col("event_type"), col("ts"), col("event_id"),
              unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("gap_us",
                  when(col("prev_us").isNotNull &&
                         col("us") - col("prev_us") > gapUs,
                       col("us") - col("prev_us")).otherwise(0L))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(when(col("gap_us") > 0, 1L).otherwise(0L)).as("n_outages"),
           sum(col("gap_us")).as("down_us"),
           max(col("gap_us")).as("longest_us"),
           min(col("us")).as("us0"), max(col("us")).as("us1"))
      .select(
        col("event_type"), col("n_events"), col("n_outages"),
        expr("down_us div 1000000").as("downtime_secs"),
        expr("longest_us div 1000000").as("longest_outage_secs"),
        round(when(col("us1") === col("us0"), lit(null))
                .otherwise(lit(100.0) *
                  (col("us1") - col("us0") - col("down_us")).cast("double") /
                  (col("us1") - col("us0")).cast("double")), 6)
          .as("uptime_pct"),
        // three-nines gate in exact integers: uptime ≥ 99.9% ⇔
        // downtime ≤ span/1000 ⇔ down·1000 ≤ span
        ((col("down_us") * lit(1000L)) <=
          (col("us1") - col("us0"))).as("three_nines"))
      .orderBy(col("event_type"))
  }

  /** Up-threshold for [[uptimeReport]]: a silence longer than this many
    * seconds is an outage.
    */
  private val UptimeGapSecs = 120L

  /** Watermark-design audit: how out-of-order does each type's stream
    * actually arrive? Replaying events in ARRIVAL order (`event_id` is
    * the producer sequence), an event is LATE when its event time is
    * behind the running maximum already seen — exactly the rows a
    * watermark of a given delay would drop. Emits the late rate and
    * the disorder distribution's extremes (max and the exact count
    * beyond the pipeline's 10 s watermark), i.e. the evidence behind
    * the `withWatermark("ts", "10 seconds")` choice in
    * [[graft.streaming.EventPipeline]] — the number a stream operator
    * checks BEFORE picking a delay, not after losing data.
    *
    * One keyed window ordered by arrival (the running max is a prefix
    * aggregate, not a sort-by-time), one aggregation; disorder is
    * exact integer µs.
    */
  def watermarkAudit(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Tables
      .events(spark, dir)
      .select(col("event_type"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("max_seen", max(col("us")).over(w))
      .withColumn("disorder_us",
                  when(col("max_seen").isNotNull && col("us") < col("max_seen"),
                       col("max_seen") - col("us")).otherwise(0L))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(when(col("disorder_us") > 0, 1L).otherwise(0L)).as("n_late"),
           max(col("disorder_us")).as("max_disorder_us"),
           sum(when(col("disorder_us") > 10000000L, 1L).otherwise(0L))
             .as("n_beyond_10s"))
      .select(col("event_type"), col("n_events"), col("n_late"),
              round(lit(100.0) * col("n_late").cast("double") /
                      col("n_events").cast("double"), 6).as("late_pct"),
              expr("max_disorder_us div 1000000").as("max_disorder_secs"),
              col("n_beyond_10s"))
      .orderBy(col("event_type"))
  }

  /** OHLC candlestick per (type, hour) — TimescaleDB's
    * `candlestick_agg`: open/close are the FIRST/LAST values by event
    * time (µs + event_id tie-break, picked with `min/max(struct(...))`
    * aggregate argmins — partial-combinable, no window at all), high/low
    * plain extremes. One shuffle on the bucket key; every output is
    * exact (values are the raw doubles the fixture stores).
    */
  def seriesOhlc(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("bucket"),
              unix_micros(col("ts")).as("us"), col("event_id"), col("value"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n_events"),
           min(struct(col("us"), col("event_id"), col("value")))
             .getField("value").as("open"),
           max(col("value")).as("high"),
           min(col("value")).as("low"),
           max(struct(col("us"), col("event_id"), col("value")))
             .getField("value").as("close"))
      .orderBy(col("event_type"), col("bucket"))

  /** Reset-aware counter delta per type — TimescaleDB's `counter_agg`:
    * treating each type's value stream as a monotonic counter that can
    * RESET (drop to a lower reading), the true increase is
    * `Σ max(0, vᵢ − vᵢ₋₁)` in exact cents plus a reset count — the
    * rate-of-change primitive for counters where `last − first` is
    * wrong across any reset. Same single keyed lag window +
    * aggregation shape as [[uptimeReport]].
    */
  def counterDelta(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
    Tables
      .events(spark, dir)
      .select(col("event_type"), col("ts"), col("event_id"),
              floor(col("value") * lit(100) + lit(0.5)).cast("long")
                .as("cents"))
      .withColumn("prev", lag(col("cents"), 1).over(w))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_samples"),
           sum(when(col("prev").isNotNull && col("cents") > col("prev"),
                    col("cents") - col("prev")).otherwise(0L))
             .as("delta_cents"),
           sum(when(col("prev").isNotNull && col("cents") < col("prev"), 1L)
                 .otherwise(0L)).as("n_resets"),
           min(col("cents")).as("min_cents"),
           max(col("cents")).as("max_cents"))
      .orderBy(col("event_type"))
  }

  /** `/series` with the optional conjunctive predicates of the read API
    * (time range + source filter, read-api/main.py:316-334): the filter is
    * pushed to the parquet scan (partition/row-group pruning at scale).
    */
  def seriesFiltered(spark: SparkSession, dir: String): DataFrame =
    Tables
      .eventsTimeRange(spark, dir, "2024-01-05 00:00:00", "2024-01-10 00:00:00")
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(col("event_type"), date_trunc("minute", col("ts")).as("bucket"))
      .agg(round(avg(col("value")), 6).as("avg_value"),
           count(lit(1)).as("n_events"))
      .orderBy(col("event_type"), col("bucket"))

  /** Gap-filled per-minute series (TimescaleDB's `time_bucket_gapfill`,
    * the flagship feature of the reference's cold store): the dense
    * (event_type × minute) grid is generated from the data's own bounds
    * with `sequence` + explode, left-joined to the sparse counts, and
    * missing buckets filled with 0 and flagged. The grid side is tiny
    * (types × minutes) and broadcast; the counts side aggregates before
    * the join, so the big table is touched once.
    */
  def seriesGapfill(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val counts = ev
      .groupBy(col("event_type"), date_trunc("minute", col("ts")).as("bucket"))
      .agg(count(lit(1)).as("n_events"))
    val bounds = ev.agg(
      date_trunc("minute", min(col("ts"))).as("lo"),
      date_trunc("minute", max(col("ts"))).as("hi"))
    val minutes = bounds.select(
      explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 MINUTE")))
        .as("bucket"))
    val grid = ev.select(col("event_type")).distinct().crossJoin(minutes)
    grid
      .join(counts, Seq("event_type", "bucket"), "left")
      .select(col("event_type"), col("bucket"),
              coalesce(col("n_events"), lit(0L)).as("n_events"),
              col("n_events").isNull.as("is_gap"))
      .orderBy(col("event_type"), col("bucket"))
  }

  /** Standalone rolling median / MAD over an arbitrary row frame — the
    * reusable form of the aggregate the anomaly detector consumes
    * ([[graft.functions.RollingStatsAgg]]), applied here to a DIFFERENT
    * key and frame (per user, last 25 values) to demonstrate it is not
    * tied to the detector shape: one `.over(anyWindowSpec)` gives the
    * full (n, mean, stddev, median, mad) bundle in a single frame pass.
    *
    * Scale: identical posture to anomalyScore — one shuffle on the
    * partition key, O(frame) memory per row.
    */
  def madOverFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-24, 0)
    Tables
      .events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("st", graft.functions.RollingStatsAgg(col("value")).over(w))
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
              col("st.n").as("n_samples"),
              round(col("st.median"), 4).as("median_value"),
              round(col("st.mad"), 4).as("mad_value"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** CUSUM slack, in baseline-σ units (the classic k = σ/2 tuning for
    * detecting a 1σ mean shift), and the decision interval h = 4σ.
    */
  private[graft] val CusumK = 0.5
  private[graft] val CusumH = 4.0

  /** Exact per-type CUSUM baselines (μ, σ in centi-units, as the SAME
    * doubles the batch fold uses) — the offline "learn" half a
    * streaming CUSUM consumes: collect is per-TYPE (metadata-sized),
    * the aggregation underneath is the same exact centi-unit long sums
    * as [[cusumChangepoints]].
    */
  def cusumBaselines(spark: SparkSession,
                     dir: String): Map[String, (Double, Double)] =
    Tables
      .events(spark, dir)
      .groupBy(col("event_type"), date_trunc("minute", col("ts")).as("bucket"))
      .agg(count(lit(1)).as("n_ev"),
           sum(graft.functions.Rounding.microUnits(col("value"))).as("sm"))
      .withColumn("xc", expr("(2 * sm + n_ev * 10000L) DIV (2 * n_ev * 10000L)"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("xc")).as("s1"),
           sum(col("xc") * col("xc")).as("s2"))
      .collect()
      .map { r =>
        val n = r.getAs[Long]("n").toDouble
        val mu = r.getAs[Long]("s1").toDouble / n
        val sigma =
          math.sqrt(math.max(r.getAs[Long]("s2").toDouble / n - mu * mu, 0.0))
        r.getAs[String]("event_type") -> (mu, sigma)
      }
      .toMap

  /** Two-sided CUSUM mean-shift detection (Page 1954) over the
    * per-minute KPI series — the change-POINT complement to
    * [[trendOls]]'s gradual-drift probe and [[AnomalyOps]]'s pointwise
    * z-scores: a CUSUM accumulates small sustained deviations that no
    * single-point detector fires on. Per type the recursion
    * `s⁺ ← max(0, s⁺ + (x − μ − k))` (and the mirrored s⁻) folds over
    * the bucket-ordered series; crossing h resets the side and counts a
    * shift.
    *
    * Float discipline: the baseline μ/σ come from exact centi-unit long
    * sums (count/Σ/Σ² — order-free partial aggregation), combined into
    * doubles with the IDENTICAL expression the oracle evaluates, so
    * k = 0.5σ and h = 4σ are bit-equal across engines; the fold then
    * runs the same IEEE ops in the same order on both sides, making the
    * threshold comparisons — the discrete part — engine-exact. The Σx²
    * long is the documented centi-unit compromise: at 100 TB the same
    * sums ride decimal(38,0) (Spark sums decimals exactly), everything
    * downstream unchanged.
    *
    * Scale: one (type, minute) aggregation shuffle; the fold runs on
    * the per-type bucket list — calendar-bounded (~5×10⁵ minutes per
    * year), never event-volume-bounded, the same manifest-scale list
    * argument as [[seriesHolt]].
    */
  def cusumChangepoints(spark: SparkSession, dir: String): DataFrame = {
    val buckets = Tables
      .events(spark, dir)
      .groupBy(col("event_type"), date_trunc("minute", col("ts")).as("bucket"))
      // round-half-up bucket mean in exact integer centi-units:
      // ⌊Σmicro/(n·10⁴) + ½⌋ = (2·Σmicro + n·10⁴) div (2·n·10⁴). Micro-
      // unit long sums are order-free, so the streaming fold (which
      // sums the SAME longs sequentially) is bit-identical by
      // construction, not merely empirically — values are nonnegative,
      // so Spark's truncating DIV equals DuckDB's flooring `//`.
      .agg(count(lit(1)).as("n_ev"),
           sum(graft.functions.Rounding.microUnits(col("value"))).as("sm"))
      .withColumn("xc", expr("(2 * sm + n_ev * 10000L) DIV (2 * n_ev * 10000L)"))
    val perType = buckets
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_buckets"),
           sum(col("xc")).as("s1"),
           sum(col("xc") * col("xc")).as("s2"),
           transform(sort_array(collect_list(struct(col("bucket"), col("xc")))),
                     _.getField("xc").cast("double")).as("vals"))
      .withColumn("mu", col("s1").cast("double") / col("n_buckets"))
      .withColumn("sigma",
                  sqrt(greatest(col("s2").cast("double") / col("n_buckets") -
                                  col("mu") * col("mu"),
                                lit(0.0))))
      .withColumn("k", lit(CusumK) * col("sigma"))
      .withColumn("h", lit(CusumH) * col("sigma"))
    // state: (s_hi, s_lo, n_hi, n_lo); a side that crosses h counts a
    // shift and resets to 0 (standard restart-after-alarm CUSUM)
    val folded = aggregate(
      col("vals"),
      struct(lit(0.0).as("sh"), lit(0.0).as("sl"),
             lit(0.0).as("nh"), lit(0.0).as("nl")),
      (s, x) => {
        val shRaw = greatest(s.getField("sh") + (x - col("mu") - col("k")),
                             lit(0.0))
        val slRaw = greatest(s.getField("sl") + (col("mu") - x - col("k")),
                             lit(0.0))
        val hiAlarm = shRaw > col("h")
        val loAlarm = slRaw > col("h")
        struct(when(hiAlarm, lit(0.0)).otherwise(shRaw).as("sh"),
               when(loAlarm, lit(0.0)).otherwise(slRaw).as("sl"),
               (s.getField("nh") + when(hiAlarm, lit(1.0)).otherwise(lit(0.0)))
                 .as("nh"),
               (s.getField("nl") + when(loAlarm, lit(1.0)).otherwise(lit(0.0)))
                 .as("nl"))
      })
    perType
      .withColumn("st", folded)
      .select(col("event_type"), col("n_buckets"),
              col("st.nh").cast("long").as("n_shifts_up"),
              col("st.nl").cast("long").as("n_shifts_down"),
              round(col("mu") / 100.0, 4).as("baseline_mean"),
              round(col("sigma") / 100.0, 4).as("baseline_sigma"))
      .orderBy(col("event_type"))
  }

  /** Diurnal-profile anomaly scan: each (type, hour-of-day) slot learns
    * a baseline from its ~30 calendar-hour observations, then every
    * concrete hour is z-scored against its own slot — "is 3 AM Tuesday
    * strange FOR 3 AM?" — the seasonal-baseline detector that catches
    * what a global z-score normalizes away (and vice versa: a daily
    * rhythm is NORMAL here, anomalous to [[autocorrLags]]-blind global
    * stats).
    *
    * Exactness: the hourly mean is the floor-division of exact
    * micro-unit long sums (`S // (n·10⁴)` → centi-units, identical
    * integer ops both engines); slot μ/σ combine those longs with the
    * shared double expression; degenerate slots (σ = 0 or < 3
    * observations) null their z like [[trendOls]]'s guard. The final
    * per-type rollup counts |z| > 3 hours and the worst |z|.
    *
    * Scale: two aggregation shuffles (events → hourly, hourly → slot)
    * plus a join of the hourly frame against the 24·|type| slot profile
    * — broadcast-sized by construction. The hourly frame is
    * calendar-bounded, so even the join's big side is manifest-scale.
    */
  def seasonalAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables
      .events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n_ev"),
           sum(graft.functions.Rounding.microUnits(col("value"))).as("sm"))
      // integral DIV, not `/`: Spark's `/` on longs is DOUBLE division,
      // whose quotient can round across an integer boundary before the
      // cast truncates — DIV is the exact long floor the oracle's `//` does
      .withColumn("hm_c", expr("sm DIV (n_ev * 10000L)"))
      .withColumn("hod", hour(col("hr")).cast("long"))
    val slots = hourly
      .groupBy(col("event_type"), col("hod"))
      .agg(count(lit(1)).as("n_obs"),
           sum(col("hm_c")).as("t1"),
           sum(col("hm_c") * col("hm_c")).as("t2"))
      .withColumn("mu_s", col("t1").cast("double") / col("n_obs"))
      .withColumn("sigma_s",
                  sqrt(greatest(col("t2").cast("double") / col("n_obs") -
                                  col("mu_s") * col("mu_s"),
                                lit(0.0))))
      .select(col("event_type"), col("hod"), col("n_obs"), col("mu_s"),
              col("sigma_s"))
    hourly
      .join(broadcast(slots), Seq("event_type", "hod"))
      .withColumn("z",
                  when(col("n_obs") < 3 || col("sigma_s") === 0.0, lit(null))
                    .otherwise((col("hm_c").cast("double") - col("mu_s")) /
                      col("sigma_s")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"),
           count(when(abs(col("z")) > 3.0, lit(1))).as("n_anomalous_hours"),
           round(max(abs(col("z"))), 4).as("max_abs_z"))
      .orderBy(col("event_type"))
  }

  /** Kolmogorov–Smirnov two-sample drift over the VALUE distribution —
    * the continuous complement to [[driftTv]]'s banded categorical
    * distance: same first-half/second-half split, but the statistic is
    * the max ECDF gap over exact integer cents, so a pure location or
    * shape shift that TV's coarse bands wash out still registers. The
    * gap is kept as the exact integer `max |cc₁·n₂ − cc₂·n₁|`
    * (cumulative counts cross-multiplied — never a float ECDF), and
    * D = num/(n₁·n₂) plus the α=0.05 rejection bound
    * `D > c·√((n₁+n₂)/(n₁·n₂))` (c = 1.358) evaluate the same
    * longs→double expression on both engines. Degenerate halves null
    * out like [[driftTv]].
    *
    * Scale: one (type, cent-value) aggregation shuffle; the cumulative
    * window runs per type over the DISTINCT-cents manifest — bounded by
    * the value domain (10⁴ rows per 100 units of range), not event
    * volume — the same manifest argument as `skyline_pareto`. The
    * cross-multiplied longs hold to ~10⁹ events per type per half; the
    * 100 TB form lifts the two cumulative counts to decimal(38,0).
    */
  def driftKs(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit("2024-01-16 00:00:00").cast("timestamp")
    val counts = Tables
      .events(spark, dir)
      .select(col("event_type"), (col("ts") < cut).as("fh"),
              floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .groupBy(col("event_type"), col("cents"))
      .agg(sum(when(col("fh"), 1L).otherwise(0L)).as("c"),
           sum(when(!col("fh"), 1L).otherwise(0L)).as("d"))
    val totals = counts
      .groupBy(col("event_type"))
      .agg(sum(col("c")).as("na"), sum(col("d")).as("nb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(col("cents"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
                   0)
    val d = (c: Column) => c.cast("double")
    counts
      .join(totals, "event_type")
      .withColumn("cc", sum(col("c")).over(w))
      .withColumn("cd", sum(col("d")).over(w))
      .withColumn("gap", abs(col("cc") * col("nb") - col("cd") * col("na")))
      .groupBy(col("event_type"))
      .agg(max(col("na")).as("n_first"), max(col("nb")).as("n_second"),
           max(col("gap")).as("ks_num"))
      .select(
        col("event_type"), col("n_first"), col("n_second"), col("ks_num"),
        round(when(col("n_first") === 0 || col("n_second") === 0, lit(null))
                .otherwise(d(col("ks_num")) /
                  (d(col("n_first")) * d(col("n_second")))), 6).as("ks_stat"),
        when(col("n_first") === 0 || col("n_second") === 0, lit(null))
          .otherwise(
            d(col("ks_num")) / (d(col("n_first")) * d(col("n_second"))) >
              lit(1.358) * sqrt((d(col("n_first")) + d(col("n_second"))) /
                (d(col("n_first")) * d(col("n_second"))))).as("drifted"))
      .orderBy(col("event_type"))
  }

  /** Mutual information between event type and hour-of-day — "how much
    * does WHEN tell you about WHAT": the dependency-profiling summary
    * over the type×hour contingency table (the per-type marginal view
    * of the same table is [[hourlyEntropy]]). Every count is an exact
    * long; each term is `(c_th/N)·ln(c_th·N/(c_t·c_h))` with both
    * ratios two-long divisions (ln arguments audited in
    * `tools/ln_audit.py`), and the sum folds over the
    * (type, hour)-ORDERED cell list to pin float addition order.
    * Bits via the shared [[Ln2]] literal.
    *
    * Scale: one (type, hour) count shuffle; margins and the fold run on
    * the ≤ 24·|type| contingency table — metadata-scale.
    */
  def mutualInfo(spark: SparkSession, dir: String): DataFrame = {
    val cont = Tables
      .events(spark, dir)
      .groupBy(col("event_type"), hour(col("ts")).cast("long").as("hod"))
      .agg(count(lit(1)).as("cth"))
    val ct = cont.groupBy(col("event_type")).agg(sum(col("cth")).as("ct"))
    val ch = cont.groupBy(col("hod")).agg(sum(col("cth")).as("chd"))
    cont
      .join(broadcast(ct), "event_type")
      .join(broadcast(ch), "hod")
      .groupBy()
      .agg(sum(col("cth")).as("n_events"),
           count(lit(1)).as("n_cells"),
           sort_array(collect_list(struct(col("event_type"), col("hod"),
                                          col("cth"), col("ct"),
                                          col("chd")))).as("cells"))
      .withColumn(
        "mi",
        aggregate(
          col("cells"),
          lit(0.0),
          (s, e) => {
            val p = e.getField("cth").cast("double") /
              col("n_events").cast("double")
            val ratio = (e.getField("cth") * col("n_events")).cast("double") /
              (e.getField("ct") * e.getField("chd")).cast("double")
            s + p * log(ratio)
          }))
      .select(col("n_events"), col("n_cells"),
              round(col("mi") / lit(Ln2), 6).as("mi_bits"))
  }

  /** Holt–Winters seasonal weight (γ) and the daily period over hourly
    * buckets. α/β are shared with [[seriesHolt]].
    */
  private val HwGamma = 0.2
  private val HwGammaC = 0.8
  private val HwPeriod = 24

  /** Additive Holt–Winters (triple exponential smoothing) over the
    * hourly KPI series with a 24-hour season — the seasonal completion
    * of the forecasting family ([[seriesEwma]] level, [[seriesHolt]]
    * level+trend, this adds the diurnal component [[seasonalAnomaly]]
    * detects statically). Init is the simple fold-expressible form:
    * the first season accumulates (l₀ = its mean, b₀ = 0, sᵢ = xᵢ−l₀,
    * normalized at the t=24 boundary INSIDE the fold), then the
    * standard recursion l/b/s with the seasonal ring stored at slot
    * `t mod 24`. Forecast h=1 is `l + b + s[(n+1) mod 24]`; amplitude
    * is the ring's max−min spread. The whole state — (l, b, 24-slot
    * ring, t) — folds over the bucket-ordered series with the same
    * IEEE expression tree on both engines (the oracle's accumulator is
    * a flat 27-double list, recomputing shared subexpressions inline —
    * bit-identical, as recomputation is). Types with fewer than 25
    * buckets null their outputs.
    *
    * Scale: same posture as [[seriesHolt]] — one (type, hour)
    * aggregation shuffle; the fold runs on the calendar-bounded
    * per-type bucket list.
    */
  def seriesHw(spark: SparkSession, dir: String): DataFrame = {
    val buckets = Tables
      .events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(round(avg(col("value")), 6).as("av"))
    val vals = transform(
      sort_array(collect_list(struct(col("bucket"), col("av")))),
      _.getField("av"))
    val m = HwPeriod
    val folded = aggregate(
      col("vals"),
      struct(lit(0.0).as("l"), lit(0.0).as("b"),
             array_repeat(lit(0.0), m).as("ring"), lit(0L).as("t")),
      (s, x) => {
        val t = s.getField("t")
        val idx = (t % m).cast("int")
        // t = 24 boundary: finalize the warm-up season (before consuming x)
        val l0 = s.getField("l") / lit(m.toDouble)
        val lP = when(t === m, l0).otherwise(s.getField("l"))
        val ringP = when(t === m,
                         transform(s.getField("ring"), r => r - l0))
          .otherwise(s.getField("ring"))
        val bP = s.getField("b")
        // warm-up steps (t < 24): accumulate the season, park raw x
        val warmRing = transform(ringP, (r, i) =>
          when(i === idx, x).otherwise(r))
        // recursion steps (t >= 24)
        val sPrev = element_at(ringP, idx + 1)
        val lNew = lit(HoltAlpha) * (x - sPrev) + lit(HoltAlphaC) * (lP + bP)
        val bNew = lit(HoltBeta) * (lNew - lP) + lit(HoltBetaC) * bP
        val sNew = lit(HwGamma) * (x - lNew) + lit(HwGammaC) * sPrev
        val recRing = transform(ringP, (r, i) =>
          when(i === idx, sNew).otherwise(r))
        struct(
          when(t < m, lP + x).otherwise(lNew).as("l"),
          when(t < m, bP).otherwise(bNew).as("b"),
          when(t < m, warmRing).otherwise(recRing).as("ring"),
          (t + 1L).as("t"))
      })
    buckets
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_buckets"), vals.as("vals"))
      .withColumn("st", folded)
      .select(
        col("event_type"), col("n_buckets"),
        round(when(col("n_buckets") >= m + 1, col("st.l")), 6).as("level"),
        round(when(col("n_buckets") >= m + 1, col("st.b")), 6).as("trend"),
        round(when(col("n_buckets") >= m + 1,
                   col("st.l") + col("st.b") +
                     element_at(col("st.ring"),
                                (col("n_buckets") % m).cast("int") + 1)),
              6).as("forecast_1"),
        round(when(col("n_buckets") >= m + 1,
                   array_max(col("st.ring")) - array_min(col("st.ring"))),
              6).as("season_amp"))
      .orderBy(col("event_type"))
  }

  /** Exact centi-unit hourly means per type — ONE definition of the
    * fixed-point hourly series shared by the correlation / robust-trend
    * / SAX / seasonal detectors (micro-unit long sums, integral DIV to
    * centi-units; see the DIV-not-`/` note in [[seasonalAnomaly]]).
    * The oracle twin is [[hourlyCentiSql]].
    */
  private def hourlyCentiMeans(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n_ev"),
           sum(graft.functions.Rounding.microUnits(col("value"))).as("sm"))
      .withColumn("y", expr("sm DIV (n_ev * 10000L)"))
      .select(col("event_type"), col("hr"), col("y"))

  /** Tukey boxplot surface per type: exact nearest-rank quartiles,
    * IQR fences at 1.5×IQR, and the outlier counts outside them — the
    * visual-analytics complement to [[robustStats]]' winsorized means
    * (that query CLAMPS outliers; this one COUNTS them, which is what
    * a boxplot draws). Quartile index is the shared `⌊n·q⌋+1`
    * nearest-rank; fences combine the exact quartile values with the
    * same 1.5 literal on both engines, and the outlier comparisons run
    * against identical doubles. Same documented per-key multiset
    * buffering as robustStats — groups are the handful of event types;
    * the 100 TB form takes its quartiles from the KLL family.
    */
  def iqrFences(spark: SparkSession, dir: String): DataFrame = {
    val q = (lst: Column, n: Column, f: Double) =>
      element_at(lst, (floor(n.cast("double") * lit(f)) + 1).cast("int"))
    Tables
      .events(spark, dir)
      // NULL values would desynchronize n (counts them) from the
      // collected list (drops them) and shift every quartile index
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(col("value"))).as("lst"),
           count(lit(1)).as("n"))
      .withColumn("q1", q(col("lst"), col("n"), 0.25))
      .withColumn("q3", q(col("lst"), col("n"), 0.75))
      .withColumn("lo", col("q1") - lit(1.5) * (col("q3") - col("q1")))
      .withColumn("hi", col("q3") + lit(1.5) * (col("q3") - col("q1")))
      .select(
        col("event_type"), col("n"), col("q1"), col("q3"),
        round(col("lo"), 6).as("fence_low"),
        round(col("hi"), 6).as("fence_high"),
        size(filter(col("lst"), x => x < col("lo"))).cast("long")
          .as("n_low_outliers"),
        size(filter(col("lst"), x => x > col("hi"))).cast("long")
          .as("n_high_outliers"))
      .orderBy(col("event_type"))
  }

  /** Benford expected first-digit probabilities log₁₀(1+1/d), d=1..9,
    * as shared literals (both engines compare against identical
    * doubles), and the χ²(df=8, α=0.05) critical value.
    */
  private[operators] val BenfordP: Seq[Double] =
    (1 to 9).map(d => math.log10(1.0 + 1.0 / d))
  private val BenfordChi2Crit = 15.507

  /** Benford first-digit deviation per event type — the data-forensics
    * probe for fabricated or clipped metrics: the first significant
    * digit of each value's exact cents integer tallies against
    * Benford's law, and χ² = Σ(obs − n·p_d)²/(n·p_d) over the NINE
    * digit cells decides `suspicious` at the df=8 critical value. The
    * digit extraction is pure integer arithmetic (leading digit of a
    * long); counts are exact longs; the χ² terms fold in digit order
    * with the expected p_d as shared literals, so the statistic is
    * engine-exact. Negative values contribute their MAGNITUDE's
    * leading digit (the Benford convention); only exactly-zero cents
    * carry no digit and are excluded (reported in n_zero). Synthetic N(50,15) metrics are
    * EXPECTED to fail Benford — that is the probe working.
    *
    * Scale: one (type, digit) count shuffle (9·|type| cells), then a
    * metadata-scale fold.
    */
  def benfordDeviation(spark: SparkSession, dir: String): DataFrame = {
    val cents = floor(col("value") * 100 + lit(0.5)).cast("long")
    // |cents| leading digit (Benford applies to magnitudes); ONLY exact
    // zero carries no digit. ONE corpus-scale aggregation: the NULL
    // digit rides as its own cell, and totals re-aggregate the
    // metadata-scale cell frame
    val digits = Tables
      .events(spark, dir)
      .select(col("event_type"), cents.as("c"))
      .withColumn("d",
                  when(col("c") === 0, lit(null))
                    .otherwise(expr(
                      "CAST(substring(CAST(abs(c) AS STRING), 1, 1) AS BIGINT)")))
    val cells = digits
      .groupBy(col("event_type"), col("d"))
      .agg(count(lit(1)).as("cnt"))
    val totals = cells
      .groupBy(col("event_type"))
      .agg(sum(when(col("d").isNull, col("cnt")).otherwise(0L)).as("n_zero"),
           sum(when(col("d").isNotNull, col("cnt")).otherwise(0L)).as("n"))
    val counts = totals
      .select(col("event_type"), col("n_zero"), col("n"),
              explode(sequence(lit(1L), lit(9L))).as("d"))
      .join(cells.filter(col("d").isNotNull), Seq("event_type", "d"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .groupBy(col("event_type"))
      .agg(max(col("n_zero")).as("n_zero"), max(col("n")).as("n"),
           transform(sort_array(collect_list(struct(col("d"), col("cnt")))),
                     _.getField("cnt")).as("obs"))
    val pArr = array(BenfordP.map(lit): _*)
    val chi2 = aggregate(
      sequence(lit(0), lit(8)),
      lit(0.0),
      (s, i) => {
        val e = col("n").cast("double") * element_at(pArr, i + 1)
        val o = element_at(col("obs"), i + 1).cast("double")
        s + (o - e) * (o - e) / e
      })
    counts
      .select(col("event_type"), col("n"), col("n_zero"),
              round(when(col("n") === 0, lit(null)).otherwise(chi2), 4)
                .as("chi2"),
              when(col("n") === 0, lit(null))
                .otherwise(chi2 > BenfordChi2Crit).as("suspicious"))
      .orderBy(col("event_type"))
  }

  /** Pearson correlation between every pair of per-type hourly KPI
    * series — "which metrics move together": the cross-TYPE
    * completion of the correlation family ([[autocorrLags]] is
    * within-type across time, [[dtwProfiles]] is shape similarity
    * modulo phase). Series align on shared calendar hours via an
    * equi-join on the hour bucket; every sum the estimator needs
    * (n, Σx, Σy, Σxy, Σx², Σy² over exact centi-unit longs) is
    * order-free partial aggregation, and r combines them with the
    * IDENTICAL longs→double expression on both engines, degenerate
    * variances NULLed like [[trendOls]].
    *
    * Scale: one (type, hour) aggregation shuffle, then a
    * manifest-scale self-join on the calendar-bounded hourly frame
    * and a |types|² rollup.
    */
  def typeCorrMatrix(spark: SparkSession, dir: String): DataFrame = {
    val hourly = hourlyCentiMeans(spark, dir)
    val d = (c: Column) => c.cast("double")
    val sums = hourly.as("a")
      .join(hourly.as("b"),
            col("a.hr") === col("b.hr") &&
              col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
               col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n"),
           sum(col("a.y")).as("sx"), sum(col("b.y")).as("sy"),
           sum(col("a.y") * col("b.y")).as("sxy"),
           sum(col("a.y") * col("a.y")).as("sxx"),
           sum(col("b.y") * col("b.y")).as("syy"))
    val varX = d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val varY = d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy"))
    val cov = d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))
    sums.select(
      col("type_a"), col("type_b"), col("n").as("n_hours"),
      round(when(varX === 0.0 || varY === 0.0, lit(null))
              .otherwise(cov / sqrt(varX * varY)), 6).as("pearson_r"),
      when(varX === 0.0 || varY === 0.0, lit(null))
        .otherwise(abs(cov / sqrt(varX * varY)) > 0.5).as("strong"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** DTW boundary sentinel — far above any reachable path cost (24
    * steps × ≤10⁶ ppm), far below long overflow even after one add.
    */
  private val DtwInf = 1000000000000000L

  /** Dynamic-time-warping distance between every pair of per-type
    * DAILY LOAD PROFILES — "which event types share a daily shape,
    * allowing phase drift": each type reduces to 24 hour-of-day shares
    * in exact integer ppm (`c_h·10⁶ DIV total`, dense grid — silent
    * hours are real zeros), and the classic DP
    * `D[i][j] = |aᵢ−bⱼ| + min(D[i−1][j], D[i][j−1], D[i−1][j−1])`
    * runs ENTIRELY in long arithmetic (costs, mins, sums — no float
    * anywhere), so both engines agree bit-for-bit by construction, not
    * by IEEE-expression discipline. The DP is a nested fold: the outer
    * aggregate walks profile A carrying the padded previous DP row
    * (25 longs, [[DtwInf]] boundary), the inner one builds the next
    * row left-to-right — the same shape as the oracle's nested
    * `list_reduce` (inner elements ride as 1-long lists so DuckDB's
    * acc/element types unify).
    *
    * Scale: one (type, hour-of-day) count shuffle; everything after —
    * the 24-ppm profiles, the |types|² pair join, the 24×24 DP — is
    * metadata-sized. Unequal-length or finer-grained profiles reuse
    * the identical fold with different sequence bounds.
    */
  def dtwProfiles(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables
      .events(spark, dir)
      .groupBy(col("event_type"), hour(col("ts")).cast("long").as("hod"))
      .agg(count(lit(1)).as("c"))
    val dense = counts
      .groupBy(col("event_type"))
      .agg(sum(col("c")).as("tot"))
      .select(col("event_type"), col("tot"),
              explode(sequence(lit(0L), lit(23L))).as("hod"))
      .join(counts, Seq("event_type", "hod"), "left")
      .withColumn("ppm", expr("coalesce(c, 0L) * 1000000L DIV tot"))
    val profiles = dense
      .groupBy(col("event_type"))
      .agg(transform(sort_array(collect_list(struct(col("hod"), col("ppm")))),
                     _.getField("ppm")).as("arr"))
    val bArr = col("b.arr")
    val dtw = aggregate(
      col("a.arr"),
      concat(array(lit(0L)), array_repeat(lit(DtwInf), 24)),
      (prev, ai) =>
        aggregate(
          sequence(lit(1), lit(24)),
          array(lit(DtwInf)),
          (nr, j) =>
            concat(nr,
                   array(abs(ai - element_at(bArr, j)) +
                     least(element_at(prev, j + 1), element_at(nr, j),
                           element_at(prev, j))))))
    profiles.as("a")
      .join(profiles.as("b"), col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("type_a"),
              col("b.event_type").as("type_b"),
              element_at(dtw, 25).as("dtw_ppm"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Theil–Sen robust trend per type: the MEDIAN of all pairwise
    * slopes over the hourly series — the estimator that shrugs off the
    * outliers that drag [[trendOls]]'s least squares (29% breakdown
    * point vs 0). Each slope is the exact-rational
    * (y₂−y₁)/(t₂−t₁) evaluated as the same longs→double division on
    * both engines (y in centi-units, t in epoch hours); the median is
    * Spark's interpolated `percentile` ≡ DuckDB `quantile_cont` over
    * identical doubles. Reported in VALUE units per day (centi/hour
    * × 24 ÷ 100), with the sign verdict on the raw median; a type with
    * fewer than two hourly buckets keeps its row with NULL slope
    * (the family's degenerate convention, like [[trendOls]]).
    *
    * Scale, stated honestly: classic Theil–Sen is O(n²) pairs — here
    * bounded by the CALENDAR (the hourly manifest: ~6×10⁵ pairs per
    * type-month, independent of event volume), so the self-join is a
    * manifest-scale equi-join on type. A decade-long series switches
    * to the standard pair-sampling or repeated-median variant; the
    * estimator's pair expression is unchanged.
    */
  def theilsenTrend(spark: SparkSession, dir: String): DataFrame = {
    val hourly = hourlyCentiMeans(spark, dir)
      .withColumn("t", expr("unix_millis(hr) DIV 3600000"))
      .select(col("event_type"), col("t"), col("y"))
    val pairs = hourly.as("a")
      .join(hourly.as("b"),
            col("a.event_type") === col("b.event_type") &&
              col("a.t") < col("b.t"))
      .select(col("a.event_type").as("event_type"),
              ((col("b.y") - col("a.y")).cast("double") /
                (col("b.t") - col("a.t")).cast("double")).as("slope"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"),
           round(percentile(col("slope"), lit(0.5)) * 24.0 / 100.0, 6)
             .as("slope_per_day"),
           (percentile(col("slope"), lit(0.5)) > 0.0).as("trending_up"))
    // keep degenerate types (< 2 buckets → no pairs) as NULL-slope rows
    hourly
      .groupBy(col("event_type")).agg(count(lit(1)).as("nb"))
      .join(pairs, Seq("event_type"), "left")
      .select(col("event_type"),
              coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
              col("slope_per_day"), col("trending_up"))
      .orderBy(col("event_type"))
  }

  /** SAX breakpoints for a 4-letter alphabet: the N(0,1) quartiles
    * (Lin/Keogh SAX, DMKD'07) — interpolated as shared literals so both
    * engines compare against identical doubles.
    */
  private val SaxQ1 = -0.6744897501960817
  private val SaxQ3 = 0.6744897501960817

  /** SAX motif mining over the hourly KPI series: each hour z-scores
    * against its type's series mean/σ (exact centi-unit long sums →
    * the shared double expression; a flat series pins z = 0), maps to
    * a 4-letter symbol at the N(0,1) quartile breakpoints, and the
    * symbol stream's sliding 4-grams are counted — repeated words are
    * the series' MOTIFS (recurring local shapes: 'dcba' = spike-decay,
    * 'abcd' = ramp), the classic symbolic time-series-mining primitive
    * next to [[autocorrLags]]'s global periodicity probe. Only words
    * seen ≥ 3 times survive (motif, not noise).
    *
    * Scale: one (type, hour) aggregation shuffle; the z/symbol pass is
    * a pure map; the 4-gram window partitions per type over the
    * calendar-bounded hourly series (same manifest argument as
    * [[autocorrLags]]); the word count is a metadata-scale aggregate.
    */
  def saxMotifs(spark: SparkSession, dir: String): DataFrame = {
    val hourly = hourlyCentiMeans(spark, dir).withColumnRenamed("y", "hm_c")
    val stats = hourly
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("hm_c")).as("s1"),
           sum(col("hm_c") * col("hm_c")).as("s2"))
      .withColumn("mu", col("s1").cast("double") / col("n"))
      .withColumn("sigma",
                  sqrt(greatest(col("s2").cast("double") / col("n") -
                                  col("mu") * col("mu"),
                                lit(0.0))))
      .select(col("event_type"), col("mu"), col("sigma"))
    val z = hourly
      .join(broadcast(stats), "event_type")
      .withColumn("z",
                  when(col("sigma") === 0.0, lit(0.0))
                    .otherwise((col("hm_c").cast("double") - col("mu")) /
                      col("sigma")))
      .withColumn("sym",
                  when(col("z") < SaxQ1, "a")
                    .when(col("z") < 0.0, "b")
                    .when(col("z") < SaxQ3, "c")
                    .otherwise("d"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(col("hr"))
    z.withColumn("s2c", lead(col("sym"), 1).over(w))
      .withColumn("s3c", lead(col("sym"), 2).over(w))
      .withColumn("s4c", lead(col("sym"), 3).over(w))
      .withColumn("hr4", lead(col("hr"), 3).over(w))
      // a word is a real 4-HOUR window only when the led hours are
      // calendar-contiguous — never bridge a gap in the series
      .filter(col("s4c").isNotNull &&
        col("hr4") === col("hr") + expr("INTERVAL 3 HOURS"))
      .select(col("event_type"),
              concat(col("sym"), col("s2c"), col("s3c"), col("s4c"))
                .as("word"))
      .groupBy(col("event_type"), col("word"))
      .agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") >= 3)
      .orderBy(col("event_type"), col("n_occurrences").desc, col("word"))
  }

  /** Fano-factor burstiness per event type — variance-to-mean ratio of
    * the per-minute arrival counts over the type's CALENDAR span
    * (silent minutes count as zero, so a type that fires 60k events in
    * one minute of a quiet month reads as extremely bursty, not
    * uniform): Fano = 1 for a Poisson process, > 1 bursty, < 1
    * regular — the traffic-shape probe next to [[hourlyEntropy]]'s
    * daily-rhythm profile. Observed-minute sums (N, ΣC²) and the span
    * are exact longs; Fano = (span·ΣC² − N²)/(span·N) is the same
    * longs→double division on both engines and the `bursty` verdict is
    * the pure integer comparison `span·ΣC² − N² > span·N` (variance >
    * mean, cross-multiplied). A single-minute span with one event is
    * Fano 0 (regular), not a division hazard: N ≥ 1 whenever the type
    * exists.
    *
    * Scale: one (type, minute) count shuffle, then a per-type rollup of
    * three longs — the span arrives from min/max, never a dense
    * calendar join. `span·ΣC²` holds to ~10⁵ events/minute-year in
    * longs; the 100 TB form lifts the products to decimal(38,0).
    */
  def burstinessFano(spark: SparkSession, dir: String): DataFrame = {
    val minutes = Tables
      .events(spark, dir)
      .select(col("event_type"),
              expr("unix_millis(date_trunc('MINUTE', ts)) DIV 60000")
                .as("m"))
      .groupBy(col("event_type"), col("m"))
      .agg(count(lit(1)).as("c"))
    minutes
      .groupBy(col("event_type"))
      .agg((max(col("m")) - min(col("m")) + 1L).as("span_minutes"),
           sum(col("c")).as("n_events"),
           sum(col("c") * col("c")).as("s2"))
      .select(
        col("event_type"), col("span_minutes"), col("n_events"),
        round((col("span_minutes") * col("s2") -
                col("n_events") * col("n_events")).cast("double") /
                (col("span_minutes") * col("n_events")).cast("double"), 6)
          .as("fano"),
        (col("span_minutes") * col("s2") -
          col("n_events") * col("n_events") >
          col("span_minutes") * col("n_events")).as("bursty"))
      .orderBy(col("event_type"))
  }

  /** ln 2 and ln 24, as shared literal constants: both engines rescale
    * the natural-log entropy by the SAME double (Scala's toString
    * round-trips, DuckDB parses to nearest), sidestepping any
    * log2()-implementation divergence.
    */
  private[operators] val Ln2 = math.log(2.0)
  private[operators] val Ln24 = math.log(24.0)

  /** Hour-of-day load entropy per event type — the uniformity profile a
    * bot/abuse triage runs: organic traffic has a daily rhythm (low
    * entropy), scripted load is flat (entropy → log₂24). Counts are
    * exact longs; each Shannon term is `−p·ln p` with p the same
    * two-long ratio on both engines (ln arguments audited by
    * `tools/ln_audit.py`'s sibling check, per the repo's log-parity
    * discipline), and the sum folds over the HOUR-ORDERED term list so
    * float addition order — the one non-associative step — is pinned.
    * entropy_bits divides the nat sum by the shared [[Ln2]] literal;
    * norm_entropy by [[Ln24]] into [0, 1].
    *
    * Scale: one (type, hour-of-day) count shuffle (24·|type| rows),
    * then a metadata-scale fold. Nothing here grows with event volume.
    */
  def hourlyEntropy(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables
      .events(spark, dir)
      .groupBy(col("event_type"), hour(col("ts")).cast("long").as("hod"))
      .agg(count(lit(1)).as("c"))
    counts
      .groupBy(col("event_type"))
      .agg(sum(col("c")).as("n_events"),
           sort_array(collect_list(struct(col("hod"), col("c")))).as("hs"))
      .withColumn(
        "ent",
        aggregate(
          col("hs"),
          lit(0.0),
          (s, e) => {
            val p = e.getField("c").cast("double") /
              col("n_events").cast("double")
            s - p * log(p)
          }))
      .select(col("event_type"), col("n_events"),
              round(col("ent") / lit(Ln2), 6).as("entropy_bits"),
              round(col("ent") / lit(Ln24), 6).as("norm_entropy"))
      .orderBy(col("event_type"))
  }

  // ---- DuckDB oracles ----------------------------------------------------

  private val ev = s"(${Tables.eventsSql})"

  /** Oracle twin of [[hourlyCentiMeans]]: CTEs `h`/`h2` ending in
    * h2(event_type, hr, y) — one definition of the fixed-point hourly
    * series on the SQL side too.
    */
  private lazy val hourlyCentiSql: String =
    s"""h AS (
       |  SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS n_ev,
       |         sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS sm
       |  FROM $ev e GROUP BY 1, 2
       |),
       |h2 AS (SELECT event_type, hr, sm // (n_ev * 10000) AS y FROM h)""".stripMargin

  /** Holt–Winters oracle SQL, assembled programmatically: the fold
    * accumulator is a flat 27-double list [l, b, t, s₁..s₂₄]; shared
    * subexpressions (sPrev, lNew) are inlined textually — IEEE
    * recomputation is bit-stable, so parity with the Spark struct fold
    * holds expression-for-expression.
    */
  private def seriesHwSql: String = {
    val m = HwPeriod
    val x = "e[1]"
    val accL = "acc[1]"; val accB = "acc[2]"; val accT = "acc[3]"
    val l0 = s"$accL / CAST($m AS DOUBLE)"
    val lP = s"(CASE WHEN $accT = $m THEN $l0 ELSE $accL END)"
    def ringP(j: String) =
      s"(CASE WHEN $accT = $m THEN acc[$j + 4] - $l0 ELSE acc[$j + 4] END)"
    val idx0 = s"CAST($accT % $m AS INT)"
    val sPrev = ringP(idx0)
    val lNew =
      s"(CAST($HoltAlpha AS DOUBLE) * ($x - $sPrev) " +
        s"+ CAST($HoltAlphaC AS DOUBLE) * ($lP + $accB))"
    val bNew =
      s"(CAST($HoltBeta AS DOUBLE) * ($lNew - $lP) " +
        s"+ CAST($HoltBetaC AS DOUBLE) * $accB)"
    val sNew =
      s"(CAST($HwGamma AS DOUBLE) * ($x - $lNew) " +
        s"+ CAST($HwGammaC AS DOUBLE) * $sPrev)"
    val zeros = s"list_transform(range(0, ${3 + m}), z -> CAST(0 AS DOUBLE))"
    val elemPad = s"list_transform(range(0, ${2 + m}), z -> CAST(0 AS DOUBLE))"
    s"""WITH b AS (
       |  SELECT event_type, date_trunc('hour', ts) AS bucket,
       |         round(avg(value), 6) AS av
       |  FROM $ev e0 GROUP BY 1, 2
       |),
       |s AS (
       |  SELECT event_type, count(*) AS n_buckets,
       |         list(av ORDER BY bucket) AS vals
       |  FROM b GROUP BY event_type
       |),
       |f AS (
       |  SELECT event_type, n_buckets,
       |         list_reduce(
       |           list_prepend($zeros,
       |             list_transform(vals, x -> [x] || $elemPad)),
       |           (acc, e) ->
       |             [CASE WHEN $accT < $m THEN $lP + $x ELSE $lNew END,
       |              CASE WHEN $accT < $m THEN $accB ELSE $bNew END,
       |              $accT + 1]
       |             || list_transform(range(0, $m), j ->
       |                  CASE WHEN j = $idx0
       |                       THEN (CASE WHEN $accT < $m THEN $x
       |                             ELSE $sNew END)
       |                       ELSE ${ringP("j")} END)) AS st
       |  FROM s
       |)
       |SELECT event_type, n_buckets,
       |       round(CASE WHEN n_buckets >= ${m + 1} THEN st[1] END, 6)
       |         AS level,
       |       round(CASE WHEN n_buckets >= ${m + 1} THEN st[2] END, 6)
       |         AS trend,
       |       round(CASE WHEN n_buckets >= ${m + 1}
       |             THEN st[1] + st[2]
       |                  + st[CAST(n_buckets % $m AS INT) + 4]
       |             END, 6) AS forecast_1,
       |       round(CASE WHEN n_buckets >= ${m + 1}
       |             THEN list_aggregate(st[4:${3 + m}], 'max')
       |                  - list_aggregate(st[4:${3 + m}], 'min')
       |             END, 6) AS season_amp
       |FROM f ORDER BY event_type""".stripMargin
  }

  /** Benford oracle: the χ² fold with the SAME p_d literals, digits in
    * pinned order.
    */
  private def benfordSql: String = {
    val pl = BenfordP.map(p => s"CAST($p AS DOUBLE)").mkString("[", ", ", "]")
    s"""WITH e AS ($ev),
       |dg AS (
       |  SELECT event_type,
       |         CASE WHEN CAST(floor(value * 100 + 0.5) AS BIGINT) = 0
       |              THEN NULL
       |              ELSE CAST(substr(CAST(abs(CAST(floor(value * 100 + 0.5)
       |                                         AS BIGINT)) AS VARCHAR),
       |                               1, 1) AS BIGINT) END AS d
       |  FROM e
       |),
       |allcells AS (SELECT event_type, d, count(*) AS cnt
       |             FROM dg GROUP BY 1, 2),
       |tot AS (
       |  SELECT event_type,
       |         CAST(sum(CASE WHEN d IS NULL THEN cnt ELSE 0 END) AS BIGINT)
       |           AS n_zero,
       |         CAST(sum(CASE WHEN d IS NOT NULL THEN cnt ELSE 0 END)
       |              AS BIGINT) AS n
       |  FROM allcells GROUP BY 1
       |),
       |cells AS (SELECT event_type, d, cnt FROM allcells
       |          WHERE d IS NOT NULL),
       |grid AS (SELECT t.event_type, t.n_zero, t.n, r.d
       |         FROM tot t, UNNEST(range(1, 10)) r(d)),
       |dense AS (
       |  SELECT g.event_type, g.n_zero, g.n, g.d,
       |         CAST(coalesce(c.cnt, 0) AS DOUBLE) AS cnt
       |  FROM grid g LEFT JOIN cells c
       |    ON g.event_type = c.event_type AND g.d = c.d
       |),
       |agg AS (
       |  SELECT event_type, max(n_zero) AS n_zero, max(n) AS n,
       |         list(cnt ORDER BY d) AS obs
       |  FROM dense GROUP BY 1
       |),
       |f AS (
       |  SELECT event_type, n, n_zero,
       |         list_reduce(
       |           list_prepend([CAST(0 AS DOUBLE), 0],
       |             list_transform(range(0, 9),
       |                            i -> [CAST(i AS DOUBLE), 0])),
       |           (acc, x) -> [
       |             acc[1]
       |               + (obs[CAST(x[1] AS INT) + 1]
       |                  - CAST(n AS DOUBLE) * $pl[CAST(x[1] AS INT) + 1])
       |                 * (obs[CAST(x[1] AS INT) + 1]
       |                    - CAST(n AS DOUBLE) * $pl[CAST(x[1] AS INT) + 1])
       |                 / (CAST(n AS DOUBLE) * $pl[CAST(x[1] AS INT) + 1]),
       |             CAST(0 AS DOUBLE)])[1] AS chi2
       |  FROM agg
       |)
       |SELECT event_type, n, n_zero,
       |       round(CASE WHEN n = 0 THEN NULL ELSE chi2 END, 4) AS chi2,
       |       CASE WHEN n = 0 THEN NULL
       |            ELSE chi2 > CAST($BenfordChi2Crit AS DOUBLE)
       |       END AS suspicious
       |FROM f ORDER BY event_type""".stripMargin
  }

  private lazy val ewmaSql: String =
    s"""WITH b AS (
       |  SELECT event_type, date_trunc('minute', ts) AS bucket,
       |         round(CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
       |                      AS DOUBLE)
       |                 / CAST(count(*) * 1000000 AS DOUBLE), 6) AS av
       |  FROM $ev e GROUP BY 1, 2
       |)
       |SELECT event_type, count(*) AS n_buckets,
       |       round(list_reduce(list(av ORDER BY bucket),
       |                         (s, x) -> ($Alpha * x) + (${1 - Alpha} * s)), 6)
       |         AS ewma_value
       |FROM b GROUP BY event_type ORDER BY event_type""".stripMargin

  private lazy val cusumSql: String =
      s"""WITH b AS (
         |  SELECT event_type, date_trunc('minute', ts) AS bucket,
         |         (2 * sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
         |            + count(*) * 10000) // (2 * count(*) * 10000) AS xc
         |  FROM $ev e GROUP BY 1, 2
         |),
         |s AS (
         |  SELECT event_type, count(*) AS n_buckets,
         |         sum(xc) AS s1, sum(xc * xc) AS s2,
         |         list(CAST(xc AS DOUBLE) ORDER BY bucket) AS vals
         |  FROM b GROUP BY 1
         |),
         |p1 AS (SELECT *, CAST(s1 AS DOUBLE) / n_buckets AS mu FROM s),
         |p2 AS (
         |  SELECT *, sqrt(greatest(CAST(s2 AS DOUBLE) / n_buckets - mu * mu,
         |                          CAST(0 AS DOUBLE))) AS sigma
         |  FROM p1
         |),
         |p AS (
         |  SELECT *, CAST($CusumK AS DOUBLE) * sigma AS k,
         |         CAST($CusumH AS DOUBLE) * sigma AS h
         |  FROM p2
         |),
         |f AS (
         |  SELECT event_type, n_buckets, mu, sigma,
         |         list_reduce(
         |           list_prepend([CAST(0 AS DOUBLE), 0, 0, 0],
         |                        list_transform(vals, x -> [x, 0, 0, 0])),
         |           (acc, e) -> [
         |             CASE WHEN greatest(acc[1] + (e[1] - mu - k),
         |                                CAST(0 AS DOUBLE)) > h THEN 0
         |                  ELSE greatest(acc[1] + (e[1] - mu - k),
         |                                CAST(0 AS DOUBLE)) END,
         |             CASE WHEN greatest(acc[2] + (mu - e[1] - k),
         |                                CAST(0 AS DOUBLE)) > h THEN 0
         |                  ELSE greatest(acc[2] + (mu - e[1] - k),
         |                                CAST(0 AS DOUBLE)) END,
         |             acc[3] + CASE WHEN greatest(acc[1] + (e[1] - mu - k),
         |                                         CAST(0 AS DOUBLE)) > h
         |                           THEN 1 ELSE 0 END,
         |             acc[4] + CASE WHEN greatest(acc[2] + (mu - e[1] - k),
         |                                         CAST(0 AS DOUBLE)) > h
         |                           THEN 1 ELSE 0 END]) AS st
         |  FROM p
         |)
         |SELECT event_type, n_buckets,
         |       CAST(st[3] AS BIGINT) AS n_shifts_up,
         |       CAST(st[4] AS BIGINT) AS n_shifts_down,
         |       round(mu / 100, 4) AS baseline_mean,
         |       round(sigma / 100, 4) AS baseline_sigma
         |FROM f ORDER BY event_type""".stripMargin

  /** Shared by `drift_tv` (batch) and `stream_drift_drain` (the MapState
    * histogram processor through an actual writeStream drain).
    */
  private val driftTvSql: String =
    s"""WITH e AS ($ev),
       |b AS (
       |  SELECT event_type, ts < TIMESTAMP '2024-01-16' AS fh,
       |         least(CAST(floor(value / 10) AS BIGINT), 50) AS band
       |  FROM e
       |),
       |c AS (
       |  SELECT event_type, band,
       |         CAST(sum(CASE WHEN fh THEN 1 ELSE 0 END) AS BIGINT) AS c,
       |         CAST(sum(CASE WHEN fh THEN 0 ELSE 1 END) AS BIGINT) AS d
       |  FROM b GROUP BY 1, 2
       |),
       |t AS (
       |  SELECT event_type, CAST(sum(c) AS BIGINT) AS na,
       |         CAST(sum(d) AS BIGINT) AS nb
       |  FROM c GROUP BY 1
       |)
       |SELECT c.event_type, max(na) AS n_first, max(nb) AS n_second,
       |       CAST(sum(abs(c * nb - d * na)) AS BIGINT) AS tv_num,
       |       round(CAST(sum(abs(c * nb - d * na)) AS DOUBLE)
       |             / (2.0 * CAST(max(na) AS DOUBLE)
       |                * CAST(max(nb) AS DOUBLE)), 6) AS tv_distance,
       |       CAST(sum(abs(c * nb - d * na)) AS BIGINT) * 5
       |         > max(na) * max(nb) AS drifted
       |FROM c JOIN t USING (event_type)
       |GROUP BY 1 ORDER BY event_type""".stripMargin

  val oracles: Map[String, String] = Map(
    "iqr_fences" ->
      s"""WITH e AS ($ev),
         |a AS (
         |  SELECT event_type, list_sort(list(value)) AS lst,
         |         count(*) AS n
         |  FROM e WHERE value IS NOT NULL GROUP BY 1
         |),
         |qq AS (
         |  SELECT event_type, n, lst,
         |         lst[CAST(floor(CAST(n AS DOUBLE) * 0.25) AS INT) + 1] AS q1,
         |         lst[CAST(floor(CAST(n AS DOUBLE) * 0.75) AS INT) + 1] AS q3
         |  FROM a
         |),
         |ff AS (
         |  SELECT *, q1 - CAST(1.5 AS DOUBLE) * (q3 - q1) AS lo,
         |         q3 + CAST(1.5 AS DOUBLE) * (q3 - q1) AS hi
         |  FROM qq
         |)
         |SELECT event_type, n, q1, q3,
         |       round(lo, 6) AS fence_low,
         |       round(hi, 6) AS fence_high,
         |       CAST(len(list_filter(lst, x -> x < lo)) AS BIGINT)
         |         AS n_low_outliers,
         |       CAST(len(list_filter(lst, x -> x > hi)) AS BIGINT)
         |         AS n_high_outliers
         |FROM ff ORDER BY event_type""".stripMargin,
    "benford_deviation" -> benfordSql,
    "type_corr_matrix" ->
      s"""WITH $hourlyCentiSql,
         |s AS (
         |  SELECT a.event_type AS type_a, b.event_type AS type_b,
         |         count(*) AS n,
         |         CAST(sum(a.y) AS BIGINT) AS sx,
         |         CAST(sum(b.y) AS BIGINT) AS sy,
         |         CAST(sum(a.y * b.y) AS BIGINT) AS sxy,
         |         CAST(sum(a.y * a.y) AS BIGINT) AS sxx,
         |         CAST(sum(b.y * b.y) AS BIGINT) AS syy
         |  FROM h2 a JOIN h2 b
         |    ON a.hr = b.hr AND a.event_type < b.event_type
         |  GROUP BY 1, 2
         |),
         |v AS (
         |  SELECT *,
         |         CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         |           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
         |         CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
         |           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy,
         |         CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
         |           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cv
         |  FROM s
         |)
         |SELECT type_a, type_b, n AS n_hours,
         |       round(CASE WHEN vx = 0 OR vy = 0 THEN NULL
         |             ELSE cv / sqrt(vx * vy) END, 6) AS pearson_r,
         |       CASE WHEN vx = 0 OR vy = 0 THEN NULL
         |       ELSE abs(cv / sqrt(vx * vy)) > CAST(0.5 AS DOUBLE)
         |       END AS strong
         |FROM v ORDER BY type_a, type_b""".stripMargin,
    "dtw_profiles" ->
      s"""WITH e AS ($ev),
         |c AS (
         |  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod, count(*) AS c
         |  FROM e GROUP BY 1, 2
         |),
         |t AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS tot
         |      FROM c GROUP BY 1),
         |g AS (SELECT t.event_type, t.tot, r.h AS hod
         |      FROM t, UNNEST(range(0, 24)) r(h)),
         |d AS (
         |  SELECT g.event_type, g.hod,
         |         coalesce(c.c, 0) * 1000000 // g.tot AS ppm
         |  FROM g LEFT JOIN c ON g.event_type = c.event_type
         |                     AND g.hod = c.hod
         |),
         |pr AS (
         |  SELECT event_type, list(CAST(ppm AS BIGINT) ORDER BY hod) AS arr
         |  FROM d GROUP BY 1
         |)
         |SELECT a.event_type AS type_a, b.event_type AS type_b,
         |       list_reduce(
         |         list_prepend(
         |           [CAST(0 AS BIGINT)]
         |             || list_transform(range(0, 24),
         |                               z -> CAST($DtwInf AS BIGINT)),
         |           list_transform(a.arr, v -> [v])),
         |         (prev, x) -> list_reduce(
         |           list_prepend([CAST($DtwInf AS BIGINT)],
         |                        list_transform(range(1, 25),
         |                                       j -> [CAST(j AS BIGINT)])),
         |           (nr, e) -> nr ||
         |             [abs(x[1] - b.arr[CAST(e[1] AS INT)])
         |              + least(prev[CAST(e[1] AS INT) + 1],
         |                      nr[CAST(e[1] AS INT)],
         |                      prev[CAST(e[1] AS INT)])]))[25] AS dtw_ppm
         |FROM pr a JOIN pr b ON a.event_type < b.event_type
         |ORDER BY type_a, type_b""".stripMargin,
    "theilsen_trend" ->
      s"""WITH $hourlyCentiSql,
         |h3 AS (SELECT event_type, epoch_ms(hr) // 3600000 AS t, y FROM h2),
         |p AS (
         |  SELECT a.event_type,
         |         CAST(b.y - a.y AS DOUBLE) / CAST(b.t - a.t AS DOUBLE)
         |           AS slope
         |  FROM h3 a JOIN h3 b
         |    ON a.event_type = b.event_type AND a.t < b.t
         |),
         |agg AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
         |         round(quantile_cont(slope, 0.5) * 24.0 / 100.0, 6)
         |           AS slope_per_day,
         |         quantile_cont(slope, 0.5) > 0.0 AS trending_up
         |  FROM p GROUP BY 1
         |),
         |types AS (SELECT DISTINCT event_type FROM h2)
         |SELECT t.event_type, coalesce(agg.n_pairs, 0) AS n_pairs,
         |       agg.slope_per_day, agg.trending_up
         |FROM types t LEFT JOIN agg ON t.event_type = agg.event_type
         |ORDER BY t.event_type""".stripMargin,
    "sax_motifs" ->
      s"""WITH $hourlyCentiSql,
         |st AS (
         |  SELECT event_type, count(*) AS n,
         |         CAST(sum(y) AS BIGINT) AS s1,
         |         CAST(sum(y * y) AS BIGINT) AS s2
         |  FROM h2 GROUP BY 1
         |),
         |st1 AS (SELECT *, CAST(s1 AS DOUBLE) / n AS mu FROM st),
         |st2 AS (
         |  SELECT *, sqrt(greatest(CAST(s2 AS DOUBLE) / n - mu * mu,
         |                          CAST(0 AS DOUBLE))) AS sigma
         |  FROM st1
         |),
         |z AS (
         |  SELECT h2.event_type, h2.hr,
         |         CASE WHEN st2.sigma = 0 THEN CAST(0 AS DOUBLE)
         |              ELSE (CAST(h2.y AS DOUBLE) - st2.mu) / st2.sigma
         |         END AS z
         |  FROM h2 JOIN st2 ON h2.event_type = st2.event_type
         |),
         |sym AS (
         |  SELECT event_type, hr,
         |         CASE WHEN z < $SaxQ1 THEN 'a'
         |              WHEN z < 0.0 THEN 'b'
         |              WHEN z < $SaxQ3 THEN 'c'
         |              ELSE 'd' END AS sym
         |  FROM z
         |),
         |words AS (
         |  SELECT event_type,
         |         sym || lead(sym, 1) OVER w || lead(sym, 2) OVER w
         |             || lead(sym, 3) OVER w AS word,
         |         lead(hr, 3) OVER w = hr + INTERVAL 3 HOUR AS contiguous
         |  FROM sym
         |  WINDOW w AS (PARTITION BY event_type ORDER BY hr)
         |)
         |SELECT event_type, word, count(*) AS n_occurrences
         |FROM words WHERE word IS NOT NULL AND contiguous
         |GROUP BY 1, 2 HAVING count(*) >= 3
         |ORDER BY event_type, n_occurrences DESC, word""".stripMargin,
    "series_hw" -> seriesHwSql,
    "burstiness_fano" ->
      s"""WITH e AS ($ev),
         |m AS (
         |  SELECT event_type,
         |         epoch_ms(date_trunc('minute', ts)) // 60000 AS m,
         |         count(*) AS c
         |  FROM e GROUP BY 1, 2
         |),
         |a AS (
         |  SELECT event_type,
         |         CAST(max(m) - min(m) + 1 AS BIGINT) AS span_minutes,
         |         CAST(sum(c) AS BIGINT) AS n_events,
         |         CAST(sum(c * c) AS BIGINT) AS s2
         |  FROM m GROUP BY 1
         |)
         |SELECT event_type, span_minutes, n_events,
         |       round(CAST(span_minutes * s2 - n_events * n_events AS DOUBLE)
         |             / CAST(span_minutes * n_events AS DOUBLE), 6) AS fano,
         |       span_minutes * s2 - n_events * n_events
         |         > span_minutes * n_events AS bursty
         |FROM a ORDER BY event_type""".stripMargin,
    "drift_ks" ->
      s"""WITH e AS ($ev),
         |b AS (
         |  SELECT event_type, ts < TIMESTAMP '2024-01-16' AS fh,
         |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
         |  FROM e
         |),
         |c AS (
         |  SELECT event_type, cents,
         |         CAST(sum(CASE WHEN fh THEN 1 ELSE 0 END) AS BIGINT) AS c,
         |         CAST(sum(CASE WHEN fh THEN 0 ELSE 1 END) AS BIGINT) AS d
         |  FROM b GROUP BY 1, 2
         |),
         |t AS (
         |  SELECT event_type, CAST(sum(c) AS BIGINT) AS na,
         |         CAST(sum(d) AS BIGINT) AS nb
         |  FROM c GROUP BY 1
         |),
         |w AS (
         |  SELECT c.event_type, na, nb,
         |         CAST(sum(c) OVER cw AS BIGINT) AS cc,
         |         CAST(sum(d) OVER cw AS BIGINT) AS cd
         |  FROM c JOIN t USING (event_type)
         |  WINDOW cw AS (PARTITION BY c.event_type ORDER BY c.cents
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |),
         |a AS (
         |  SELECT event_type, max(na) AS n_first, max(nb) AS n_second,
         |         CAST(max(abs(cc * nb - cd * na)) AS BIGINT) AS ks_num
         |  FROM w GROUP BY 1
         |)
         |SELECT event_type, n_first, n_second, ks_num,
         |       round(CASE WHEN n_first = 0 OR n_second = 0 THEN NULL
         |             ELSE CAST(ks_num AS DOUBLE)
         |                  / (CAST(n_first AS DOUBLE) * CAST(n_second AS DOUBLE))
         |             END, 6) AS ks_stat,
         |       CASE WHEN n_first = 0 OR n_second = 0 THEN NULL
         |       ELSE CAST(ks_num AS DOUBLE)
         |            / (CAST(n_first AS DOUBLE) * CAST(n_second AS DOUBLE))
         |            > CAST(1.358 AS DOUBLE)
         |              * sqrt((CAST(n_first AS DOUBLE) + CAST(n_second AS DOUBLE))
         |                     / (CAST(n_first AS DOUBLE) * CAST(n_second AS DOUBLE)))
         |       END AS drifted
         |FROM a ORDER BY event_type""".stripMargin,
    "mutual_info" ->
      s"""WITH e AS ($ev),
         |cont AS (
         |  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
         |         count(*) AS cth
         |  FROM e GROUP BY 1, 2
         |),
         |ct AS (SELECT event_type, CAST(sum(cth) AS BIGINT) AS ct
         |       FROM cont GROUP BY 1),
         |ch AS (SELECT hod, CAST(sum(cth) AS BIGINT) AS chd
         |       FROM cont GROUP BY 1),
         |g AS (
         |  SELECT CAST(sum(cth) AS BIGINT) AS n_events,
         |         count(*) AS n_cells,
         |         list([CAST(cth AS DOUBLE), CAST(ct AS DOUBLE),
         |               CAST(chd AS DOUBLE)]
         |              ORDER BY cont.event_type, cont.hod) AS cells
         |  FROM cont JOIN ct USING (event_type) JOIN ch USING (hod)
         |)
         |SELECT n_events, n_cells,
         |       round(list_reduce(
         |         list_prepend([CAST(0 AS DOUBLE), 0, 0], cells),
         |         (s, x) -> [s[1] + (x[1] / CAST(n_events AS DOUBLE))
         |                        * ln((x[1] * n_events) / (x[2] * x[3])),
         |                    CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)])[1]
         |         / $Ln2, 6) AS mi_bits
         |FROM g""".stripMargin,
    "cusum_changepoints" -> cusumSql,
    // streaming drain (graft.streaming.StreamDrain.streamCusumDrain):
    // same fold through an actual writeStream; the streamed CusumCounts
    // carry no baseline columns, so the oracle is the batch SQL minus them
    "stream_cusum_drain" ->
      s"""SELECT event_type, n_buckets, n_shifts_up, n_shifts_down
         |FROM ($cusumSql) t ORDER BY event_type""".stripMargin,
    "series_ewma" -> ewmaSql,
    // streaming drain shares the batch oracle verbatim (final levels
    // are bit-identical by the micro-unit bucket-sum construction)
    "stream_ewma_drain" -> ewmaSql,
    // the in-batch-shuffled replay must produce the SAME levels — the
    // processor's within-trigger (event-time, event_id) sort restores
    // the fold order the oracle computes over
    "stream_shuffled_ewma_drain" -> ewmaSql,
    "seasonal_anomaly" ->
      s"""WITH h AS (
         |  SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS n_ev,
         |         sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS sm
         |  FROM $ev e GROUP BY 1, 2
         |),
         |h2 AS (
         |  SELECT *, sm // (n_ev * 10000) AS hm_c,
         |         CAST(hour(hr) AS BIGINT) AS hod
         |  FROM h
         |),
         |s AS (
         |  SELECT event_type, hod, count(*) AS n_obs,
         |         sum(hm_c) AS t1, sum(hm_c * hm_c) AS t2
         |  FROM h2 GROUP BY 1, 2
         |),
         |s1 AS (SELECT *, CAST(t1 AS DOUBLE) / n_obs AS mu_s FROM s),
         |s2 AS (
         |  SELECT *, sqrt(greatest(CAST(t2 AS DOUBLE) / n_obs - mu_s * mu_s,
         |                          CAST(0 AS DOUBLE))) AS sigma_s
         |  FROM s1
         |),
         |z AS (
         |  SELECT h2.event_type,
         |         CASE WHEN s2.n_obs < 3 OR s2.sigma_s = 0 THEN NULL
         |              ELSE (CAST(h2.hm_c AS DOUBLE) - s2.mu_s) / s2.sigma_s
         |         END AS z
         |  FROM h2
         |  JOIN s2 ON h2.event_type = s2.event_type AND h2.hod = s2.hod
         |)
         |SELECT event_type, count(*) AS n_hours,
         |       count(CASE WHEN abs(z) > 3.0 THEN 1 END) AS n_anomalous_hours,
         |       round(max(abs(z)), 4) AS max_abs_z
         |FROM z GROUP BY 1 ORDER BY 1""".stripMargin,
    "hourly_entropy" ->
      s"""WITH c AS (
         |  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod, count(*) AS c
         |  FROM $ev e GROUP BY 1, 2
         |),
         |g AS (
         |  SELECT event_type, CAST(sum(c) AS BIGINT) AS n_events,
         |         list(CAST(c AS DOUBLE) ORDER BY hod) AS hs
         |  FROM c GROUP BY 1
         |),
         |f AS (
         |  SELECT event_type, n_events,
         |         list_reduce(list_prepend(CAST(0 AS DOUBLE), hs),
         |           (s, x) -> s - (x / CAST(n_events AS DOUBLE))
         |                         * ln(x / CAST(n_events AS DOUBLE))) AS ent
         |  FROM g
         |)
         |SELECT event_type, n_events,
         |       round(ent / $Ln2, 6) AS entropy_bits,
         |       round(ent / $Ln24, 6) AS norm_entropy
         |FROM f ORDER BY event_type""".stripMargin,
    "mad_over_frame" ->
      s"""WITH e AS ($ev),
         |buf AS (
         |  SELECT event_id, user_id, ts, value,
         |         list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                           ROWS BETWEEN 24 PRECEDING AND CURRENT ROW) AS buf
         |  FROM e
         |),
         |m AS (
         |  SELECT *, CAST(len(buf) AS BIGINT) AS n_samples,
         |         (list_sort(buf)[CAST((len(buf) + 1) // 2 AS INT)]
         |          + list_sort(buf)[CAST(len(buf) // 2 AS INT) + 1]) / 2.0 AS med
         |  FROM buf
         |)
         |SELECT event_id, user_id, ts, value, n_samples,
         |       round(med, 4) AS median_value,
         |       round((list_sort(list_transform(buf, x -> abs(x - med)))[CAST((len(buf) + 1) // 2 AS INT)]
         |              + list_sort(list_transform(buf, x -> abs(x - med)))[CAST(len(buf) // 2 AS INT) + 1]) / 2.0,
         |             4) AS mad_value
         |FROM m ORDER BY user_id, ts, event_id""".stripMargin,
    "series_gapfill" ->
      s"""WITH e AS ($ev),
         |c AS (
         |  SELECT event_type, date_trunc('minute', ts) AS bucket, count(*) AS n_events
         |  FROM e GROUP BY 1, 2
         |),
         |b AS (SELECT date_trunc('minute', min(ts)) AS lo, date_trunc('minute', max(ts)) AS hi FROM e),
         |m AS (SELECT g.bucket FROM b, UNNEST(generate_series(b.lo, b.hi, INTERVAL 1 MINUTE)) g(bucket)),
         |t AS (SELECT DISTINCT event_type FROM e),
         |grid AS (SELECT t.event_type, m.bucket FROM t, m)
         |SELECT grid.event_type, grid.bucket,
         |       coalesce(c.n_events, 0) AS n_events,
         |       c.n_events IS NULL AS is_gap
         |FROM grid LEFT JOIN c ON grid.event_type = c.event_type AND grid.bucket = c.bucket
         |ORDER BY 1, 2""".stripMargin,
    "watermark_audit" ->
      s"""WITH e AS ($ev),
         |s AS (
         |  SELECT event_type, event_id, epoch_us(ts) AS us,
         |         max(epoch_us(ts)) OVER (PARTITION BY event_type
         |           ORDER BY event_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |           AS max_seen
         |  FROM e
         |),
         |g AS (
         |  SELECT event_type,
         |         CASE WHEN max_seen IS NOT NULL AND us < max_seen
         |              THEN max_seen - us ELSE 0 END AS disorder_us
         |  FROM s
         |),
         |a AS (
         |  SELECT event_type, count(*) AS n_events,
         |         CAST(sum(CASE WHEN disorder_us > 0 THEN 1 ELSE 0 END)
         |              AS BIGINT) AS n_late,
         |         CAST(max(disorder_us) AS BIGINT) AS max_disorder_us,
         |         CAST(sum(CASE WHEN disorder_us > 10000000 THEN 1 ELSE 0 END)
         |              AS BIGINT) AS n_beyond_10s
         |  FROM g GROUP BY 1
         |)
         |SELECT event_type, n_events, n_late,
         |       round(100.0 * CAST(n_late AS DOUBLE) /
         |             CAST(n_events AS DOUBLE), 6) AS late_pct,
         |       CAST(max_disorder_us // 1000000 AS BIGINT) AS max_disorder_secs,
         |       n_beyond_10s
         |FROM a ORDER BY event_type""".stripMargin,
    "series_ohlc" ->
      s"""WITH e AS ($ev),
         |s AS (
         |  SELECT event_type, date_trunc('hour', ts) AS bucket,
         |         epoch_us(ts) AS us, event_id, value
         |  FROM e
         |)
         |SELECT event_type, bucket, count(*) AS n_events,
         |       first(value ORDER BY us, event_id) AS open,
         |       max(value) AS high, min(value) AS low,
         |       last(value ORDER BY us, event_id) AS close
         |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "counter_delta" ->
      s"""WITH e AS ($ev),
         |s AS (
         |  SELECT event_type,
         |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         |         lag(CAST(floor(value * 100 + 0.5) AS BIGINT))
         |           OVER (PARTITION BY event_type ORDER BY ts, event_id)
         |           AS prev
         |  FROM e
         |)
         |SELECT event_type, count(*) AS n_samples,
         |       CAST(sum(CASE WHEN prev IS NOT NULL AND cents > prev
         |                     THEN cents - prev ELSE 0 END) AS BIGINT)
         |         AS delta_cents,
         |       CAST(sum(CASE WHEN prev IS NOT NULL AND cents < prev
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_resets,
         |       min(cents) AS min_cents, max(cents) AS max_cents
         |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "series_twa" ->
      s"""WITH e AS ($ev),
         |s AS (
         |  SELECT event_type, epoch_us(ts) AS us,
         |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         |         lead(epoch_us(ts)) OVER (PARTITION BY event_type
         |           ORDER BY ts, event_id) AS next_us
         |  FROM e
         |),
         |a AS (
         |  SELECT event_type, count(*) AS n_events,
         |         CAST(sum(CASE WHEN next_us IS NOT NULL
         |                       THEN cents * (next_us - us) ELSE 0 END)
         |              AS BIGINT) AS wsum,
         |         min(us) AS us0, max(us) AS us1
         |  FROM s GROUP BY 1
         |)
         |SELECT event_type, n_events,
         |       CAST((us1 - us0) // 1000000 AS BIGINT) AS duration_secs,
         |       round(CASE WHEN us1 = us0 THEN NULL
         |             ELSE CAST(wsum AS DOUBLE) / CAST(us1 - us0 AS DOUBLE)
         |                  / 100.0 END, 6) AS twa_value
         |FROM a ORDER BY event_type""".stripMargin,
    "uptime_report" ->
      s"""WITH e AS ($ev),
         |s AS (
         |  SELECT event_type, epoch_us(ts) AS us,
         |         lag(epoch_us(ts)) OVER (PARTITION BY event_type
         |           ORDER BY ts, event_id) AS prev_us
         |  FROM e
         |),
         |g AS (
         |  SELECT event_type, us,
         |         CASE WHEN prev_us IS NOT NULL
         |                   AND us - prev_us > ${UptimeGapSecs * 1000000L}
         |              THEN us - prev_us ELSE 0 END AS gap_us
         |  FROM s
         |),
         |a AS (
         |  SELECT event_type, count(*) AS n_events,
         |         CAST(sum(CASE WHEN gap_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_outages,
         |         CAST(sum(gap_us) AS BIGINT) AS down_us,
         |         CAST(max(gap_us) AS BIGINT) AS longest_us,
         |         min(us) AS us0, max(us) AS us1
         |  FROM g GROUP BY 1
         |)
         |SELECT event_type, n_events, n_outages,
         |       CAST(down_us // 1000000 AS BIGINT) AS downtime_secs,
         |       CAST(longest_us // 1000000 AS BIGINT) AS longest_outage_secs,
         |       round(CASE WHEN us1 = us0 THEN NULL
         |             ELSE 100.0 * CAST(us1 - us0 - down_us AS DOUBLE)
         |                  / CAST(us1 - us0 AS DOUBLE) END, 6) AS uptime_pct,
         |       down_us * 1000 <= us1 - us0 AS three_nines
         |FROM a ORDER BY event_type""".stripMargin,
    "autocorr_lags" -> {
      def lagRow(k: Int): String =
        s"""SELECT event_type, CAST($k AS BIGINT) AS lag_k, m$k AS n_pairs,
           |       round(CASE WHEN den = 0 THEN NULL ELSE
           |         (CAST(c$k AS DOUBLE) - mean * CAST(sa$k AS DOUBLE)
           |          - mean * CAST(sb$k AS DOUBLE)
           |          + CAST(m$k AS DOUBLE) * mean * mean) / den END, 6)
           |         AS autocorr
           |FROM m""".stripMargin
      s"""WITH e AS ($ev),
         |h AS (
         |  SELECT event_type, date_trunc('hour', ts) AS hr,
         |         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
         |  FROM e GROUP BY 1, 2
         |),
         |l AS (
         |  SELECT event_type, x,
         |         lag(x, 1) OVER w AS x1, lag(x, 2) OVER w AS x2,
         |         lag(x, 3) OVER w AS x3
         |  FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hr)
         |),
         |t AS (
         |  SELECT event_type, count(*) AS n, CAST(sum(x) AS BIGINT) AS s,
         |         CAST(sum(x * x) AS BIGINT) AS ss,
         |         count(x1) AS m1, CAST(sum(x * x1) AS BIGINT) AS c1,
         |         CAST(sum(CASE WHEN x1 IS NOT NULL THEN x END) AS BIGINT) AS sa1,
         |         CAST(sum(x1) AS BIGINT) AS sb1,
         |         count(x2) AS m2, CAST(sum(x * x2) AS BIGINT) AS c2,
         |         CAST(sum(CASE WHEN x2 IS NOT NULL THEN x END) AS BIGINT) AS sa2,
         |         CAST(sum(x2) AS BIGINT) AS sb2,
         |         count(x3) AS m3, CAST(sum(x * x3) AS BIGINT) AS c3,
         |         CAST(sum(CASE WHEN x3 IS NOT NULL THEN x END) AS BIGINT) AS sa3,
         |         CAST(sum(x3) AS BIGINT) AS sb3
         |  FROM l GROUP BY 1
         |),
         |m AS (
         |  SELECT *, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
         |         CAST(ss AS DOUBLE)
         |           - CAST(n AS DOUBLE) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
         |                               * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS den
         |  FROM t
         |)
         |${lagRow(1)} UNION ALL ${lagRow(2)} UNION ALL ${lagRow(3)}
         |ORDER BY event_type, lag_k""".stripMargin
    },
    "series_avg" ->
      s"""SELECT event_type, date_trunc('minute', ts) AS bucket, round(avg(value), 6) AS avg_value
         |FROM $ev e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "series_holt" ->
      s"""WITH b AS (
         |  SELECT event_type, date_trunc('minute', ts) AS bucket,
         |         round(avg(value), 6) AS av
         |  FROM $ev e GROUP BY 1, 2
         |),
         |s AS (
         |  SELECT event_type, count(*) AS n_buckets,
         |         list(av ORDER BY bucket) AS vals
         |  FROM b GROUP BY event_type
         |),
         |f AS (
         |  -- state rides a 2-element LIST [l, b], not a struct: DuckDB's
         |  -- list_reduce aliases the accumulator slot, so a struct-state
         |  -- lambda would see the freshly-written l while computing b
         |  SELECT event_type, n_buckets,
         |         CASE WHEN len(vals) >= 2 THEN list_reduce(
         |           list_prepend([vals[2], vals[2] - vals[1]],
         |             list_transform(vals[3:], x -> [x, 0.0])),
         |           (acc, x) ->
         |             [$HoltAlpha * x[1] + $HoltAlphaC * (acc[1] + acc[2]),
         |              $HoltBeta * (($HoltAlpha * x[1]
         |                + $HoltAlphaC * (acc[1] + acc[2])) - acc[1])
         |                + $HoltBetaC * acc[2]])
         |         END AS st
         |  FROM s
         |)
         |SELECT event_type, n_buckets,
         |       round(st[1], 6) AS level,
         |       round(st[2], 6) AS trend,
         |       round(st[1] + 3.0 * st[2], 6) AS forecast_3
         |FROM f ORDER BY event_type""".stripMargin,
    "series_sum" ->
      s"""SELECT event_type, date_trunc('minute', ts) AS bucket, round(sum(value), 4) AS sum_value
         |FROM $ev e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "series_count" ->
      s"""SELECT event_type, date_trunc('minute', ts) AS bucket, count(*) AS n_events
         |FROM $ev e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "series_p95" ->
      s"""SELECT event_type, date_trunc('hour', ts) AS bucket, round(quantile_cont(value, 0.95), 6) AS p95_value
         |FROM $ev e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "drift_tv" -> driftTvSql,
    // MapState drain (graft.streaming.StreamDrain.streamDriftDrain):
    // the processor's final per-type emission equals the batch row
    // exactly, so the oracle is shared verbatim
    "stream_drift_drain" -> driftTvSql,
    "trend_ols" -> {
      val cov =
        "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
      val varx =
        "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
      val vary =
        "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
      s"""WITH e AS ($ev),
         |b AS (
         |  SELECT event_type, epoch_us(ts) AS us,
         |         CAST(floor(value * 1000 + 0.5) AS BIGINT) AS y
         |  FROM e
         |),
         |t0 AS (SELECT event_type, min(us) AS us0 FROM b GROUP BY 1),
         |x AS (
         |  SELECT b.event_type, (us - us0) // 1000000 AS x, y
         |  FROM b JOIN t0 USING (event_type)
         |),
         |s AS (
         |  SELECT event_type, count(*) AS n,
         |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |         CAST(sum(x * y) AS BIGINT) AS sxy,
         |         CAST(sum(x * x) AS BIGINT) AS sxx,
         |         CAST(sum(y * y) AS BIGINT) AS syy
         |  FROM x GROUP BY 1
         |)
         |SELECT event_type, n,
         |       round($cov / $varx, 6) AS slope_millis_per_sec,
         |       round((CAST(sy AS DOUBLE) - ($cov / $varx) * CAST(sx AS DOUBLE))
         |               / CAST(n AS DOUBLE), 6) AS intercept_millis,
         |       round(($cov * $cov) / ($varx * $vary), 6) AS r2
         |FROM s ORDER BY event_type""".stripMargin
    },
    "robust_stats" ->
      s"""WITH g AS (
         |  SELECT event_type, list_sort(list(value)) AS lst,
         |         CAST(count(*) AS BIGINT) AS n
         |  FROM $ev e GROUP BY 1
         |),
         |c AS (
         |  SELECT event_type, n, lst,
         |         lst[CAST(floor(CAST(n AS DOUBLE) * 0.05) AS INT) + 1] AS p05,
         |         lst[CAST(floor(CAST(n AS DOUBLE) * 0.95) AS INT) + 1] AS p95
         |  FROM g
         |),
         |t AS (
         |  SELECT *, list_filter(lst, x -> x >= p05 AND x <= p95) AS trim
         |  FROM c
         |)
         |SELECT event_type, n, p05, p95,
         |       round(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |                list_transform(lst, x -> CAST(floor(
         |                  least(greatest(x, p05), p95) * 1000000 + 0.5)
         |                  AS BIGINT))), (a, b) -> a + b) AS DOUBLE)
         |             / 1000000.0 / CAST(n AS DOUBLE), 6) AS winsor_mean,
         |       CAST(len(trim) AS BIGINT) AS n_trim,
         |       round(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |                list_transform(trim, x -> CAST(floor(
         |                  x * 1000000 + 0.5) AS BIGINT))), (a, b) -> a + b)
         |               AS DOUBLE)
         |             / 1000000.0 / CAST(len(trim) AS DOUBLE), 6) AS trim_mean
         |FROM t ORDER BY event_type""".stripMargin,
    "series_filtered" ->
      s"""SELECT event_type, date_trunc('minute', ts) AS bucket, round(avg(value), 6) AS avg_value, count(*) AS n_events
         |FROM $ev e
         |WHERE ts BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-10 00:00:00'
         |  AND event_type IN ('click', 'purchase')
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
