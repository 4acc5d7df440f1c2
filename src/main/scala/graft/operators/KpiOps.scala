package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Rounding.round

/** The reference aggregation job's windowed KPIs (SURVEY §2.4 A1/A2,
  * §2.5 W1): per (source, window) count / sum / avg / error_count /
  * error_rate and *exact nearest-rank-floor* percentiles —
  * `sorted.get((int)(size*q))`, index-based, NOT interpolated
  * (reference `EventAggregationJob.java:197-266`, percentile at
  * `:247-253`). Window bounds are emitted correctly (the reference's
  * always-zero windowStart/windowEnd is a known bug we fix, SURVEY §2.12).
  *
  * Scale notes: `groupBy(source, window(...))` is one shuffle keyed by
  * (source, window); Spark performs partial aggregation map-side for the
  * algebraic aggregates. The exact percentile needs the full value list
  * per group (`collect_list`) — correct-by-definition but memory-bound by
  * the largest (source, window) group, which is bounded here by window
  * length × per-source rate, not by table size, so it scales with the
  * stream rate, not the dataset. For unbounded groups switch to
  * `percentile_approx` (documented deviation, SURVEY §7 phase 2).
  */
object KpiOps {

  /** Exact nearest-rank-floor percentile over a sorted collected list:
    * element_at is 1-based, the reference's (int)(size*q) is 0-based.
    */
  private def exactPercentile(sorted: Column, n: Column, q: Double): Column =
    element_at(sorted, (floor(n * lit(q))).cast("int") + 1)

  /** Tumbling KPI windows per event_type. `windowParam` is the read
    * API's window string (`1m|5m|15m|1h|1d`), validated and mapped to a
    * window length by [[graft.functions.WindowParam]] (F5).
    */
  def kpiTumbling(spark: SparkSession, dir: String,
                  windowParam: String = "1m"): DataFrame = {
    val dur = graft.functions.WindowParam.duration(windowParam)
    val ev = Tables.eventsWithStatus(spark, dir)
    ev.groupBy(col("event_type"), window(col("ts"), dur).as("w"))
      // exact micro-unit window sums, like kpiSliding: integer addition
      // is order-free, so the gate no longer depends on the fixture's
      // values being centi-exact (the sliding/stream discipline)
      .agg(
        count(lit(1)).as("n_events"),
        sum(graft.functions.Rounding.microUnits(col("value")))
          .as("sum_micro"),
        count(when(col("status") === "error", 1)).as("error_count"),
        sort_array(collect_list(col("value"))).as("sorted_values")
      )
      .withColumn("sum_value",
                  round(col("sum_micro").cast("double") / lit(1000000.0), 4))
      .withColumn("avg_value",
                  round(col("sum_micro").cast("double") /
                    (col("n_events") * lit(1000000L)).cast("double"), 6))
      .withColumn("error_rate", round(col("error_count") / col("n_events"), 6))
      .withColumn("p95_value",
                  exactPercentile(col("sorted_values"), col("n_events"), 0.95))
      .withColumn("p99_value",
                  exactPercentile(col("sorted_values"), col("n_events"), 0.99))
      .select(
        col("event_type"),
        col("w.start").as("window_start"),
        col("w.end").as("window_end"),
        col("n_events"),
        col("sum_value"),
        col("avg_value"),
        col("error_count"),
        col("error_rate"),
        col("p95_value"),
        col("p99_value")
      )
      .orderBy(col("event_type"), col("window_start"))
  }

  /** Sliding 1-minute windows every 10 s — the reference's
    * `SlidingEventTimeWindows.of(1 min, 10 s)` keyed by source
    * (`EventAggregationJob.java:79-82`). Spark's `window(ts, "1 minute",
    * "10 seconds")` expands each event into its 6 covering panes before
    * the aggregate — same dataflow Flink's pane assignment performs.
    */
  def kpiSliding(spark: SparkSession, dir: String): DataFrame = {
    // r13 (§2.3 "aggregate before you shuffle"): computed by PANE
    // COMPOSITION — 10 s tumbling panes first (no row expansion on the
    // event stream), then each 1-minute window composed from its 6
    // covering panes. Every aggregate here is pane-additive
    // (count / exact micro-unit sum / error count; avg derives from the
    // composed sum), and long addition is associative at both levels,
    // so the result is bit-identical to the direct 6×-expansion form —
    // the unchanged DuckDB oracle gates that. At 100 TB the win is the
    // pre-aggregation input: the old form expanded every event 6× before
    // the partial agg; this form aggregates raw events once and expands
    // only the pane table (events-per-pane× smaller). Same dataflow as
    // [[kpiSlidingPaned]] (Li et al., "No Pane, No Gain"), kept there as
    // the didactic named query; the window set is identical because a
    // window has an event iff it has a non-empty covering pane.
    val panes = Tables
      .eventsWithStatus(spark, dir)
      .groupBy(col("event_type"), window(col("ts"), "10 seconds").as("p"))
      .agg(count(lit(1)).as("pane_n"),
           sum(graft.functions.Rounding.microUnits(col("value")))
             .as("pane_micro"),
           count(when(col("status") === "error", 1)).as("pane_err"))
    panes
      .select(col("event_type"), col("p.start").as("pane_start"),
              col("pane_n"), col("pane_micro"), col("pane_err"),
              explode(sequence(lit(0), lit(5))).as("k"))
      .withColumn("window_start",
                  col("pane_start") - col("k") * expr("INTERVAL 10 SECONDS"))
      .groupBy(col("event_type"), col("window_start"))
      .agg(sum(col("pane_n")).as("n_events"),
           sum(col("pane_micro")).as("sum_micro"),
           sum(col("pane_err")).as("error_count"))
      // exact micro-unit window sums (order-free), ONE double division,
      // shared round — bit-identical across Spark partition order,
      // DuckDB's ordered sum, AND the streaming state-store merge order
      // (stream_kpi_drain hash-gates all three against one oracle)
      .withColumn("window_end", col("window_start") + expr("INTERVAL 1 MINUTE"))
      .withColumn("sum_value",
                  round(col("sum_micro").cast("double") / lit(1000000.0), 4))
      .withColumn("avg_value",
                  round(col("sum_micro").cast("double") /
                    (col("n_events") * lit(1000000L)).cast("double"), 6))
      .withColumn("error_rate", round(col("error_count") / col("n_events"), 6))
      .select(
        col("event_type"),
        col("window_start"),
        col("window_end"),
        col("n_events"),
        col("sum_value"),
        col("avg_value"),
        col("error_count"),
        col("error_rate")
      )
      .orderBy(col("event_type"), col("window_start"))
  }

  /** Pane-composed sliding KPIs — the classic pane optimization (Li et
    * al., "No Pane, No Gain", SIGMOD Record '05): aggregate 10-second
    * tumbling PANES first (one shuffle over raw events, no expansion),
    * then compose each 1-minute window from its 6 covering panes (the
    * 6× row expansion happens on the tiny pane table, not the event
    * stream). At 100 TB this cuts the expanded pre-aggregation input by
    * the events-per-pane factor; the trade is that only pane-additive
    * aggregates compose (count/sum/error_count — not exact percentiles,
    * which is why [[kpiSliding]] keeps the direct form). The oracle
    * replicates the two-level summation exactly.
    */
  def kpiSlidingPaned(spark: SparkSession, dir: String): DataFrame = {
    val panes = Tables
      .eventsWithStatus(spark, dir)
      .groupBy(col("event_type"), window(col("ts"), "10 seconds").as("p"))
      // exact micro-unit pane partials — the two-level summation is
      // then pure long addition, associative at BOTH levels, so pane
      // composition order can never drift the window sum
      .agg(count(lit(1)).as("pane_n"),
           sum(graft.functions.Rounding.microUnits(col("value")))
             .as("pane_micro"),
           count(when(col("status") === "error", 1)).as("pane_err"))
    panes
      .select(col("event_type"), col("p.start").as("pane_start"),
              col("pane_n"), col("pane_micro"), col("pane_err"),
              explode(sequence(lit(0), lit(5))).as("k"))
      .withColumn("window_start",
                  col("pane_start") - col("k") * expr("INTERVAL 10 SECONDS"))
      .groupBy(col("event_type"), col("window_start"))
      .agg(sum(col("pane_n")).as("n_events"),
           round(sum(col("pane_micro")).cast("double") / lit(1000000.0), 4)
             .as("sum_value"),
           sum(col("pane_err")).as("error_count"))
      .withColumn("window_end", col("window_start") + expr("INTERVAL 1 MINUTE"))
      .withColumn("error_rate", round(col("error_count") / col("n_events"), 6))
      .select(col("event_type"), col("window_start"), col("window_end"),
              col("n_events"), col("sum_value"), col("error_count"),
              col("error_rate"))
      .orderBy(col("event_type"), col("window_start"))
  }

  /** `GET /kpi?source=…&window=1m` — newest-first, limit 100
    * (read-api/main.py:228-291, SURVEY §2.6 O1). Spark plans
    * orderBy+limit as TakeOrderedAndProject (distributed top-k — no full
    * sort at scale).
    */
  def kpiLookup(spark: SparkSession, dir: String,
                windowParam: String = "1m"): DataFrame =
    kpiTumbling(spark, dir, windowParam)
      .filter(col("event_type") === "click")
      .orderBy(col("window_start").desc)
      .limit(100)

  /** The same lookup at `?window=5m` — exercises the F5 window-param
    * path end-to-end (every non-default window length shares it).
    */
  def kpiLookup5m(spark: SparkSession, dir: String): DataFrame =
    kpiLookup(spark, dir, "5m")

  /** Whole-period per-source p95 through the reusable UDAF form
    * ([[graft.functions.ExactPercentile]], §2.10) — same nearest-rank
    * semantics as the inlined expression variant, demonstrated as a
    * single mergeable column function.
    */
  def kpiUdafP95(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           graft.functions.ExactPercentile.p95(col("value")).as("p95_value"))
      .orderBy(col("event_type"))

  /** Multiwindow SLO burn-rate alert (Google SRE Workbook ch.5): against
    * a 99% availability SLO (error budget 1%), the burn rate is
    * `error_rate / budget = 100·err/n`, measured over a LONG (6 h) and a
    * SHORT (1 h) window both anchored at the data max — page only when
    * BOTH exceed 6× (the long window proves sustained burn, the short
    * window proves it is STILL burning, so a recovered blip never
    * pages). Both burn comparisons are the exact integers
    * `50·err > 3·n`; the reported rates are the same longs→double
    * division on both engines; an empty window nulls its burn and the
    * verdict, mirroring DuckDB's x/0.
    *
    * Scale: ONE conditional-sum scan computes all four counters (never
    * one scan per window), after the same broadcast max-ts anchor as
    * `events_last_hour`.
    */
  def sloBurnRate(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsWithStatus(spark, dir)
    val mx = ev.groupBy().agg(max(col("ts")).as("max_ts"))
    val d = (c: Column) => c.cast("double")
    val isErr = (col("status") === "error").cast("long")
    ev.crossJoin(broadcast(mx))
      .filter(col("ts") >= col("max_ts") - expr("INTERVAL 6 HOURS"))
      .withColumn("in_short",
                  (col("ts") >= col("max_ts") - expr("INTERVAL 1 HOUR"))
                    .cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_long"),
           sum(isErr).as("err_long"),
           sum(col("in_short")).as("n_short"),
           sum(isErr * col("in_short")).as("err_short"))
      .select(
        col("event_type"), col("n_long"), col("err_long"), col("n_short"),
        col("err_short"),
        round(lit(100.0) * d(col("err_long")) / d(col("n_long")), 6)
          .as("burn_long"),
        round(when(col("n_short") === 0, lit(null))
                .otherwise(lit(100.0) * d(col("err_short")) /
                  d(col("n_short"))), 6).as("burn_short"),
        when(col("n_short") === 0, lit(null))
          .otherwise(col("err_long") * 50 > col("n_long") * 3 &&
            col("err_short") * 50 > col("n_short") * 3).as("page"))
      .orderBy(col("event_type"))
  }

  // ---- DuckDB oracles ----------------------------------------------------

  private val ev =
    s"(SELECT e.*, ${Tables.statusSql} AS status FROM (${Tables.eventsSql}) e)"

  /** Tumbling 1-min windows are epoch-aligned, so window_start ≡
    * date_trunc('minute', ts).
    */
  // the 1-minute surface is the general form at 60 s (epoch-floor at 60
  // ≡ date_trunc('minute') for post-epoch data) — one definition, so the
  // aggregate expressions cannot drift between kpi_tumbling and the
  // parameterized lookups
  private lazy val tumblingSql = tumblingSqlAt(60)

  /** Tumbling windows of arbitrary length are epoch-aligned like Spark's
    * `window()`: start = floor(epoch/len)*len.
    */
  private def tumblingSqlAt(lenSecs: Long): String =
    s"""SELECT event_type,
       |       TIMESTAMP '1970-01-01 00:00:00'
       |         + CAST(floor(epoch(ts) / $lenSecs) AS BIGINT) * $lenSecs * INTERVAL 1 SECOND AS window_start,
       |       TIMESTAMP '1970-01-01 00:00:00'
       |         + (CAST(floor(epoch(ts) / $lenSecs) AS BIGINT) * $lenSecs + $lenSecs) * INTERVAL 1 SECOND AS window_end,
       |       count(*) AS n_events,
       |       round(CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
       |             / 1000000.0, 4) AS sum_value,
       |       round(CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
       |             / (count(*) * 1000000.0), 6) AS avg_value,
       |       count(*) FILTER (WHERE status = 'error') AS error_count,
       |       round(CAST(count(*) FILTER (WHERE status = 'error') AS DOUBLE) / count(*), 6) AS error_rate,
       |       list_sort(list(value))[CAST(floor(count(*) * 0.95) AS INT) + 1] AS p95_value,
       |       list_sort(list(value))[CAST(floor(count(*) * 0.99) AS INT) + 1] AS p99_value
       |FROM $ev ee
       |GROUP BY 1, 2, 3""".stripMargin

  val oracles: Map[String, String] = Map(
    "slo_burn_rate" ->
      s"""WITH mx AS (SELECT max(ts) AS max_ts FROM $ev e0),
         |w AS (
         |  SELECT e.event_type,
         |         CASE WHEN e.status = 'error' THEN 1 ELSE 0 END AS is_err,
         |         CASE WHEN e.ts >= mx.max_ts - INTERVAL 1 HOUR
         |              THEN 1 ELSE 0 END AS in_short
         |  FROM $ev e, mx
         |  WHERE e.ts >= mx.max_ts - INTERVAL 6 HOUR
         |),
         |a AS (
         |  SELECT event_type, count(*) AS n_long,
         |         CAST(sum(is_err) AS BIGINT) AS err_long,
         |         CAST(sum(in_short) AS BIGINT) AS n_short,
         |         CAST(sum(is_err * in_short) AS BIGINT) AS err_short
         |  FROM w GROUP BY 1
         |)
         |SELECT event_type, n_long, err_long, n_short, err_short,
         |       round(CAST(100 AS DOUBLE) * CAST(err_long AS DOUBLE)
         |             / CAST(n_long AS DOUBLE), 6) AS burn_long,
         |       round(CASE WHEN n_short = 0 THEN NULL
         |             ELSE CAST(100 AS DOUBLE) * CAST(err_short AS DOUBLE)
         |                  / CAST(n_short AS DOUBLE) END, 6) AS burn_short,
         |       CASE WHEN n_short = 0 THEN NULL
         |       ELSE err_long * 50 > n_long * 3
         |            AND err_short * 50 > n_short * 3 END AS page
         |FROM a ORDER BY event_type""".stripMargin,
    "kpi_tumbling" -> s"SELECT * FROM ($tumblingSql) t ORDER BY event_type, window_start",
    "kpi_lookup_5m" ->
      s"""SELECT * FROM (${tumblingSqlAt(graft.functions.WindowParam.seconds("5m"))}) t
         |WHERE event_type = 'click'
         |ORDER BY window_start DESC LIMIT 100""".stripMargin,
    "kpi_udaf_p95" ->
      s"""SELECT event_type, count(*) AS n_events,
         |       list_sort(list(value))[CAST(floor(count(*) * 0.95) AS INT) + 1] AS p95_value
         |FROM (${Tables.eventsSql}) e GROUP BY 1 ORDER BY 1""".stripMargin,
    "kpi_lookup" ->
      s"""SELECT * FROM ($tumblingSql) t WHERE event_type = 'click'
         |ORDER BY window_start DESC LIMIT 100""".stripMargin,
    // Pane composition: 10s pane partials, then each window sums its 6
    // covering panes — same two-level summation as the engine.
    "kpi_sliding_paned" ->
      s"""WITH p AS (
         |  SELECT event_type,
         |         TIMESTAMP '1970-01-01 00:00:00'
         |           + CAST(floor(epoch(ts) / 10) AS BIGINT) * 10 * INTERVAL 1 SECOND AS pane_start,
         |         count(*) AS pane_n,
         |         sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS pane_micro,
         |         count(*) FILTER (WHERE status = 'error') AS pane_err
         |  FROM $ev ee GROUP BY 1, 2
         |),
         |x AS (
         |  SELECT event_type, pane_start - k * 10 * INTERVAL 1 SECOND AS window_start,
         |         pane_n, pane_micro, pane_err
         |  FROM p, UNNEST([0, 1, 2, 3, 4, 5]) t(k)
         |)
         |SELECT event_type, window_start,
         |       window_start + INTERVAL 1 MINUTE AS window_end,
         |       CAST(sum(pane_n) AS BIGINT) AS n_events,
         |       round(CAST(sum(pane_micro) AS DOUBLE) / 1000000.0, 4) AS sum_value,
         |       CAST(sum(pane_err) AS BIGINT) AS error_count,
         |       round(CAST(sum(pane_err) AS DOUBLE) / sum(pane_n), 6) AS error_rate
         |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Sliding panes: each event belongs to the 6 10s-aligned windows
    // [start, start+60s) with start ∈ {floor(ts/10s)*10s - k*10s, k=0..5}.
    "kpi_sliding" -> slidingSql,
    // the streaming drain produces the SAME panes through an actual
    // writeStream execution (graft.streaming.StreamDrain), so it shares
    // the batch oracle verbatim
    "stream_kpi_drain" -> slidingSql,
    // kill-and-resume over the same topology: panes persisted with
    // partial sums at the stop must restore and finish exact, so the
    // oracle is again the batch sliding SQL
    "stream_restart_kpi_drain" -> slidingSql,
    // DIRTY restart (killed after a batch's sink write, before its
    // commit; the batch re-executes on resume): an append-style sink
    // would double the re-run batch's panes, so the unchanged batch
    // oracle IS the double-write detector
    "stream_dirty_restart_drain" -> slidingSql,
    // late-data drop (T2): the drain feeds planted provably-late rows
    // the oracle never sees — the gate passes only if the watermark
    // drops them (a leak mints pre-corpus panes or corrupts sums)
    "stream_late_drop_drain" -> slidingSql,
    // out-of-order WITHIN the watermark (T1's admissible side): rows
    // shifted one micro-batch late, inside the 10 s tolerance, must be
    // merged into the still-open panes — same from-scratch oracle
    "stream_ooo_kpi_drain" -> slidingSql
  )

  // exact micro-unit pane sums — matches the batch AND streamed Spark
  // sides bit-for-bit regardless of either engine's summation order
  private lazy val slidingSql: String =
    s"""WITH x AS (
       |  SELECT event_type, value, status,
       |         TIMESTAMP '1970-01-01 00:00:00'
       |           + (CAST(floor(epoch(ts) / 10) AS BIGINT) * 10 - k * 10) * INTERVAL 1 SECOND
       |           AS window_start
       |  FROM $ev ee, UNNEST([0, 1, 2, 3, 4, 5]) AS t(k)
       |)
       |SELECT event_type, window_start,
       |       window_start + INTERVAL 1 MINUTE AS window_end,
       |       count(*) AS n_events,
       |       round(CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
       |                    AS DOUBLE) / 1000000.0, 4) AS sum_value,
       |       round(CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
       |                    AS DOUBLE)
       |               / CAST(count(*) * 1000000 AS DOUBLE), 6) AS avg_value,
       |       count(*) FILTER (WHERE status = 'error') AS error_count,
       |       round(CAST(count(*) FILTER (WHERE status = 'error') AS DOUBLE) / count(*), 6) AS error_rate
       |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
}
