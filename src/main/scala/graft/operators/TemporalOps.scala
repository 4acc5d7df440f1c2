package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Rounding.round

/** Temporal operators the reference lacks but any event-analytics /
  * training-data platform at scale needs: sessionization, as-of join,
  * range (interval) join, and latest-per-key snapshot. Each is built the
  * shuffle-minimal way and has an exact DuckDB oracle.
  *
  * Scale notes are per-operator; the common theme is that none of these
  * use an inequality join as the execution strategy (which degenerates to
  * a broadcast-nested-loop or cartesian at cluster scale) — inequality
  * semantics are recovered from a single keyed sort (as-of, session) or a
  * bucketed equi-join (range join).
  */
object TemporalOps {

  /** Gap-based sessionization (30-min inactivity gap) of the event
    * stream per user, via the built-in `session_window` aggregate —
    * Spark's native session operator (works identically under Structured
    * Streaming with a watermark, where state-store merging handles
    * out-of-order arrival). One shuffle on user_id.
    *
    * Oracle cross-check: the classic lag/cumsum formulation — a new
    * session starts when the gap since the previous event is STRICTLY
    * greater than 30 min (`session_window` merges adjacent-inclusive: an
    * event exactly at the previous session's end still joins it);
    * `session_window`'s merge-overlapping-intervals semantics is exactly
    * that rule for in-order data, so the two formulations agreeing is a
    * real semantic assertion about the built-in, not a tautology.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      // exact micro-unit session sums (order-free long addition), ONE
      // double division at the end — bit-identical across Spark
      // partition order, DuckDB's ordered sum, and the streaming
      // session-state merge order (stream_session_drain hash-gates all
      // three against this query's oracle)
      .agg(count(lit(1)).as("n_events"),
           sum(graft.functions.Rounding.microUnits(col("value")))
             .as("sum_micro"))
      .select(col("user_id"), col("sw.start").as("session_start"),
              col("sw.end").as("session_end"), col("n_events"),
              round(col("sum_micro").cast("double") / lit(1000000.0), 4)
                .as("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** Peak session concurrency by SWEEP-LINE: each session becomes a
    * (+1 at start, −1 at end) boundary event; a running sum over the
    * time-ordered boundaries is the live-session count, and its max is
    * the capacity-planning number an ops team reads off this platform.
    * End boundaries sort before starts at equal timestamps (delta −1 <
    * +1), giving exclusive-end semantics — back-to-back sessions never
    * count as concurrent. The global running sum is fine at any scale:
    * boundaries are 2·|sessions| rows (≈ users), orders of magnitude
    * smaller than the event stream that produced them — same posture as
    * the quartile ranking.
    */
  def concurrentSessions(spark: SparkSession, dir: String): DataFrame = {
    // ONE pass over the session table: each session explodes into its
    // (+1, −1) boundary pair — a self-union would run the whole
    // sessionization aggregate (and its presentation sort) twice
    val b = sessionize(spark, dir)
      .select(col("user_id"),
              explode(array(
                struct(col("session_start").as("t"), lit(1).as("delta")),
                struct(col("session_end").as("t"), lit(-1).as("delta"))))
                .as("bd"))
      .select(col("bd.t").as("t"), col("bd.delta").as("delta"),
              col("user_id"))
    val w = Window
      .orderBy(col("t"), col("delta"), col("user_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val r = b.withColumn("c", sum(col("delta")).over(w))
    // ONE pass over the sweep: max concurrency and its earliest instant
    // via lexicographic struct-max (c max, then -t max = t min); a
    // filter-against-the-max formulation would re-run the whole session
    // pipeline once per consumer
    r.agg(
      (count(lit(1)) / 2).cast("long").as("n_sessions"),
      max(struct(col("c").as("c"),
                 (lit(0L) - unix_micros(col("t"))).as("negt"))).as("best"))
      .select(col("n_sessions"), col("best.c").cast("long").as("max_concurrent"),
              timestamp_micros(-col("best.negt")).as("peak_ts"))
  }

  /** As-of join: attach to every event the most recent per-minute KPI
    * row (same event_type, bucket start ≤ event ts). Spark has no ASOF
    * JOIN operator; the scalable re-expression is the union trick — tag
    * both sides, union, and take `last(..., ignoreNulls)` over a keyed
    * time-ordered window. ONE shuffle + sort on event_type, zero row
    * explosion; the naive `ts >= bucket` theta-join is a nested-loop that
    * would never survive 100 TB.
    *
    * Tie rule: a KPI row at bucket B sorts BEFORE a probe at ts = B
    * (is_probe 0 < 1), so an event exactly on a minute boundary sees its
    * own minute's KPI — the same inclusive semantics as DuckDB's
    * `ASOF JOIN ... ON probe.ts >= build.ts`, which the oracle uses
    * natively. Probe rows are mutually null on the build columns, so
    * equal-ts probe order cannot change any output value.
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val kpi = ev
      .groupBy(col("event_type"), date_trunc("minute", col("ts")).as("bucket"))
      .agg(round(avg(col("value")), 4).as("kpi_value"))

    val probes = ev
      .select(col("event_id"), col("event_type"), col("ts"), col("value"))
      .withColumn("kpi_ts", lit(null).cast("timestamp"))
      .withColumn("kpi_value", lit(null).cast("double"))
      .withColumn("is_probe", lit(1))
    val builds = kpi.select(
      lit(null).cast("string").as("event_id"),
      col("event_type"),
      col("bucket").as("ts"),
      lit(null).cast("double").as("value"),
      col("bucket").as("kpi_ts"),
      col("kpi_value"),
      lit(0).as("is_probe"))

    val w = Window
      .partitionBy(col("event_type"))
      .orderBy(col("ts"), col("is_probe"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    probes
      .unionByName(builds)
      .withColumn("asof_ts", last(col("kpi_ts"), ignoreNulls = true).over(w))
      .withColumn("asof_kpi", last(col("kpi_value"), ignoreNulls = true).over(w))
      .filter(col("is_probe") === 1)
      .select(col("event_id"), col("event_type"), col("ts"), col("value"),
              col("asof_ts"), col("asof_kpi"))
      .orderBy(col("event_type"), col("ts"), col("event_id"))
  }

  /** Static maintenance/incident windows — the small interval side of the
    * range join (cf. [[AnomalyOps.alertRules]]: config expressed as a
    * table). Half-open [start, end).
    */
  def incidentWindows(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "click", "2024-01-02 00:00:00", "2024-01-02 12:00:00"),
      (2L, "error", "2024-01-05 06:30:00", "2024-01-06 01:15:00"),
      (3L, "purchase", "2024-01-10 00:00:00", "2024-01-17 00:00:00"),
      (4L, "view", "2024-01-20 18:00:00", "2024-01-20 18:45:00"),
      (5L, "error", "2024-01-25 00:00:00", "2024-01-28 00:00:00")
    ).toDF("window_id", "w_type", "w_start", "w_end")
      .select(col("window_id"), col("w_type"),
              col("w_start").cast("timestamp").as("w_start"),
              col("w_end").cast("timestamp").as("w_end"))
  }

  /** Range (interval) join: events falling inside incident windows of
    * their type, aggregated per window. Executed the bucket-prefilter
    * way: each interval explodes to the hour buckets it covers, events
    * bucket to their hour, and the join is an EQUI-join on (type, hour)
    * with the exact range predicate as a residual filter — the standard
    * large×large range-join strategy (each side shuffles once on the
    * bucket key; no nested loop, no broadcast requirement). The window
    * side here is tiny, but the plan shape is the one that scales to
    * interval tables far beyond broadcast size.
    */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val hours = incidentWindows(spark)
      .select(col("window_id"), col("w_type"), col("w_start"), col("w_end"),
              explode(sequence(date_trunc("hour", col("w_start")),
                               date_trunc("hour", col("w_end")),
                               expr("INTERVAL 1 HOUR"))).as("hour"))
    val ev = Tables
      .events(spark, dir)
      .withColumn("hour", date_trunc("hour", col("ts")))

    ev.join(hours,
            ev("event_type") === hours("w_type") && ev("hour") === hours("hour") &&
              ev("ts") >= hours("w_start") && ev("ts") < hours("w_end"))
      .groupBy(col("window_id"), col("w_type"))
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value")), 4).as("sum_value"),
           round(avg(col("value")), 4).as("avg_value"))
      .orderBy(col("window_id"))
  }

  /** Latest-per-key snapshot: each user's most recent event — the
    * SCD-style "current state" compaction every event-sourced store
    * needs. Runs through the dedicated per-key top-k operator
    * ([[graft.plans.TopKPerKeyPlan]], k=1): the partial pre-shuffle pass
    * reduces each input split to one row per user BEFORE the exchange,
    * so the shuffle moves at most (users × splits) rows — against a
    * 100 TB event log that is the entire ballgame. Deterministic
    * event_id tie-break; bit-identical to the `row_number` formulation
    * (same DuckDB oracle).
    */
  def latestEvents(spark: SparkSession, dir: String): DataFrame =
    graft.plans.TopK
      .perKey(Tables.events(spark, dir), Seq("user_id"),
              Seq("ts" -> false, "event_id" -> false), 1, "rn")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
              col("value"))
      .orderBy(col("user_id"))

  /** Click→purchase attribution: each purchase joined to every click by
    * the same user in the preceding 10 minutes — the interval-join shape
    * (Flink's `intervalJoin`; Spark stream-stream join with time-bound
    * condition, see [[graft.streaming.EventPipeline.attributionStream]]
    * for the incremental form with identical semantics). Batch plan: an
    * equi-join on user_id with the interval as a residual range
    * predicate — at cluster scale the user key carries the shuffle and
    * the residual prunes in-task, never a theta join.
    */
  def clickAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"),
              col("event_id").as("click_id"))
    val purchases = ev
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"),
              col("event_id").as("purchase_id"), col("value"))
    clicks
      .join(purchases, Seq("user_id"))
      .filter(col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
              col("click_ts"), col("purchase_ts"),
              round(col("value"), 4).as("purchase_value"))
      .orderBy(col("user_id"), col("click_id"), col("purchase_id"))
  }

  // ---- DuckDB oracles ----------------------------------------------------

  private val windowsSql =
    """wins(window_id, w_type, w_start, w_end) AS (
      |  VALUES (CAST(1 AS BIGINT), 'click',    TIMESTAMP '2024-01-02 00:00:00', TIMESTAMP '2024-01-02 12:00:00'),
      |         (CAST(2 AS BIGINT), 'error',    TIMESTAMP '2024-01-05 06:30:00', TIMESTAMP '2024-01-06 01:15:00'),
      |         (CAST(3 AS BIGINT), 'purchase', TIMESTAMP '2024-01-10 00:00:00', TIMESTAMP '2024-01-17 00:00:00'),
      |         (CAST(4 AS BIGINT), 'view',     TIMESTAMP '2024-01-20 18:00:00', TIMESTAMP '2024-01-20 18:45:00'),
      |         (CAST(5 AS BIGINT), 'error',    TIMESTAMP '2024-01-25 00:00:00', TIMESTAMP '2024-01-28 00:00:00')
      |)""".stripMargin

  /** Shared session-reconstruction CTE chain (events → per-user session
    * groups `g`) — the ONE place the 30-minute gap rule and tie-break
    * live; both the sessionize oracle and its consumers append their own
    * final SELECT (or extend the chain with more CTEs).
    */
  private val sessionCtesSql: String =
    s"""WITH e AS (${Tables.eventsSql}),
       |l AS (
       |  SELECT user_id, ts, value,
       |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
       |  FROM e
       |),
       |s AS (
       |  SELECT *, CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
       |                 THEN 1 ELSE 0 END AS new_s
       |  FROM l
       |),
       |g AS (
       |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
       |                             ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM s
       |)""".stripMargin

  /** Shared by `sessionize` (batch) and `stream_session_drain` (the
    * same sessions through an actual writeStream drain). Micro-unit
    * exact session sums mirror the Spark sides.
    */
  private val sessionizeSql: String =
    s"""$sessionCtesSql
       |SELECT user_id, min(ts) AS session_start,
       |       max(ts) + INTERVAL 30 MINUTE AS session_end,
       |       count(*) AS n_events,
       |       round(CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
       |                    AS DOUBLE) / 1000000.0, 4) AS sum_value
       |FROM g GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin

  /** Shared by `click_attribution` (batch) and
    * `stream_attribution_drain` (the same pairs through an actual
    * stream-stream interval-join drain).
    */
  private val clickAttributionSql: String =
    s"""WITH e AS (${Tables.eventsSql}),
       |c AS (SELECT user_id, ts AS click_ts, event_id AS click_id
       |      FROM e WHERE event_type = 'click'),
       |p AS (SELECT user_id, ts AS purchase_ts, event_id AS purchase_id, value
       |      FROM e WHERE event_type = 'purchase')
       |SELECT c.user_id AS user_id, click_id, purchase_id, click_ts, purchase_ts,
       |       round(value, 4) AS purchase_value
       |FROM c JOIN p ON c.user_id = p.user_id
       |  AND purchase_ts >= click_ts
       |  AND purchase_ts <= click_ts + INTERVAL 10 MINUTE
       |ORDER BY c.user_id, click_id, purchase_id""".stripMargin

  /** SCD type-2 history construction: collapse each user's status
    * timeline (the derived ok/warning/error band, [[Tables.eventsWithStatus]])
    * into validity intervals — one row per consecutive RUN of the same
    * value, `[valid_from, valid_to)` with `valid_to` NULL on the open
    * (current) version. The standard warehouse dimension-history shape
    * (Kimball SCD2), built change-log-style from the raw event stream.
    *
    * Shuffle-minimal: detect run starts with `lag` ≠ current, keep only
    * those rows, then `row_number` (version) and `lead` (interval close)
    * — every window shares ONE partitioning (user_id) and ONE sort
    * (ts, event_id), so the whole operator is a single shuffle + single
    * sort, no groupBy re-shuffle on (user, run). The (ts, event_id)
    * sort key makes the run segmentation a deterministic total order
    * (ts alone can collide). At 100 TB this is the same plan per key —
    * window partitions are per-user and bounded by per-user activity.
    */
  def scd2Intervals(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables
      .eventsWithStatus(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("status"))
      .withColumn("prev", lag(col("status"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("status"))
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("version"), col("status"),
              col("ts").as("valid_from"), col("valid_to"))
      .orderBy(col("user_id"), col("version"))
  }

  /** CDC MERGE materialization (the lakehouse upsert/compaction shape):
    * the pre-cutoff event stream is the base snapshot, post-cutoff
    * events are the change batch — each an upsert, except `error`
    * events which are tombstones (deletes). Latest-wins by the unique
    * (ts, event_id) order; surviving rows are classified
    * inserted / updated / unchanged the way a MERGE audit reports.
    *
    * Scale shape: ONE groupBy(user_id) doing everything — the
    * latest-wins pick is `max(struct(ts, event_id, …))` (an aggregate
    * argmax with map-side partial combine, never a row_number window
    * that would serialize a hot key's history in one task), and the
    * base/change presence bits fold in the same pass. This is the
    * compaction kernel a 100 TB CDC table runs per micro-batch; AQE can
    * split any skewed aggregation partition, which it cannot do for
    * window partitions.
    */
  def cdcMerge(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit("2024-01-21 00:00:00").cast("timestamp")
    Tables
      .events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"),
              (col("event_type") === "error" && col("ts") >= cut).as("is_del"),
              (col("ts") < cut).as("in_base"))
      .groupBy(col("user_id"))
      .agg(
        max(struct(col("ts"), col("event_id"), col("is_del"), col("value"))).as("last"),
        max(when(col("in_base"), 1).otherwise(0)).as("has_base"),
        max(when(!col("in_base"), 1).otherwise(0)).as("has_chg"))
      .filter(!col("last.is_del"))
      .select(
        col("user_id"),
        col("last.ts").as("last_ts"),
        col("last.event_id").as("last_event_id"),
        col("last.value").as("value"),
        when(col("has_base") === 0, "inserted")
          .when(col("has_chg") === 0, "unchanged")
          .otherwise("updated").as("merge_action"))
      .orderBy(col("user_id"))
  }

  /** Incremental materialized-view maintenance: the per-user KPI
    * snapshot (count / sum / last-seen) is kept current by MERGING the
    * delta batch's PARTIAL aggregate states into the base snapshot's,
    * never re-reading the base data — `count` states add, `sum` states
    * add, `max` states take the greater. The cutoff splits the event
    * stream into base (before) and delta (after); the DuckDB oracle
    * computes the same view by full recomputation over all events, so
    * the hash gate IS the algebraic proof that merge(partial(base),
    * partial(delta)) = agg(base ∪ delta) — the invariant every
    * incremental pipeline (Delta MERGE of agg states, Flink retract
    * streams, cube refresh) rests on.
    *
    * Sums are exact integer micro-units (`floor(value·10⁶ + 0.5)`), so
    * state merging is associative bit-for-bit — the property that lets
    * a 100 TB refresh touch only the delta. Scale shape: both partials
    * partial-aggregate map-side, shuffle once on `user_id`, and the
    * full-outer merge join reuses that same hash partitioning (no third
    * shuffle); the base side would be the stored state table read
    * co-partitioned.
    */
  def incrAggMerge(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit("2024-01-21 00:00:00").cast("timestamp")
    def partial(df: DataFrame): DataFrame =
      df.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
             sum(graft.functions.Rounding.microUnits(col("value")))
               .as("sum_micros"),
             max(col("ts")).as("last_ts"))
    val events = Tables.events(spark, dir)
    val base = partial(events.filter(col("ts") < cut)).alias("s")
    val delta = partial(events.filter(col("ts") >= cut)).alias("d")
    base
      .join(delta, Seq("user_id"), "full_outer")
      .select(
        col("user_id"),
        (coalesce(col("s.n_events"), lit(0L)) +
          coalesce(col("d.n_events"), lit(0L))).as("n_events"),
        (coalesce(col("s.sum_micros"), lit(0L)) +
          coalesce(col("d.sum_micros"), lit(0L))).as("sum_micros"),
        greatest(col("s.last_ts"), col("d.last_ts")).as("last_ts"))
      .orderBy(col("user_id"))
  }

  val oracles: Map[String, String] = Map(
    "incr_agg_merge" ->
      s"""WITH e AS (${Tables.eventsSql})
         |SELECT user_id, count(*) AS n_events,
         |       CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
         |            AS BIGINT) AS sum_micros,
         |       max(ts) AS last_ts
         |FROM e GROUP BY 1 ORDER BY user_id""".stripMargin,
    "cdc_merge" ->
      s"""WITH e AS (${Tables.eventsSql}),
         |f AS (
         |  SELECT *,
         |         (event_type = 'error' AND ts >= TIMESTAMP '2024-01-21') AS is_del
         |  FROM e
         |),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY user_id
         |                               ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM f
         |),
         |a AS (
         |  SELECT user_id,
         |         max(CASE WHEN ts < TIMESTAMP '2024-01-21' THEN 1 ELSE 0 END) AS has_base,
         |         max(CASE WHEN ts >= TIMESTAMP '2024-01-21' THEN 1 ELSE 0 END) AS has_chg
         |  FROM f GROUP BY 1
         |)
         |SELECT r.user_id, r.ts AS last_ts, r.event_id AS last_event_id, r.value,
         |       CASE WHEN has_base = 0 THEN 'inserted'
         |            WHEN has_chg = 0 THEN 'unchanged'
         |            ELSE 'updated' END AS merge_action
         |FROM r JOIN a USING (user_id)
         |WHERE rn = 1 AND NOT is_del
         |ORDER BY user_id""".stripMargin,
    "scd2_intervals" ->
      s"""WITH e AS (${Tables.eventsSql}),
         |s AS (SELECT user_id, ts, event_id, ${Tables.statusSql} AS status FROM e),
         |c AS (
         |  SELECT *, lag(status) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
         |  FROM s
         |),
         |r AS (SELECT * FROM c WHERE prev IS NULL OR prev <> status)
         |SELECT user_id,
         |       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER) AS version,
         |       status, ts AS valid_from,
         |       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
         |FROM r ORDER BY user_id, version""".stripMargin,
    "sessionize" -> sessionizeSql,
    // the streaming drains emit exactly the batch sessions (the sentinel
    // closes them all), so the oracle is shared verbatim — one leg via
    // session_window state merges, one via transformWithState timers
    "stream_session_drain" -> sessionizeSql,
    // out-of-order WITHIN the watermark: a row arriving one micro-batch
    // behind its event-time peers must merge (backward) into persisted
    // session state — same flushed sessions, same oracle
    "stream_ooo_session_drain" -> sessionizeSql,
    // kill-and-resume over the same topology: the session-window store
    // restores an OPEN session across a query restart and must still
    // flush every session exactly once against the same oracle
    "stream_restart_session_drain" -> sessionizeSql,
    // DIRTY restart (crash between sink write and checkpoint commit)
    // over the same topology: the re-executed batch must re-merge the
    // restored open session — same flushed sessions, same oracle
    "stream_dirty_restart_session_drain" -> sessionizeSql,
    "stream_session_timer_drain" -> sessionizeSql,
    // MID-STREAM read of BOTH stream-stream join buffers AS OF batch 2
    // (statestore time travel, joinSide left+right): the oracle slices
    // the first three ntile(5) chunks, computes batch 2's watermark as
    // the MIN of the two sides' ms-floored event-time maxima over
    // chunks 0..1 minus the 10 s delay, and keeps exactly the rows a
    // future match could still involve — clicks >= wm - 10 min (the
    // join bound solved for the left side), purchases >= wm
    "stream_midstate_join_reader" ->
      s"""WITH e AS (${Tables.eventsSql}),
         |c AS (
         |  SELECT *, ntile(5) OVER (ORDER BY ts, event_id) - 1 AS chunk
         |  FROM e
         |),
         |wm AS (
         |  SELECT (least(
         |            max(CASE WHEN event_type = 'click'
         |                     THEN CAST(floor(epoch_us(ts) / 1000) AS BIGINT)
         |                END),
         |            max(CASE WHEN event_type = 'purchase'
         |                     THEN CAST(floor(epoch_us(ts) / 1000) AS BIGINT)
         |                END)) - 10000) * 1000 AS w_us
         |  FROM c WHERE chunk <= 1
         |),
         |seen AS (SELECT * FROM c WHERE chunk <= 2)
         |SELECT side, user_id, ts, event_id, purchase_value FROM (
         |  SELECT 'click' AS side, user_id, ts, event_id,
         |         CAST(NULL AS DOUBLE) AS purchase_value
         |  FROM seen, wm
         |  WHERE event_type = 'click'
         |    AND epoch_us(ts) >= w_us - 600000000
         |  UNION ALL
         |  SELECT 'purchase' AS side, user_id, ts, event_id,
         |         round(value, 4) AS purchase_value
         |  FROM seen, wm
         |  WHERE event_type = 'purchase'
         |    AND epoch_us(ts) >= w_us
         |)
         |ORDER BY side, event_id""".stripMargin,
    // MID-STREAM read of the session store AS OF batch 1 (statestore
    // time travel): the oracle re-derives the staging's own cut — the
    // first two ntile(3) chunks over (ts, event_id) with the sentinel
    // in the ranking — gap-sessionizes that slice, and drops sessions
    // batch 1's watermark evicted (end <= max batch-0 event time,
    // ms-floored, minus the 10 s delay; µs-precision comparison)
    "stream_midstate_reader" ->
      s"""WITH e AS (${Tables.eventsSql}),
         |mx AS (SELECT max(ts) AS m FROM e),
         |a AS (
         |  SELECT event_id, ts, user_id, value FROM e
         |  UNION ALL
         |  SELECT CAST(-1 AS BIGINT), m + INTERVAL 2 HOUR,
         |         CAST(-1 AS BIGINT), 1.0 FROM mx
         |),
         |c AS (
         |  SELECT *, ntile(3) OVER (ORDER BY ts, event_id) - 1 AS chunk
         |  FROM a
         |),
         |wm AS (
         |  SELECT (CAST(floor(epoch_us(max(ts)) / 1000) AS BIGINT)
         |            - 10000) * 1000 AS w_us
         |  FROM c WHERE chunk = 0
         |),
         |l AS (
         |  SELECT user_id, ts, value,
         |         lag(ts) OVER (PARTITION BY user_id
         |                       ORDER BY ts, event_id) AS prev_ts
         |  FROM c WHERE chunk <= 1
         |),
         |s AS (
         |  SELECT *, CASE WHEN prev_ts IS NULL
         |                   OR ts - prev_ts > INTERVAL 30 MINUTE
         |                 THEN 1 ELSE 0 END AS new_s
         |  FROM l
         |),
         |g AS (
         |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
         |                             ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM s
         |),
         |sess AS (
         |  SELECT user_id, min(ts) AS session_start,
         |         max(ts) + INTERVAL 30 MINUTE AS session_end,
         |         count(*) AS n_events,
         |         round(CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
         |                      AS DOUBLE) / 1000000.0, 4) AS sum_value
         |  FROM g GROUP BY user_id, sid
         |)
         |SELECT user_id, session_start, session_end, n_events, sum_value
         |FROM sess, wm
         |WHERE epoch_us(session_end) > w_us
         |ORDER BY user_id, session_start""".stripMargin,
    "concurrent_sessions" ->
      s"""$sessionCtesSql,
         |sess AS (
         |  SELECT user_id, min(ts) AS session_start,
         |         max(ts) + INTERVAL 30 MINUTE AS session_end
         |  FROM g GROUP BY user_id, sid
         |),
         |b AS (
         |  SELECT session_start AS t, 1 AS delta, user_id FROM sess
         |  UNION ALL SELECT session_end, -1, user_id FROM sess
         |),
         |r AS (
         |  SELECT t, delta,
         |         sum(delta) OVER (ORDER BY t, delta, user_id
         |                          ROWS UNBOUNDED PRECEDING) AS c
         |  FROM b
         |),
         |m AS (SELECT CAST(max(c) AS BIGINT) AS max_concurrent FROM r)
         |SELECT (SELECT CAST(count(*) AS BIGINT) FROM sess) AS n_sessions,
         |       m.max_concurrent,
         |       (SELECT min(t) FROM r, m WHERE r.c = m.max_concurrent) AS peak_ts
         |FROM m""".stripMargin,
    "asof_join" ->
      s"""WITH e AS (${Tables.eventsSql}),
         |kpi AS (
         |  SELECT event_type, date_trunc('minute', ts) AS bucket,
         |         round(avg(value), 4) AS kpi_value
         |  FROM e GROUP BY 1, 2
         |)
         |SELECT e.event_id, e.event_type, e.ts, e.value,
         |       kpi.bucket AS asof_ts, kpi.kpi_value AS asof_kpi
         |FROM e ASOF LEFT JOIN kpi
         |  ON e.event_type = kpi.event_type AND e.ts >= kpi.bucket
         |ORDER BY e.event_type, e.ts, e.event_id""".stripMargin,
    "range_join" ->
      s"""WITH e AS (${Tables.eventsSql}), $windowsSql
         |SELECT window_id, w_type, count(*) AS n_events,
         |       round(sum(value), 4) AS sum_value,
         |       round(avg(value), 4) AS avg_value
         |FROM e JOIN wins
         |  ON e.event_type = wins.w_type AND e.ts >= wins.w_start AND e.ts < wins.w_end
         |GROUP BY window_id, w_type ORDER BY window_id""".stripMargin,
    "click_attribution" -> clickAttributionSql,
    // the drain's stream-stream inner join emits exactly the batch
    // pairs, so the oracle is shared verbatim
    "stream_attribution_drain" -> clickAttributionSql,
    // kill-and-resume over the same topology: an unmatched click held
    // in the symmetric-hash join state must survive the restart and
    // match its post-restart purchase — same oracle
    "stream_restart_join_drain" -> clickAttributionSql,
    // DIRTY restart over the same topology: the crashed attempt already
    // committed join-buffer version 2, so the re-executed batch must
    // roll both symmetric buffers back and re-derive its matches
    // exactly once — same emitted pairs, same oracle
    "stream_dirty_restart_join_drain" -> clickAttributionSql,
    "latest_events" ->
      s"""WITH e AS (${Tables.eventsSql}),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY user_id
         |                               ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM e
         |)
         |SELECT user_id, event_id, ts, event_type, value
         |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin
  )
}
