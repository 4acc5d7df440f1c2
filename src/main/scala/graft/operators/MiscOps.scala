package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Rounding.round
import org.apache.spark.sql.types._

/** Semi-structured parsing, serialization round-trips, and stream-table
  * hygiene ops (SURVEY §2.3 P1/P2, §2.8 F6/F7/F10/F11).
  */
object MiscOps {

  val propsSchema: StructType = StructType(Seq(StructField("k", LongType)))

  /** JSON parse + typed projection — the reference EventParser (P1):
    * `from_json` with PERMISSIVE null-on-corrupt semantics, then typed
    * field extraction. Fully codegen'd; no UDF.
    */
  def eventParseJson(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .withColumn("parsed", from_json(col("props"), propsSchema))
      .filter(col("parsed").isNotNull) // P2: drop unparseable
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
              col("value"), col("parsed.k").as("props_k"))
      .orderBy(col("event_id"))

  /** Semi-structured analytics on Spark 4's VARIANT type — the
    * schema-on-read path for payloads whose shape VARIES by event type
    * (exactly where a fixed `from_json` StructType stops working):
    * each type carries a different deterministic JSON payload (clicks a
    * nested position, views a page/dwell pair, everything else a cents
    * amount), `parse_json` ingests them into one VARIANT column, and
    * typed `variant_get` paths extract per-type fields — missing paths
    * are NULL, so the aggregation needs no per-type branching. The
    * oracle recomputes the same sums from the SOURCE column formulas
    * directly (no JSON at all), so the gate verifies the whole
    * parse_json → shredded-variant → variant_get round trip
    * reproduces the original arithmetic. VARIANT's binary encoding
    * scans ~an order of magnitude faster than re-parsing JSON text per
    * path at 100 TB, which is why this is the idiomatic Spark 4 form
    * of the open-schema JSONB column.
    */
  def eventVariant(spark: SparkSession, dir: String): DataFrame = {
    val payload = when(
      col("event_type") === "click",
      to_json(struct(
        (col("user_id") % 5).as("btn"),
        struct((col("event_id") % 97).as("x"),
               (col("event_id") % 53).as("y")).as("pos"))))
      .when(
        col("event_type") === "view",
        to_json(struct(
          concat(lit("p"), col("event_id") % 7).as("page"),
          (col("event_id") % 1000).as("ms"))))
      .otherwise(
        to_json(struct(
          graft.functions.Rounding.fixedUnits(col("value"), 100L)
            .as("cents"))))
    Tables
      .events(spark, dir)
      .withColumn("v", parse_json(payload))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(variant_get(col("v"), "$.pos.x", "long")).as("sum_x"),
        sum(variant_get(col("v"), "$.pos.y", "long")).as("sum_y"),
        sum(variant_get(col("v"), "$.ms", "long")).as("sum_ms"),
        count(variant_get(col("v"), "$.page", "string")).as("n_pages"),
        sum(variant_get(col("v"), "$.cents", "long")).as("sum_cents"))
      .orderBy(col("event_type"))
  }

  /** The reference's full nested event schema (§1.2): top-level fields +
    * an `attributes` struct of the common keys. Parsed with an explicit
    * StructType — never inferSchema.
    */
  val nestedEventSchema: StructType = StructType(Seq(
    StructField("event_id", StringType),
    StructField("source", StringType),
    StructField("timestamp", StringType),
    StructField(
      "attributes",
      StructType(Seq(
        StructField("user_id", StringType),
        StructField("metric", DoubleType),
        StructField("status", StringType),
        StructField("session_id", StringType),
        StructField("region", StringType)
      )))
  ))

  /** End-to-end P1 machinery on the reference's nested shape: build the
    * raw JSON event (`event_producer.py:47-103` layout), parse with an
    * explicit StructType (PERMISSIVE → corrupt rows become null and are
    * filtered, P2) whose `attributes` member is the open
    * `MapType(String, String)` JSONB remainder (SURVEY §1.3), and
    * project the typed fields out of it. ONE `from_json` pass: the
    * earlier shape (typed-struct parse + `get_json_object` +
    * a second `from_json` for the map) scanned every record's JSON three
    * times and was the slowest extended query at sf0.1 (2.4s → this).
    * Typed-number fidelity is preserved: Jackson prints doubles in
    * shortest-round-trip form, so `cast(map_value AS double)` is
    * bit-exact against the typed-schema parse. A deliberately malformed
    * record is unioned in to prove the null-on-corrupt path.
    */
  def eventNestedParse(spark: SparkSession, dir: String): DataFrame = {
    val regions = array(lit("us-east"), lit("us-west"), lit("eu-west"), lit("ap-south"))
    // r13 (§2.3 shuffle fewer bytes): the degenerate-input widening
    // repartition moved BELOW the JSON build — the exchange now carries
    // the ~40-byte typed event columns instead of the ~250-byte JSON
    // strings it used to move, and the serialize (to_json + 2×md5 +
    // date_format) runs on the widened side at full parallelism along
    // with the parse. Same row set, same plan shape otherwise
    // (plans/r13/event_nested_parse_*.txt).
    val ev0 = Tables.eventsWithStatus(spark, dir)
    // The sf fixture is one parquet file = one input split, which would
    // run the whole serialize+parse stage on a single core; a 100 TB
    // stream arrives over thousands of Kafka/file partitions, so
    // widening a degenerate input to the executor count is a no-op
    // there and a 32x here.
    val cores = spark.sparkContext.defaultParallelism
    val ev =
      if (ev0.rdd.getNumPartitions < cores) ev0.repartition(cores) else ev0
    val raw = ev
      .select(to_json(struct(
        col("event_id").cast("string").as("event_id"),
        col("event_type").as("source"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").as("timestamp"),
        struct(
          concat(lit("user_"), col("user_id")).as("user_id"),
          col("value").as("metric"),
          col("status"),
          substring(md5(col("event_id").cast("string")), 1, 8).as("session_id"),
          element_at(regions,
                     (conv(substring(md5(col("event_id").cast("string")), 1, 1), 16, 10)
                       .cast("int") % 4) + 1).as("region")
        ).as("attributes")
      )).as("raw"))
      .union(spark.range(1).select(lit("{not json").as("raw"))) // corrupt row

    val openSchema = StructType(Seq(
      StructField("event_id", StringType),
      StructField("source", StringType),
      StructField("timestamp", StringType),
      StructField("attributes", MapType(StringType, StringType))
    ))

    raw
      // explode(array(...)) generate-barrier: JsonToStructs is
      // codegen-fallback with no common-subexpression reuse, and the
      // pushed-down null filter plus the projection would otherwise each
      // reparse the record; behind a Generate the parse runs ONCE and
      // every consumer reads the attribute (PlanSpec guards the count).
      .select(explode(array(from_json(col("raw"), openSchema))).as("e"))
      // P2: malformed → null struct (PERMISSIVE) → dropped; the
      // event_id check subsumes `e IS NOT NULL`
      .filter(col("e.event_id").isNotNull)
      .select(
        col("e.event_id").cast("long").as("event_id"),
        col("e.source").as("source"),
        to_timestamp(col("e.timestamp")).as("ts"),
        col("e.attributes").getItem("user_id").as("user_id"),
        col("e.attributes").getItem("metric").cast("double").as("metric"),
        col("e.attributes").getItem("status").as("status"),
        col("e.attributes").getItem("session_id").as("session_id"),
        col("e.attributes").getItem("region").as("region"),
        size(col("e.attributes")).as("n_attr_keys"),
        col("e.attributes").getItem("status").as("status_from_map")
      )
      .orderBy(col("event_id"))
  }

  /** JSON serialize (F6): aggregate record → JSON envelope string, the
    * shape the reference's Kafka sinks emit
    * (`EventAggregationJob.java:269-321`), plus the Redis-style composite
    * key `agg:{source}:{window}:{windowStart}` (F11).
    */
  def eventJsonEnvelope(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy(col("event_type"), date_trunc("minute", col("ts")).as("window_start"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
      .withColumn(
        "redis_key",
        concat_ws(":", lit("agg"), col("event_type"), lit("1m"),
                  date_format(col("window_start"), "yyyy-MM-dd'T'HH:mm:ss'Z'")))
      .select(col("redis_key"), col("event_type"), col("window_start"),
              col("n_events"), col("sum_value"))
      .orderBy(col("redis_key"))

  /** Exact event dedup on the event id — batch analog of streaming
    * `dropDuplicatesWithinWatermark` (SURVEY §7 phase 5); keeps the first
    * record per key by (ts, event_id) order via min-aggregation, the
    * shuffle-once pattern that scales (no global sort).
    */
  def eventsDedup(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy(col("event_id"))
      .agg(min(col("ts")).as("ts"), count(lit(1)).as("n_dups"))
      .orderBy(col("event_id"))

  /** Per-type user reach: exact distinct + approximate (HLL) side by side.
    * The approx column is NOT oracle-comparable (engine-specific sketch);
    * it ships in the separate rows-only query [[approxDistinctUsers]].
    */
  def distinctUsers(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("n_users"),
           count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  /** Relative standard deviation passed to `approx_count_distinct` —
    * HLL++'s accuracy knob (register count ~ (1.106/rsd)²).
    */
  private val HllRsd = 0.01

  /** HyperLogLog++ distinct estimate — the 100 TB path for count-distinct
    * KPIs (constant memory per group vs the exact two-phase aggregate) —
    * SELF-GATED: the sketch estimate is engine-specific (no portable
    * oracle), so the query also computes the exact count and emits
    * `within_tolerance` = |estimate/exact − 1| ≤ 5·[[HllRsd]]. The
    * DuckDB oracle recomputes the exact count and a literal `true`,
    * making rows+schema+hash all checkable without the sketch itself
    * ever crossing engines. The bound is 5σ, not the rsd itself: rsd is
    * the STANDARD DEVIATION of the relative error, so a 1σ gate would
    * fail a perfectly healthy sketch on ~1/3 of groups; 5σ still
    * catches every gross failure (wrong column, wrong rsd wiring,
    * broken merge) while the chance of an in-spec sketch tripping it is
    * negligible at any scale factor. `greatest(…, 1)` guards the
    * empty-group division. The exact aggregate exists only to power the
    * gate; a production KPI would ship the estimate alone.
    */
  def approxDistinctUsers(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), HllRsd).as("approx"),
           count_distinct(col("user_id")).as("n_users_exact"))
      .select(
        col("event_type"), col("n_users_exact"),
        (abs(col("approx").cast("double") /
               greatest(col("n_users_exact"), lit(1L)).cast("double") - 1.0)
          <= 5 * HllRsd)
          .as("within_tolerance"))
      .orderBy(col("event_type"))

  /** `percentile_approx` accuracy knob: the GK-sketch guarantee is rank
    * error ≤ n/accuracy.
    */
  private val P95Accuracy = 100

  /** Approximate p95 with a RANK-ERROR self-gate — the quantile-sketch
    * sibling of [[approxDistinctUsers]], and the more robust gate
    * design: instead of comparing the sketch VALUE (engine-specific),
    * the query counts how many values sit at or below the sketch's
    * output and checks that rank against the target in exact integer
    * arithmetic — `|100·rank − 95·n| ≤ 2·n + 100`, i.e. twice the
    * documented ε = 1/[[P95Accuracy]] rank guarantee plus one element
    * of slack, so an in-spec sketch can never trip it. The join-back
    * rank pass is the standard sketch-validation shape (one extra scan,
    * only run when auditing). Portable outputs only: the exact
    * interpolated p95 rides along, the sketch value itself never
    * crosses engines.
    */
  def approxP95Gated(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_type"), col("value"))
    val sk = ev
      .groupBy(col("event_type"))
      .agg(percentile_approx(col("value"), lit(0.95), lit(P95Accuracy))
             .as("approx"),
           count(lit(1)).as("n_values"),
           round(percentile(col("value"), lit(0.95)), 6).as("p95_exact"))
    ev.join(sk, "event_type")
      .groupBy(col("event_type"), col("n_values"), col("p95_exact"),
               col("approx"))
      .agg(sum(when(col("value") <= col("approx"), 1L).otherwise(0L))
        .as("rank_le"))
      .select(
        col("event_type"), col("n_values"), col("p95_exact"),
        (abs(col("rank_le") * 100 - col("n_values") * 95) <=
          col("n_values") * 2 + 100).as("within_tolerance"))
      .orderBy(col("event_type"))
  }

  /** log₂ of the DataSketches HLL register count for [[hllByDay]] —
    * 2¹² registers ⇒ relative standard error ≈ 1.04/√2¹² ≈ 1.6 %, and a
    * sketch of at most a few KB per day regardless of cardinality.
    */
  private val HllLgK = 12

  /** 5σ relative-error gate for [[hllByDay]] (same 5σ rationale as
    * [[approxDistinctUsers]]: rsd is a standard deviation, a 1σ gate
    * would fail healthy sketches on ~1/3 of groups).
    */
  private[graft] val HllSketchTol = 5 * 1.04 / math.sqrt((1 << HllLgK).toDouble)

  /** Per-day DataSketches HLL sketches of distinct users, MERGED into a
    * corpus-wide total with `hll_union_agg` — the 100 TB re-aggregation
    * pattern: persist one tiny (2¹²-register) sketch per partition-day
    * and answer any date-range distinct-user question by unioning the
    * covered days' sketches, never rescanning the events. The union is
    * associative and commutative, so Spark partial-aggregates it
    * map-side and the final reduce touches |days| rows, not |events|.
    * (This is `approx_count_distinct`'s missing half: HLL++ emits only
    * a final estimate, while the DataSketches column functions expose
    * the sketch BYTES as a value that can be stored and re-merged.)
    *
    * SELF-GATED like [[approxDistinctUsers]]: sketch bytes and
    * estimates are engine-specific, so the portable output is the exact
    * per-day count, the exact total, and two 5σ verdicts (`day_ok` for
    * each day's estimate, `merged_ok` for the unioned estimate). The
    * exact aggregates — and the second events scan that computes the
    * exact total — exist only to power the audit gate; production ships
    * the sketches alone.
    */
  def hllByDay(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .events(spark, dir)
      .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
    val daily = ev
      .groupBy(col("day"))
      .agg(hll_sketch_agg(col("user_id"), HllLgK).as("sketch"),
           count_distinct(col("user_id")).as("n_users_exact"))
    val mergedEst = daily
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("merged_est"))
    val totalExact = ev.agg(count_distinct(col("user_id")).as("n_total_exact"))
    val gateTotal = mergedEst
      .crossJoin(totalExact)
      .select(
        col("n_total_exact"),
        (abs(col("merged_est").cast("double") /
               greatest(col("n_total_exact"), lit(1L)).cast("double") - 1.0)
          <= HllSketchTol).as("merged_ok"))
    daily
      .select(
        col("day"), col("n_users_exact"),
        (abs(hll_sketch_estimate(col("sketch")).cast("double") /
               greatest(col("n_users_exact"), lit(1L)).cast("double") - 1.0)
          <= HllSketchTol).as("day_ok"))
      .crossJoin(broadcast(gateTotal))
      .orderBy(col("day"))
  }

  /** Estimate-vs-exact gate for [[thetaOverlap]]: theta sketches stay
    * EXACT below their nominal 2¹² entries (every test SF) and hold
    * ~2 % relative standard error beyond, so 5 % relative with an
    * absolute floor of 1 is a never-flaps-when-healthy bound.
    */
  private def thetaOk(est: Column, exact: Column): Column =
    abs(est.cast("double") - exact.cast("double")) <=
      greatest(lit(1.0), exact.cast("double") * lit(0.05))

  /** Pairwise audience overlap via theta sketches — the SET-OPERATION
    * sketch family: unlike HLL (union-only; intersection exists just as
    * noisy inclusion–exclusion), theta sketches support direct
    * `theta_intersection` / `theta_difference` / `theta_union`, so ONE
    * per-segment sketch table answers every pairwise overlap question.
    * That replaces the quadratic exact shape — re-joining the user set
    * per segment pair — with |segments|² operations on KB-sized
    * sketches: build sketches in one scan, then every "how many users
    * did both A and B" is sketch algebra, no rescan, and the sketches
    * re-merge across partitions/days like [[hllByDay]]'s.
    *
    * SELF-GATED: the exact per-pair counts (computed here only to power
    * the audit — they ARE the quadratic shape theta replaces) ship with
    * three [[thetaOk]] verdicts (intersection, union, A∖B); the oracle
    * re-derives the exact counts and expects all-true. Pairs share no
    * user → no row, matching the oracle's inner join.
    */
  def thetaOverlap(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_type"), col("user_id"))
    val perType = ev
      .groupBy(col("event_type"))
      .agg(expr("theta_sketch_agg(user_id)").as("sk"),
           count_distinct(col("user_id")).as("n_exact"))
    val u = ev.distinct()
    val exactPairs = u
      .as("a")
      .join(u.as("b"),
            col("a.user_id") === col("b.user_id") &&
              col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
               col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_intersect_exact"))
    exactPairs
      .join(broadcast(perType.select(col("event_type").as("type_a"),
                                     col("sk").as("sk_a"),
                                     col("n_exact").as("n_a_exact"))),
            "type_a")
      .join(broadcast(perType.select(col("event_type").as("type_b"),
                                     col("sk").as("sk_b"),
                                     col("n_exact").as("n_b_exact"))),
            "type_b")
      .withColumn("n_union_exact",
                  col("n_a_exact") + col("n_b_exact") - col("n_intersect_exact"))
      .select(
        col("type_a"), col("type_b"), col("n_a_exact"), col("n_b_exact"),
        col("n_intersect_exact"), col("n_union_exact"),
        thetaOk(expr("theta_sketch_estimate(theta_intersection(sk_a, sk_b))"),
                col("n_intersect_exact")).as("intersect_ok"),
        thetaOk(expr("theta_sketch_estimate(theta_union(sk_a, sk_b))"),
                col("n_union_exact")).as("union_ok"),
        thetaOk(expr("theta_sketch_estimate(theta_difference(sk_a, sk_b))"),
                col("n_a_exact") - col("n_intersect_exact")).as("diff_ok"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Rank-error tolerance for [[kllByDay]]'s gates: the DataSketches KLL
    * default (k=200) guarantees ≤ ~1.65 % normalized rank error at 99 %
    * confidence, and below k items the sketch is exact (error ≤ 1/n) —
    * `max(0.05, 2/n)` covers both regimes with margin at every SF.
    */
  private def kllTol(n: Column): Column =
    greatest(lit(0.05), lit(2.0) / n.cast("double"))

  /** Per-day KLL quantile sketches of event values, MERGED into a
    * corpus-wide p95 — [[hllByDay]]'s twin for quantiles: persist one
    * ~KB sketch per partition-day and answer any date-range percentile
    * question by merging the covered days' sketches
    * (`kll_merge_agg_double`), never rescanning the events. Like all
    * DataSketches aggs the union is associative/commutative, so Spark
    * partial-aggregates map-side and the final reduce touches |days|
    * rows. (`percentile_approx` has no storable/mergeable sketch value;
    * the KLL column functions expose the bytes.)
    *
    * SELF-GATED in RANK space, the error KLL actually bounds: the
    * sketch's p95 estimate is joined back against the day's values and
    * `day_ok` asserts |rank(est) − 0.95| ≤ [[kllTol]]; `merged_ok`
    * asserts the same for the merged sketch against the whole corpus.
    * The portable outputs are the exact nearest-rank-floor p95s (same
    * semantics as A2's [[graft.functions.ExactPercentile]]) and the two
    * verdicts; sketch bytes and estimates never cross engines.
    */
  def kllByDay(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .events(spark, dir)
      .select(date_trunc("day", col("ts")).as("day"), col("value"))
    val daily = ev
      .groupBy(col("day"))
      .agg(expr("kll_sketch_agg_double(value)").as("sketch"),
           count(lit(1)).as("n_values"),
           graft.functions.ExactPercentile.p95(col("value")).as("p95_exact"))
    val dayEst = daily.withColumn(
      "est", expr("kll_sketch_get_quantile_double(sketch, 0.95)"))
    val dayGate = ev
      .join(broadcast(dayEst.select(col("day"), col("est"))), "day")
      .groupBy(col("day"))
      .agg((sum(when(col("value") <= col("est"), 1L).otherwise(0L))
        .cast("double") / count(lit(1)).cast("double")).as("rank_of_est"))
    val mergedEst = daily.agg(
      expr("kll_sketch_get_quantile_double(kll_merge_agg_double(sketch), 0.95)")
        .as("mest"))
    val totalGate = ev
      .crossJoin(broadcast(mergedEst))
      .agg(
        graft.functions.ExactPercentile.p95(col("value"))
          .as("p95_total_exact"),
        count(lit(1)).as("n_total"),
        (sum(when(col("value") <= col("mest"), 1L).otherwise(0L))
          .cast("double") / count(lit(1)).cast("double")).as("rank_of_mest"))
      .select(col("p95_total_exact"),
              (abs(col("rank_of_mest") - 0.95) <= kllTol(col("n_total")))
                .as("merged_ok"))
    dayEst
      .join(dayGate, "day")
      .select(col("day"), col("n_values"), col("p95_exact"),
              (abs(col("rank_of_est") - 0.95) <= kllTol(col("n_values")))
                .as("day_ok"))
      .crossJoin(broadcast(totalGate))
      .orderBy(col("day"))
  }

  /** Distinct users per event type — the set-operation building block. */
  private def usersOf(spark: SparkSession, dir: String, t: String): DataFrame =
    Tables
      .events(spark, dir)
      .filter(col("event_type") === t)
      .select(col("user_id"))
      .distinct()

  /** INTERSECT: users who both clicked and purchased. Spark plans set
    * intersection as an aggregate + LeftSemi join — one shuffle per
    * side, no row explosion.
    */
  def usersClickAndPurchase(spark: SparkSession, dir: String): DataFrame =
    usersOf(spark, dir, "click")
      .intersect(usersOf(spark, dir, "purchase"))
      .orderBy(col("user_id"))

  /** EXCEPT (LeftAnti under the hood): (user, day) pairs with a view
    * but no purchase that day — browse-without-buy days. Day-level
    * granularity keeps the difference non-degenerate (every user in the
    * fixture eventually purchases).
    */
  def usersViewNotPurchase(spark: SparkSession, dir: String): DataFrame = {
    def daysOf(t: String): DataFrame =
      Tables
        .events(spark, dir)
        .filter(col("event_type") === t)
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .distinct()
    daysOf("view")
      .except(daysOf("purchase"))
      .orderBy(col("user_id"), col("day"))
  }

  // ---- DuckDB oracles ----------------------------------------------------

  private val ev = s"(${Tables.eventsSql})"

  /** Shared by `stream_snapshot_drain` (cold full-history fold) and
    * `stream_warmstart_drain` (batch seed + streamed delta): both must
    * equal the from-scratch per-user aggregate — exact integer
    * micro-unit sums and µs epochs keep the check order-free.
    */
  private val perUserSnapshotSql: String =
    s"""SELECT user_id, count(*) AS n_events,
       |       CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
       |            AS BIGINT) AS sum_micros,
       |       max(epoch_us(ts)) AS last_ts_micros
       |FROM $ev e GROUP BY 1 ORDER BY 1""".stripMargin

  val oracles: Map[String, String] = Map(
    "event_parse_json" ->
      s"""SELECT event_id, ts, user_id, event_type, value,
         |       CAST(json_extract(props, '$$.k') AS BIGINT) AS props_k
         |FROM $ev e WHERE json_valid(props) ORDER BY event_id""".stripMargin,
    // the oracle reproduces the post-parse values directly from the base
    // table (the JSON round-trip is the identity on them); the corrupt
    // row is dropped by the engine's PERMISSIVE null filter
    "event_nested_parse" ->
      s"""SELECT event_id,
         |       event_type AS source,
         |       ts,
         |       'user_' || user_id AS user_id,
         |       value AS metric,
         |       ${Tables.statusSql} AS status,
         |       substr(md5(CAST(event_id AS VARCHAR)), 1, 8) AS session_id,
         |       ['us-east', 'us-west', 'eu-west', 'ap-south']
         |         [(strpos('0123456789abcdef', substr(md5(CAST(event_id AS VARCHAR)), 1, 1)) - 1) % 4 + 1] AS region,
         |       5 AS n_attr_keys,
         |       ${Tables.statusSql} AS status_from_map
         |FROM $ev e ORDER BY event_id""".stripMargin,
    "event_json_envelope" ->
      s"""SELECT 'agg:' || event_type || ':1m:' || strftime(window_start, '%Y-%m-%dT%H:%M:%SZ') AS redis_key,
         |       event_type, window_start, n_events, sum_value
         |FROM (
         |  SELECT event_type, date_trunc('minute', ts) AS window_start,
         |         count(*) AS n_events, round(sum(value), 4) AS sum_value
         |  FROM $ev e GROUP BY 1, 2
         |) ORDER BY redis_key""".stripMargin,
    "events_dedup" ->
      s"""SELECT event_id, min(ts) AS ts, count(*) AS n_dups
         |FROM $ev e GROUP BY 1 ORDER BY 1""".stripMargin,
    // the drain feeds every event TWICE and must emit each exactly once,
    // so the oracle is simply the pristine events table (passthrough
    // columns, no arithmetic)
    "stream_dedup_drain" ->
      s"""SELECT event_id, ts, user_id, event_type, value
         |FROM $ev e ORDER BY event_id""".stripMargin,
    // the VARIANT round trip: the oracle recomputes from the source
    // column formulas with NO json — Spark must reproduce the same
    // sums through parse_json -> variant_get to hash-match
    "event_variant" ->
      s"""SELECT event_type, count(*) AS n,
         |       CAST(sum(CASE WHEN event_type = 'click'
         |                     THEN event_id % 97 END) AS BIGINT) AS sum_x,
         |       CAST(sum(CASE WHEN event_type = 'click'
         |                     THEN event_id % 53 END) AS BIGINT) AS sum_y,
         |       CAST(sum(CASE WHEN event_type = 'view'
         |                     THEN event_id % 1000 END) AS BIGINT) AS sum_ms,
         |       CAST(count(CASE WHEN event_type = 'view'
         |                       THEN 1 END) AS BIGINT) AS n_pages,
         |       CAST(sum(CASE WHEN event_type NOT IN ('click', 'view')
         |                     THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
         |                END) AS BIGINT) AS sum_cents
         |FROM $ev e GROUP BY 1 ORDER BY 1""".stripMargin,
    // the sketch-fold drain (StreamDrain.streamHllDrain): per-day
    // cumulative counts exact under the hash gate, estimate via the
    // same 5σ self-gate verdict hll_by_day uses
    "stream_hll_drain" ->
      s"""SELECT date_trunc('day', ts) AS day, count(*) AS n_events,
         |       count(DISTINCT user_id) AS n_users_exact, true AS day_ok
         |FROM $ev e GROUP BY 1 ORDER BY 1""".stripMargin,
    // the incremental-view drain's final per-user snapshot must equal a
    // from-scratch aggregate (fold∘batches = aggregate); exact integer
    // micro-unit sums and µs epochs keep the check order-free
    "stream_snapshot_drain" -> perUserSnapshotSql,
    // the same view over the OUT-OF-ORDER staging (rows arriving one
    // batch late within the watermark must extend restored keyed state)
    "stream_ooo_snapshot_drain" -> perUserSnapshotSql,
    // the statestore READER (StreamDrain.streamStateReaderDrain): rows
    // read directly out of the drained checkpoint's RocksDB store must
    // equal the same from-scratch aggregate
    "stream_state_reader" -> perUserSnapshotSql,
    // the MIGRATION drain (StreamDrain.streamWarmstartDrain): batch
    // seed over the first half + streamed delta must still equal the
    // from-scratch full aggregate, so the oracle is shared
    "stream_warmstart_drain" -> perUserSnapshotSql,
    // the KILL-AND-RESUME drain (StreamDrain.streamRestartDrain): a new
    // query resuming the same checkpoint over late-arriving chunks must
    // land on the same from-scratch aggregate — a lost or double-counted
    // batch on restart fails the hash
    "stream_restart_drain" -> perUserSnapshotSql,
    // DIRTY restart for the keyed-state family: the crashed attempt has
    // already committed state version 2, so the re-executed batch must
    // ROLL BACK to version 1 and refold — double-fold or version-skew
    // flips the exact integer snapshot sums against this same oracle
    "stream_dirty_restart_snapshot_drain" -> perUserSnapshotSql,
    "distinct_users" ->
      s"""SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
         |FROM $ev e GROUP BY 1 ORDER BY 1""".stripMargin,
    // the estimate itself is engine-specific; the oracle checks the exact
    // count and asserts the Spark side judged its own sketch in-tolerance
    "approx_distinct_users" ->
      s"""SELECT event_type, count(DISTINCT user_id) AS n_users_exact,
         |       true AS within_tolerance
         |FROM $ev e GROUP BY 1 ORDER BY 1""".stripMargin,
    // mergeable HLL rollup: the oracle checks the exact per-day and
    // total counts plus the two gate verdicts; sketch bytes/estimates
    // never cross engines
    "hll_by_day" ->
      s"""SELECT date_trunc('day', ts) AS day,
         |       count(DISTINCT user_id) AS n_users_exact,
         |       true AS day_ok,
         |       (SELECT count(DISTINCT user_id) FROM $ev e2) AS n_total_exact,
         |       true AS merged_ok
         |FROM $ev e GROUP BY 1 ORDER BY 1""".stripMargin,
    // theta set-operation sketches: oracle re-derives the exact pair
    // counts and the three gate verdicts; sketch bytes stay in-engine
    "theta_overlap" ->
      s"""WITH u AS (SELECT DISTINCT event_type, user_id FROM $ev e),
         |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM u GROUP BY 1),
         |p AS (
         |  SELECT a.event_type AS type_a, b.event_type AS type_b,
         |         CAST(count(*) AS BIGINT) AS n_intersect_exact
         |  FROM u a JOIN u b
         |    ON a.user_id = b.user_id AND a.event_type < b.event_type
         |  GROUP BY 1, 2
         |)
         |SELECT type_a, type_b, ta.n AS n_a_exact, tb.n AS n_b_exact,
         |       n_intersect_exact,
         |       ta.n + tb.n - n_intersect_exact AS n_union_exact,
         |       true AS intersect_ok, true AS union_ok, true AS diff_ok
         |FROM p JOIN t ta ON p.type_a = ta.event_type
         |       JOIN t tb ON p.type_b = tb.event_type
         |ORDER BY type_a, type_b""".stripMargin,
    // mergeable KLL rollup: oracle checks the exact nearest-rank p95s
    // (per day + corpus) and the two rank-error gate verdicts; sketch
    // bytes/estimates never cross engines
    "kll_by_day" ->
      s"""SELECT date_trunc('day', ts) AS day,
         |       CAST(count(*) AS BIGINT) AS n_values,
         |       list_sort(list(value))[CAST(floor(count(*) * 0.95) AS INT) + 1]
         |         AS p95_exact,
         |       true AS day_ok,
         |       (SELECT list_sort(list(value))[CAST(floor(count(*) * 0.95) AS INT) + 1]
         |        FROM $ev e2) AS p95_total_exact,
         |       true AS merged_ok
         |FROM $ev e GROUP BY 1 ORDER BY 1""".stripMargin,
    // rank-gated quantile sketch: the oracle checks the exact
    // interpolated p95 and the gate verdict, never the sketch value
    "approx_p95_gated" ->
      s"""SELECT event_type, count(*) AS n_values,
         |       round(quantile_cont(value, 0.95), 6) AS p95_exact,
         |       true AS within_tolerance
         |FROM $ev e GROUP BY 1 ORDER BY 1""".stripMargin,
    "users_click_and_purchase" ->
      s"""SELECT DISTINCT user_id FROM $ev e WHERE event_type = 'click'
         |INTERSECT
         |SELECT DISTINCT user_id FROM $ev e2 WHERE event_type = 'purchase'
         |ORDER BY user_id""".stripMargin,
    "users_view_not_purchase" ->
      s"""SELECT DISTINCT user_id, date_trunc('day', ts) AS day
         |FROM $ev e WHERE event_type = 'view'
         |EXCEPT
         |SELECT DISTINCT user_id, date_trunc('day', ts) AS day
         |FROM $ev e2 WHERE event_type = 'purchase'
         |ORDER BY user_id, day""".stripMargin
  )
}
