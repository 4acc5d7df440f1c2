package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** HyperLogLog++ distinct estimate — the 100 TB path for count-distinct
    * KPIs (constant memory per group vs the exact two-phase aggregate).
    * Rows-only check: sketch estimates are engine-specific by design.
    */
  def approxDistinctUsers(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.01).as("n_users_approx"))
      .orderBy(col("event_type"))

  // ---- DuckDB oracles ----------------------------------------------------

  private val ev = s"(${Tables.eventsSql})"

  val oracles: Map[String, String] = Map(
    "event_parse_json" ->
      s"""SELECT event_id, ts, user_id, event_type, value,
         |       CAST(json_extract(props, '$$.k') AS BIGINT) AS props_k
         |FROM $ev e WHERE json_valid(props) ORDER BY event_id""".stripMargin,
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
    "distinct_users" ->
      s"""SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
         |FROM $ev e GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
