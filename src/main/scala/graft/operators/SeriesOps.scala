package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  // ---- DuckDB oracles ----------------------------------------------------

  private val ev = s"(${Tables.eventsSql})"

  val oracles: Map[String, String] = Map(
    "series_avg" ->
      s"""SELECT event_type, date_trunc('minute', ts) AS bucket, round(avg(value), 6) AS avg_value
         |FROM $ev e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "series_sum" ->
      s"""SELECT event_type, date_trunc('minute', ts) AS bucket, round(sum(value), 4) AS sum_value
         |FROM $ev e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "series_count" ->
      s"""SELECT event_type, date_trunc('minute', ts) AS bucket, count(*) AS n_events
         |FROM $ev e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "series_p95" ->
      s"""SELECT event_type, date_trunc('hour', ts) AS bucket, round(quantile_cont(value, 0.95), 6) AS p95_value
         |FROM $ev e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "series_filtered" ->
      s"""SELECT event_type, date_trunc('minute', ts) AS bucket, round(avg(value), 6) AS avg_value, count(*) AS n_events
         |FROM $ev e
         |WHERE ts BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-10 00:00:00'
         |  AND event_type IN ('click', 'purchase')
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
