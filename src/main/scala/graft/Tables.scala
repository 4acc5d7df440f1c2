package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (`/root/testdata/sf*`).
  *
  * All schemas are fixed and known (see TESTDATA.md); we never use
  * `inferSchema`. The only normalization applied at load time is the
  * `events.ts` column: the parquet files store `TIMESTAMP(NANOS)`, which
  * Spark's vectorized reader rejects outright. We read it as a raw long
  * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to microseconds —
  * the same truncation DuckDB's `CAST(ts AS TIMESTAMP)` performs, so
  * oracle comparisons line up exactly.
  *
  * Scale notes: these are plain columnar scans; predicates and column
  * pruning push down to parquet (verify with `.explain` →
  * `PushedFilters`/`ReadSchema`). At cluster scale the same loaders work
  * over directory-partitioned datasets unchanged.
  */
object Tables {

  /** Event stream table — the analog of the reference's `events.v1` topic
    * (reference: `ingestors/kafka-producer/event_producer.py:47-103`).
    * Columns: event_id, ts (µs), user_id, event_type, value, props(JSON).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read
      .parquet(s"$dir/events.parquet")
      // integer ns→µs division (expr `div`): ns since 2024 exceed the
      // 53-bit double mantissa, so a float division would corrupt values.
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Events restricted to a time range, with the predicate applied to the
    * RAW nanosecond long before the µs conversion — `timestamp_micros(ts
    * div 1000)` is opaque to parquet filter pushdown, so filtering after
    * conversion reads every row group; this form pushes
    * `GreaterThanOrEqual/LessThanOrEqual(ts, …)` into the scan and prunes
    * row groups by min/max stats (the 100 TB path for time-sliced reads).
    */
  def eventsTimeRange(spark: SparkSession,
                      dir: String,
                      fromIso: String,
                      toIso: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def ns(iso: String): Long =
      java.time.LocalDateTime
        .parse(iso.replace(' ', 'T'))
        .toInstant(java.time.ZoneOffset.UTC)
        .toEpochMilli * 1000000L
    // bounds chosen so the raw-ns compare is EXACTLY equivalent to the
    // µs-truncated BETWEEN: floor(ns/1000) ∈ [from_µs, to_µs] ⟺
    // ns ∈ [from_µs·1000, to_µs·1000 + 999]
    spark.read
      .parquet(s"$dir/events.parquet")
      .filter(col("ts") >= ns(fromIso) && col("ts") <= ns(toIso) + 999L)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** The reference flattens each event to typed fields and derives a
    * status from the metric (`event_producer.py:59-69` correlates status
    * with metric magnitude). We mirror that as a deterministic rule so the
    * DuckDB oracle can reproduce it: value>=100 → error (the producer's
    * outlier band), >=75 → warning, else ok.
    */
  def eventsWithStatus(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).withColumn(
      "status",
      when(col("value") >= 100, "error")
        .when(col("value") >= 75, "warning")
        .otherwise("ok"))

  /** Same status rule as ANSI SQL for oracle queries. */
  val statusSql: String =
    "CASE WHEN value >= 100 THEN 'error' WHEN value >= 75 THEN 'warning' ELSE 'ok' END"

  /** Events FROM-clause fragment for DuckDB oracles: µs-truncated ts. */
  val eventsSql: String =
    "SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events"

  def documents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")

  def orders(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/orders.parquet")

  def customer(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/customer.parquet")

  def supplier(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/supplier.parquet")

  def part(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/part.parquet")

  def nation(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/nation.parquet")

  def region(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/region.parquet")
}
