package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (`/root/testdata/sf*`).
  *
  * All schemas are fixed and known (see TESTDATA.md); we never use
  * `inferSchema`. The only normalization applied at load time is the
  * `events.ts` column: the parquet files store µs timestamps WITHOUT the
  * UTC-adjusted flag, which Spark reads as `TIMESTAMP_NTZ`; every session
  * here pins `spark.sql.session.timeZone=UTC`, so casting to the session
  * `TIMESTAMP` type is value-identical and keeps the whole downstream
  * surface (timestamp literals, `window()`, `date_trunc`) on one type.
  * DuckDB reads the same files as naive `TIMESTAMP` — the oracle and
  * Spark see identical wall-clock values.
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
  def events(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .parquet(s"$dir/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))

  /** Events restricted to a time range, with the predicate applied to the
    * RAW `ts` column BEFORE the NTZ→session-type cast — a filter on
    * `cast(ts)` is opaque to parquet filter pushdown, so filtering after
    * conversion reads every row group; this form pushes
    * `GreaterThanOrEqual/LessThanOrEqual(ts, …)` into the scan and prunes
    * row groups by min/max stats (the 100 TB path for time-sliced reads).
    * The bound literals are typed to match the stored column (NTZ for the
    * driver tables, session TIMESTAMP for test fixtures written by
    * Spark) so the comparison stays pushdown-eligible either way.
    */
  def eventsTimeRange(spark: SparkSession,
                      dir: String,
                      fromIso: String,
                      toIso: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val litType = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.TimestampNTZType => "timestamp_ntz"
      case _                                           => "timestamp"
    }
    raw
      .filter(col("ts") >= lit(fromIso).cast(litType) &&
        col("ts") <= lit(toIso).cast(litType))
      .withColumn("ts", col("ts").cast("timestamp"))
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
