package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic event-stream source (SURVEY §2.1 S7): the reference
  * producer's generator — 6 sources, metric ~ N(50,15) clamped ≥0 with a
  * 5% uniform-[100,500] outlier band, status correlated with metric
  * (`event_producer.py:38-103`) — re-expressed as deterministic column
  * expressions over Spark's `rate` streaming source (or `range` for
  * batch).
  *
  * Determinism: draws come from `xxhash64(value, salt)` scaled to [0,1),
  * not `rand()` — restart-stable, so a recovered streaming query
  * regenerates identical events (rand() would violate exactly-once
  * regeneration after checkpoint recovery).
  */
object EventGenerator {

  private val Sources =
    array(Seq("web", "mobile", "api", "device", "service-a", "service-b")
      .map(lit): _*)

  /** Uniform [0,1) from a deterministic 64-bit hash of (id, salt). */
  private def u(idCol: org.apache.spark.sql.Column, salt: Int) =
    (pmod(xxhash64(idCol, lit(salt)), lit(1000000007L)).cast("double")
      / 1000000007.0)

  private def withEventColumns(base: DataFrame): DataFrame = {
    val id = col("event_id")
    // Box-Muller from two deterministic uniforms (avoid u1=0)
    val u1 = greatest(u(id, 1), lit(1e-12))
    val u2 = u(id, 2)
    val normal = sqrt(lit(-2.0) * log(u1)) * cos(lit(2.0 * math.Pi) * u2)
    val isOutlier = u(id, 3) < 0.05
    val metric = round(
      when(isOutlier, lit(100.0) + u(id, 4) * 400.0)
        .otherwise(greatest(lit(0.0), normal * 15.0 + 50.0)),
      2)
    // status correlated with metric (event_producer.py:59-69): high
    // metric ⇒ 30/40/30 ok/warning/error, else 80/15/5
    val d = u(id, 5)
    val status = when(col("metric") > 100,
                      when(d < 0.3, "ok").when(d < 0.7, "warning")
                        .otherwise("error"))
      .otherwise(when(d < 0.8, "ok").when(d < 0.95, "warning")
        .otherwise("error"))
    base
      .withColumn("source",
                  element_at(Sources, pmod(xxhash64(id), lit(6)).cast("int") + 1))
      .withColumn("metric", metric)
      .withColumn("status", status)
      .withColumn("user_id",
                  concat(lit("user_"), (pmod(xxhash64(id, lit(6)), lit(9000)) + 1000)))
  }

  /** Streaming form: `rowsPerSecond` events/sec from the rate source. */
  def rateEvents(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    withEventColumns(
      spark.readStream
        .format("rate")
        .option("rowsPerSecond", rowsPerSecond.toString)
        .load()
        .select(col("value").as("event_id"), col("timestamp").as("ts")))

  /** Batch form: `n` events over a fixed window starting at `startIso`. */
  def batchEvents(spark: SparkSession, n: Long, startIso: String): DataFrame =
    withEventColumns(
      spark
        .range(n)
        .select(
          col("id").as("event_id"),
          (lit(startIso).cast("timestamp") +
            make_dt_interval(lit(0), lit(0), lit(0), col("id") * 0.25))
            .as("ts")))
}
