package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.functions.Rounding.round

/** Oracle-gated streaming drains: queries whose Spark side actually
  * executes `writeStream` — the same micro-batch machinery, state
  * store, and sink path the always-on job runs — then reads the drained
  * store back as the query result, so the driver's DuckDB hash gate
  * verifies a streaming execution end-to-end instead of only a batch
  * twin (reference semantics: `EventAggregationJob.java:79-96`, the
  * Flink sliding-KPI job whose sink this store stands in for).
  */
object StreamDrain {

  /** Run the StreamJob sliding-KPI leg ([[EventPipeline.slidingKpi]]:
    * watermark → 1m/10s windowed agg → update-mode foreachBatch store)
    * with `Trigger.AvailableNow` over the events table, then read the
    * hot store back projected to the batch
    * [[graft.operators.KpiOps.kpiSliding]] schema — the shared oracle
    * SQL hash-checks the STREAMED panes against DuckDB.
    *
    * Determinism: the stage dir is written as ONE parquet file so the
    * file source drains in a single micro-batch — every pane emits
    * exactly once and the watermark can drop nothing (the multi-batch
    * late-drop path is exercised separately in StreamingParitySpec).
    * The read-back still keeps only the LAST emission per pane
    * (update-mode panes re-emit when a later batch touches them), so
    * the query stays correct if the drain ever runs multi-batch.
    *
    * Scale: the production form swaps the trigger for a processing-time
    * trigger and the source for Kafka — the store then holds one row
    * per (type, pane) updated in place; this drain is the bounded,
    * hash-checkable rehearsal of exactly that topology.
    */
  /** Run the StreamJob anomaly leg ([[EventPipeline.anomalyStream]]:
    * keyed flatMapGroupsWithState rolling-stats detector — the
    * reference's `RichFlatMapFunction` + `ValueState` job) through an
    * actual `writeStream` drain and read the fired-alert store back
    * projected to the batch [[graft.operators.AnomalyOps.anomalyAlerts]]
    * schema, sharing its oracle SQL — the second streaming leg under
    * the DuckDB hash gate, and the stateful-processor one (the KPI
    * drain exercises the windowed-aggregation path).
    *
    * Determinism: the detector is order-dependent (rolling window), and
    * the processor sorts by (ts, event_id) WITHIN a batch — so the
    * single-file stage (one micro-batch) makes the fold order exactly
    * the batch analog's total order. Each event is scored once when it
    * arrives, so no cross-batch dedup is needed on read-back; the
    * description column is reconstructed from the streamed r4 fields
    * with the same format expression the batch query uses (both sides
    * format the same 4-dp doubles, so the strings agree byte-for-byte).
    */
  def streamAlertsDrain(spark: SparkSession, dir: String): DataFrame = {
    val work = Files.createTempDirectory("graft_alerts_drain").toString
    val stage = s"$work/staged_events"
    graft.Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1)
      .write.mode("overwrite").parquet(stage)
    val store = s"$work/alerts"
    val q = EventPipeline
      .anomalyStream(spark, spark.readStream
        .schema(EventPipeline.eventSchema)
        .parquet(stage))
      .filter(_.is_anomaly)
      .toDF()
      .writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", s"$work/ckpt_alerts")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.write.mode("append").parquet(store)
        ()
      }
      .start()
    q.awaitTermination()
    spark.read
      .parquet(store)
      .withColumn(
        "description",
        format_string(
          "Anomaly detected in %s: value=%.2f, mean=%.2f, z-score=%.2f, mad-score=%.2f",
          col("event_type"),
          round(col("value"), 2),
          round(col("mean_value"), 2),
          round(col("z_score"), 2),
          round(col("mad_score"), 2)))
      .select(col("event_id"), col("event_type"), col("ts"), col("value"),
              col("z_score"), col("mad_score"), col("severity"),
              col("anomaly_type"), col("description"))
      .orderBy(col("event_type"), col("ts"), col("event_id"))
  }

  /** Stage the events table as a SINGLE parquet file and return its
    * streaming frame — one file ⇒ one micro-batch under AvailableNow,
    * which is what makes the order-dependent drains below fold in
    * exactly the batch analog's (ts, event_id) total order (the
    * processors sort within a batch; multi-batch ordering is exercised
    * separately in StreamingParitySpec).
    */
  private def stagedStream(spark: SparkSession, dir: String,
                           work: String): DataFrame = {
    val stage = s"$work/staged_events"
    graft.Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1)
      .write.mode("overwrite").parquet(stage)
    spark.readStream.schema(EventPipeline.eventSchema).parquet(stage)
  }

  /** Drain an update-mode keyed stream into a store and read back the
    * LAST emission per key — the provisional-pane contract every
    * flatMapGroupsWithState leg here uses (each batch re-emits a key's
    * current value; the final batch's row reflects all data).
    */
  private def drainLastPerKey(spark: SparkSession, streamed: DataFrame,
                              work: String, keyCol: String): DataFrame = {
    val store = s"$work/store"
    val q = streamed.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.withColumn("batch_id", lit(id)).write.mode("append").parquet(store)
        ()
      }
      .start()
    q.awaitTermination()
    val latest = Window.partitionBy(col(keyCol)).orderBy(col("batch_id").desc)
    spark.read
      .parquet(store)
      .withColumn("rn", row_number().over(latest))
      .filter(col("rn") === 1)
  }

  /** The EWMA leg ([[EventPipeline.ewmaStream]]) through an actual
    * writeStream drain, final level per key read back against the batch
    * [[graft.operators.SeriesOps.seriesEwma]] oracle — bit-identical by
    * the micro-unit bucket-sum construction (see [[EwmaProcessor]]).
    */
  def streamEwmaDrain(spark: SparkSession, dir: String): DataFrame = {
    val work = Files.createTempDirectory("graft_ewma_drain").toString
    drainLastPerKey(
      spark,
      EventPipeline.ewmaStream(spark, stagedStream(spark, dir, work)).toDF(),
      work, "event_type")
      .select(col("event_type"), col("n_buckets"), col("ewma_value"))
      .orderBy(col("event_type"))
  }

  /** The CUSUM leg ([[EventPipeline.cusumStream]] with offline-learned
    * baselines) through an actual writeStream drain, final shift counts
    * per key read back against the batch `cusum_changepoints` oracle
    * (minus the baseline columns the streamed counts don't carry).
    */
  def streamCusumDrain(spark: SparkSession, dir: String): DataFrame = {
    val work = Files.createTempDirectory("graft_cusum_drain").toString
    val baselines = graft.operators.SeriesOps.cusumBaselines(spark, dir)
    drainLastPerKey(
      spark,
      EventPipeline
        .cusumStream(spark, stagedStream(spark, dir, work), baselines)
        .toDF(),
      work, "event_type")
      .select(col("event_type"), col("n_buckets"), col("n_shifts_up"),
              col("n_shifts_down"))
      .orderBy(col("event_type"))
  }

  def streamKpiDrain(spark: SparkSession, dir: String): DataFrame = {
    val work = Files.createTempDirectory("graft_kpi_drain").toString
    val stage = s"$work/staged_events"
    graft.Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1)
      .write.mode("overwrite").parquet(stage)
    val store = s"$work/hot_aggregates"
    val q = EventPipeline
      .slidingKpi(spark.readStream
        .schema(EventPipeline.eventSchema)
        .parquet(stage))
      .writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", s"$work/ckpt_kpi")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.withColumn("batch_id", lit(id))
          .write.mode("append").parquet(store)
        ()
      }
      .start()
    q.awaitTermination()
    val latest = Window
      .partitionBy(col("event_type"), col("window_start"))
      .orderBy(col("batch_id").desc)
    spark.read
      .parquet(store)
      .withColumn("rn", row_number().over(latest))
      .filter(col("rn") === 1)
      .select(
        col("event_type"),
        col("window_start"),
        col("window_end"),
        col("n_events"),
        round(col("sum_value"), 4).as("sum_value"),
        round(col("avg_value"), 6).as("avg_value"),
        col("error_count"),
        round(col("error_count") / col("n_events"), 6).as("error_rate"))
      .orderBy(col("event_type"), col("window_start"))
  }
}
