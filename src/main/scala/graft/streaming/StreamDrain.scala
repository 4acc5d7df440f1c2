package graft.streaming

import java.nio.file.{Files, Path}

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
  * twin. Four legs, four oracles: windowed aggregation
  * ([[streamKpiDrain]] — `EventAggregationJob.java:79-96`), the keyed
  * rolling-stats detector ([[streamAlertsDrain]] —
  * `AnomalyDetectionJob.java:279-368`), and the EWMA / CUSUM
  * T-series processors ([[streamEwmaDrain]] / [[streamCusumDrain]]).
  */
object StreamDrain {

  /** Per-run work dirs (staged events copy, store, checkpoint) are
    * registered for recursive deletion at JVM exit — the drains run
    * once per Verify and ~4× per query per Bench, and without cleanup
    * each run would leave a full staged copy of the events table in
    * /tmp, accumulating without bound. (Deletion cannot happen inside
    * the query itself: the returned DataFrame lazily reads the store
    * until the caller consumes it.)
    */
  private def tempWorkDir(prefix: String): String = {
    val dir = Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(dir)))
    dir.toString
  }

  private def deleteTree(root: Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(root)) {
      Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(p => try Files.deleteIfExists(p) catch { case _: Throwable => })
    }
  }

  /** Stage the events table as a SINGLE parquet file and return its
    * streaming frame — one file ⇒ one micro-batch under AvailableNow,
    * which is what makes the order-dependent drains below fold in
    * exactly the batch analog's (ts, event_id) total order (the
    * processors sort within a batch; multi-batch ordering and the
    * watermark late-drop path are exercised separately in
    * StreamingParitySpec).
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

  /** Drain an update-mode stream into a parquet store with the batch id
    * attached to every emission, and return the store read back. */
  private def drainToStore(spark: SparkSession, streamed: DataFrame,
                           work: String): DataFrame = {
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
    spark.read.parquet(store)
  }

  /** [[drainToStore]] keeping only the LAST emission per key — the
    * provisional-pane contract every update-mode leg uses (each batch
    * re-emits a key's current value; the final batch's row reflects all
    * data seen).
    */
  private def drainLastPerKey(spark: SparkSession, streamed: DataFrame,
                              work: String, keyCols: Seq[String]): DataFrame = {
    val latest = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("batch_id").desc)
    drainToStore(spark, streamed, work)
      .withColumn("rn", row_number().over(latest))
      .filter(col("rn") === 1)
  }

  /** Run the StreamJob sliding-KPI leg ([[EventPipeline.slidingKpi]]:
    * watermark → 1m/10s windowed agg → update-mode foreachBatch store)
    * with `Trigger.AvailableNow` over the events table, then read the
    * hot store back projected to the batch
    * [[graft.operators.KpiOps.kpiSliding]] schema — the shared oracle
    * SQL hash-checks the STREAMED panes against DuckDB. Pane sums ride
    * exact micro-unit longs on all three sides (streamed state-store
    * merge order, batch partition order, oracle ordered sum), so the
    * gate is immune to summation-order ulp flips.
    *
    * Scale: the production form swaps the trigger for a processing-time
    * trigger and the source for Kafka — the store then holds one row
    * per (type, pane) updated in place; this drain is the bounded,
    * hash-checkable rehearsal of exactly that topology.
    */
  def streamKpiDrain(spark: SparkSession, dir: String): DataFrame = {
    val work = tempWorkDir("graft_kpi_drain")
    drainLastPerKey(
      spark,
      EventPipeline.slidingKpi(stagedStream(spark, dir, work)),
      work, Seq("event_type", "window_start"))
      .select(
        col("event_type"),
        col("window_start"),
        col("window_end"),
        col("n_events"),
        col("sum_value"),
        col("avg_value"),
        col("error_count"),
        round(col("error_count") / col("n_events"), 6).as("error_rate"))
      .orderBy(col("event_type"), col("window_start"))
  }

  /** Run the StreamJob anomaly leg ([[EventPipeline.anomalyStream]]:
    * keyed flatMapGroupsWithState rolling-stats detector — the
    * reference's `RichFlatMapFunction` + `ValueState` job) through an
    * actual `writeStream` drain and read the fired-alert store back
    * projected to the batch [[graft.operators.AnomalyOps.anomalyAlerts]]
    * schema, sharing its oracle SQL — the stateful-processor leg under
    * the hash gate.
    *
    * Each event is scored exactly once when it arrives, so no
    * last-emission dedup is needed; the description column is rebuilt
    * from the streamed r4 fields with the same format expression the
    * batch query uses (both sides format the same 4-dp doubles, so the
    * strings agree byte-for-byte).
    */
  def streamAlertsDrain(spark: SparkSession, dir: String): DataFrame = {
    val work = tempWorkDir("graft_alerts_drain")
    drainToStore(
      spark,
      EventPipeline
        .anomalyStream(spark, stagedStream(spark, dir, work))
        .filter(_.is_anomaly)
        .toDF(),
      work)
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

  /** The EWMA leg ([[EventPipeline.ewmaStream]]) through an actual
    * writeStream drain, final level per key read back against the batch
    * [[graft.operators.SeriesOps.seriesEwma]] oracle — bit-identical by
    * the micro-unit bucket-sum construction (see [[EwmaProcessor]]).
    */
  def streamEwmaDrain(spark: SparkSession, dir: String): DataFrame = {
    val work = tempWorkDir("graft_ewma_drain")
    drainLastPerKey(
      spark,
      EventPipeline.ewmaStream(spark, stagedStream(spark, dir, work)).toDF(),
      work, Seq("event_type"))
      .select(col("event_type"), col("n_buckets"), col("ewma_value"))
      .orderBy(col("event_type"))
  }

  /** The CUSUM leg ([[EventPipeline.cusumStream]] with offline-learned
    * baselines) through an actual writeStream drain, final shift counts
    * per key read back against the batch `cusum_changepoints` oracle
    * (minus the baseline columns the streamed counts don't carry).
    */
  def streamCusumDrain(spark: SparkSession, dir: String): DataFrame = {
    val work = tempWorkDir("graft_cusum_drain")
    val baselines = graft.operators.SeriesOps.cusumBaselines(spark, dir)
    drainLastPerKey(
      spark,
      EventPipeline
        .cusumStream(spark, stagedStream(spark, dir, work), baselines)
        .toDF(),
      work, Seq("event_type"))
      .select(col("event_type"), col("n_buckets"), col("n_shifts_up"),
              col("n_shifts_down"))
      .orderBy(col("event_type"))
  }
}
