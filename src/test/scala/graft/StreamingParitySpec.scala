package graft

import java.sql.Timestamp
import graft.operators.AnomalyOps
import graft.streaming._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming ↔ batch parity (SURVEY §7 hard part 6): the
  * flatMapGroupsWithState anomaly processor fed the sf0.001 events in
  * event-time order must produce exactly the batch analog's
  * (window-function) scores — same rolling buffers, same thresholds,
  * same severities. Also exercises the sliding-window KPI stream with
  * watermark advancement and late-data drop (T1/T2/W1).
  */
class StreamingParitySpec extends SparkSpec {

  test("streaming anomaly processor matches the batch window analog") {
    val session = spark
    import session.implicits._

    // all events in event-time order, split across 3 micro-batches
    val events = Tables
      .events(spark, sf("sf0.001"))
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
      .collect()
      .sortBy(e => (e.ts.getTime, e.event_id))

    val input = MemoryStream[Event](spark, 2)
    val alerts = EventPipeline.anomalyStream(spark, input.toDF())
    val q = alerts.writeStream
      .format("memory")
      .queryName("alerts_parity")
      .outputMode(OutputMode.Update)
      .start()
    try {
      events.grouped(400).foreach { batch =>
        input.addData(batch.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark
      .table("alerts_parity")
      .as[AnomalyAlert]
      .collect()
      .map(a => (a.event_id, a.n_samples, a.z_score, a.mad_score, a.severity,
                 a.anomaly_type))
      .toSet

    val batchAnalog = AnomalyOps
      .anomalyScore(spark, sf("sf0.001"))
      .selectExpr("event_id", "n_samples", "z_score", "mad_score", "severity",
                  "anomaly_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
                 r.getString(4), r.getString(5)))
      .toSet

    assert(streamed.size == batchAnalog.size)
    assert(streamed == batchAnalog)
  }

  test("streaming EWMA final levels equal the batch series_ewma exactly") {
    val session = spark
    import session.implicits._
    val events = Tables
      .events(spark, sf("sf0.001"))
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
      .collect()
      .sortBy(e => (e.ts.getTime, e.event_id))

    val input = MemoryStream[Event](spark, 3)
    val levels = EventPipeline.ewmaStream(spark, input.toDF())
    val q = levels.writeStream
      .format("memory")
      .queryName("ewma_parity")
      .outputMode(OutputMode.Update)
      .start()
    try {
      events.grouped(250).foreach { batch =>
        input.addData(batch.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    // memory sink in update mode appends every pane: keep the LAST
    // emission per key (MemoryStream preserves batch order)
    val streamed = spark
      .table("ewma_parity")
      .as[graft.streaming.EwmaProcessor.EwmaLevel]
      .collect()
      .zipWithIndex
      .groupBy(_._1.event_type)
      .map { case (_, rows) => rows.maxBy(_._2)._1 }
      .map(l => (l.event_type, l.n_buckets, l.ewma_value))
      .toSet

    val batch = operators.SeriesOps
      .seriesEwma(spark, sf("sf0.001"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet

    assert(streamed == batch)
  }

  test("streaming CUSUM shift counts equal the batch cusum_changepoints") {
    val session = spark
    import session.implicits._
    val events = Tables
      .events(spark, sf("sf0.001"))
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
      .collect()
      .sortBy(e => (e.ts.getTime, e.event_id))
    val baselines = operators.SeriesOps.cusumBaselines(spark, sf("sf0.001"))

    val input = MemoryStream[Event](spark, 31)
    val counts = EventPipeline.cusumStream(spark, input.toDF(), baselines)
    val q = counts.writeStream
      .format("memory")
      .queryName("cusum_parity")
      .outputMode(OutputMode.Update)
      .start()
    try {
      events.grouped(200).foreach { batch =>
        input.addData(batch.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark
      .table("cusum_parity")
      .as[graft.streaming.CusumProcessor.CusumCounts]
      .collect()
      .zipWithIndex
      .groupBy(_._1.event_type)
      .map { case (_, rows) => rows.maxBy(_._2)._1 }
      .map(c => (c.event_type, c.n_buckets, c.n_shifts_up, c.n_shifts_down))
      .toSet

    val batch = operators.SeriesOps
      .cusumChangepoints(spark, sf("sf0.001"))
      .collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_buckets"),
                 r.getAs[Long]("n_shifts_up"),
                 r.getAs[Long]("n_shifts_down")))
      .toSet

    assert(streamed == batch)
  }

  test("streaming transitions aggregate to the batch lead-window counts") {
    val session = spark
    import session.implicits._
    val events = Tables
      .events(spark, sf("sf0.001"))
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
      .collect()
      .sortBy(e => (e.ts.getTime, e.event_id))

    val input = MemoryStream[Event](spark, 4)
    val trans = EventPipeline.transitionStream(spark, input.toDF())
    val q = trans.writeStream
      .format("memory")
      .queryName("trans_parity")
      .outputMode(OutputMode.Update)
      .start()
    try {
      events.grouped(300).foreach { batch =>
        input.addData(batch.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark
      .table("trans_parity")
      .groupBy("prev_type", "next_type")
      .count()
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet

    val batch = operators.FunnelOps
      .eventTransitions(spark, sf("sf0.001"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet

    assert(streamed == batch)
  }

  test("sliding-window KPI stream aggregates and drops late data") {
    val session = spark
    import session.implicits._

    def ev(id: Long, t: String, typ: String, v: Double): Event =
      Event(id, Timestamp.valueOf(t), 1L, typ, v)

    val input = MemoryStream[Event](spark, 2)
    val kpi = EventPipeline.slidingKpi(input.toDF())
    val q = kpi.writeStream
      .format("memory")
      .queryName("kpi_stream")
      .outputMode(OutputMode.Update)
      .start()
    try {
      input.addData(
        ev(1, "2024-01-01 00:00:05", "web", 10.0),
        ev(2, "2024-01-01 00:00:15", "web", 110.0))
      q.processAllAvailable()
      // advance watermark far past the first windows…
      input.addData(ev(3, "2024-01-01 00:10:00", "web", 50.0))
      q.processAllAvailable()
      // …then a very late event: must be dropped from closed windows
      input.addData(ev(4, "2024-01-01 00:00:20", "web", 999.0))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark
      .table("kpi_stream")
      .selectExpr("window_start", "n_events", "sum_value", "error_count")
      .as[(Timestamp, Long, Double, Long)]
      .collect()

    // pane [00:00:00,00:01:00) saw events 1+2 (error: value>=100); the
    // late event 4 (999.0) must not appear in any emitted pane update
    val pane0 = rows
      .filter(_._1 == Timestamp.valueOf("2024-01-01 00:00:00"))
      .maxBy(_._2)
    assert(pane0._2 == 2 && pane0._3 == 120.0 && pane0._4 == 1)
    assert(!rows.exists(_._3 >= 999.0), "late event leaked into a pane")

    // event 1 at :05 belongs to exactly 6 sliding panes (starts :59:10…:00:00)
    val panesWithEvent1 = rows.map(_._1).distinct
      .count(ws => {
        val s = ws.getTime
        val t = Timestamp.valueOf("2024-01-01 00:00:05").getTime
        t >= s && t < s + 60000
      })
    assert(panesWithEvent1 == 6)
  }

  test("StreamJob end-to-end: sliding KPI panes match the batch query") {
    val session = spark
    import session.implicits._
    val out = java.nio.file.Files.createTempDirectory("sj").toString
    val counts = streaming.StreamJob.run(spark, sf("sf0.001"), out)
    assert(counts("alerts") > 0 && counts("fired_alerts") > 0)

    // TTL'd drain: state rows from pass 1 were evicted by the TTL sweep,
    // and the replay pass re-admitted events whose dedup state expired —
    // the end-to-end proof that graft.state.ttl bounds the store. The
    // main drains run at the no-TTL default, so every count below this
    // block is reference parity, unchanged.
    assert(counts("ttl_evicted") > 0,
           s"TTL sweep removed no state rows: $counts")
    assert(counts("ttl_readmitted") > 0,
           s"no replay was re-admitted after TTL expiry: $counts")

    // routing invariant: the streamed channel dispatch equals the batch
    // rules join applied to the fired-alert store it consumed
    val fired = spark.read.parquet(s"$out/fired_alerts")
    val expectedRouted = fired
      .join(broadcast(graft.operators.AnomalyOps.alertRules(spark)
              .filter(col("enabled"))),
            col("severity") === col("severity_threshold") &&
              (size(col("rule_sources")) === 0 ||
                array_contains(col("rule_sources"), col("event_type"))))
      .count()
    assert(counts("routed") == expectedRouted && expectedRouted > 0)

    // final pane values from the hot store == batch sliding KPI query
    // (update mode re-emits growing panes; counts are monotone, so the
    // max update per key is the final value)
    val streamed = spark.read.parquet(s"$out/hot_aggregates")
      .select("key", "value").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val batch = graft.operators.KpiOps.kpiSliding(spark, sf("sf0.001"))
    val batchPanes = batch
      .select(concat_ws(":", lit("agg"), col("event_type"), lit("1m"),
                        date_format(col("window_start"),
                                    "yyyy-MM-dd'T'HH:mm:ss'Z'")).as("key"),
              col("n_events"))
      .as[(String, Long)].collect().toMap
    assert(streamed.keySet == batchPanes.keySet)
    // spot-check pane counts embedded in the JSON envelopes
    val parsed = streamed.view.mapValues { jsons =>
      jsons.flatMap(j =>
        """"n_events":(\d+)""".r.findFirstMatchIn(j).map(_.group(1).toLong))
        .maxOption
    }.toMap
    batchPanes.foreach { case (k, n) =>
      assert(parsed(k).contains(n), s"pane $k: ${parsed(k)} vs $n")
    }
  }

  test("streaming sessionization emits the batch sessions once watermark passes") {
    val session = spark
    import session.implicits._

    val events = Tables
      .events(spark, sf("sf0.001"))
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
      .collect()
      .sortBy(e => (e.ts.getTime, e.event_id))

    val input = MemoryStream[Event](spark, 4)
    val sessions = EventPipeline.sessionStream(input.toDF())
    val q = sessions.writeStream
      .format("memory")
      .queryName("sessions_parity")
      .outputMode(OutputMode.Append)
      .start()
    try {
      events.grouped(2000).foreach { batch =>
        input.addData(batch.toSeq)
        q.processAllAvailable()
      }
      // sentinel far past every session end: advances the watermark so
      // all real sessions close and emit (append mode); its own session
      // stays pending and is excluded below
      val maxTs = events.map(_.ts.getTime).max
      input.addData(Event(-1L, new Timestamp(maxTs + 7200000L), -1L, "x", 1.0))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark
      .table("sessions_parity")
      .filter(col("user_id") =!= -1L)
      .select(col("user_id"), col("session_start"), col("session_end"),
              col("n_events"), round(col("sum_value"), 4).as("sum_value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
                 r.getLong(3), r.getDouble(4)))
      .toSet

    val batch = graft.operators.TemporalOps.sessionize(spark, sf("sf0.001"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
                 r.getLong(3), r.getDouble(4)))
      .toSet
    assert(streamed == batch)
  }

  test("stream-stream interval join matches the batch attribution join") {
    val session = spark
    import session.implicits._
    val events = Tables
      .events(spark, sf("sf0.001"))
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
      .collect()
      .sortBy(e => (e.ts.getTime, e.event_id))

    val input = MemoryStream[Event](spark, 8)
    val joined = EventPipeline.attributionStream(input.toDF())
    val q = joined.writeStream
      .format("memory")
      .queryName("attrib_parity")
      .outputMode(OutputMode.Append)
      .start()
    try {
      events.grouped(2000).foreach { batch =>
        input.addData(batch.toSeq)
        q.processAllAvailable()
      }
      // flush: advance both watermarks beyond every live interval
      val maxTs = events.map(_.ts.getTime).max
      input.addData(
        Event(-1L, new Timestamp(maxTs + 3600000L), -1L, "click", 1.0),
        Event(-2L, new Timestamp(maxTs + 3600000L), -1L, "purchase", 1.0))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark
      .table("attrib_parity")
      .filter(col("user_id") =!= -1L)
      .select("user_id", "click_id", "purchase_id")
      .as[(Long, Long, Long)].collect().toSet
    val batch = graft.operators.TemporalOps
      .clickAttribution(spark, sf("sf0.001"))
      .select("user_id", "click_id", "purchase_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("cooldown processor enforces chained per-key suppression") {
    val session = spark
    import session.implicits._

    def alert(id: Long, t: String): AnomalyAlert =
      AnomalyAlert(id, "web", Timestamp.valueOf(t), 200.0, 50, 50, 5, 50, 3,
                   5.0, 5.0, is_anomaly = true, "critical", "z-score")

    val input = MemoryStream[AnomalyAlert](spark, 2)
    val fired = EventPipeline.cooldownStream(spark, input.toDS())
    val q = fired.writeStream
      .format("memory")
      .queryName("fired_alerts")
      .outputMode(OutputMode.Update)
      .start()
    try {
      input.addData(
        alert(1, "2024-01-01 00:00:00"), // fires
        alert(2, "2024-01-01 00:03:00"), // suppressed (3 min < 5 min)
        alert(3, "2024-01-01 00:06:00"), // suppressed: 6 min after #1? NO —
        // chained semantics: last FIRED is #1 at 00:00, 6 min ≥ 5 min → fires
        alert(4, "2024-01-01 00:08:00")  // 2 min after #3 fired → suppressed
      )
      q.processAllAvailable()
    } finally q.stop()

    val ids = spark.table("fired_alerts").select("event_id")
      .as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 3L))
  }

  test("kafka produce path is real code; only the connector jar is absent") {
    val session = spark
    import session.implicits._
    val input = MemoryStream[Event](spark, 2)
    val envelope = EventPipeline.toKafkaEnvelope(
      EventPipeline.slidingKpi(input.toDF()))
    val ckpt = java.nio.file.Files.createTempDirectory("kafkackpt").toString
    // the env ships no spark-sql-kafka jar: start() must fail at SOURCE
    // RESOLUTION (DATA_SOURCE_NOT_FOUND for "kafka"), not at plan
    // analysis — i.e. the envelope schema and sink wiring are valid and
    // the produce path would run given the jar + a broker
    val ex = intercept[Exception] {
      EventPipeline.startKafkaSink(envelope, "broker:9092", "aggregates.v1", ckpt)
    }
    val msg = Option(ex.getMessage).getOrElse("") + ex.getClass.getName
    assert(msg.toLowerCase.contains("kafka"))
    assert(msg.contains("DATA_SOURCE_NOT_FOUND") ||
      msg.toLowerCase.contains("failed to find") ||
      msg.toLowerCase.contains("classnotfound"))
  }
}
