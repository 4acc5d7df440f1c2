package graft

import graft.sources.EventGenerator
import org.apache.spark.sql.functions._

/** The synthetic generator (S7): domains, distribution shape, and
  * restart-determinism of the draws.
  */
class EventGeneratorSpec extends SparkSpec {

  test("batch generator matches the reference event shape") {
    val df = EventGenerator.batchEvents(spark, 20000, "2024-01-01 00:00:00")
    val sources = df.select("source").distinct().collect().map(_.getString(0)).toSet
    assert(sources == Set("web", "mobile", "api", "device", "service-a", "service-b"))
    val statuses = df.select("status").distinct().collect().map(_.getString(0)).toSet
    assert(statuses == Set("ok", "warning", "error"))
    assert(df.filter(col("metric") < 0).count() == 0)
    // ~5% outlier band in [100, 500]
    val outlierShare = df.filter(col("metric") >= 100).count().toDouble / 20000
    assert(outlierShare > 0.03 && outlierShare < 0.09, s"share=$outlierShare")
    // bulk centered near 50
    val meanBulk = df.filter(col("metric") < 100).agg(avg("metric"))
      .head().getDouble(0)
    assert(math.abs(meanBulk - 50) < 2, s"mean=$meanBulk")
    // status correlation: errors much likelier above 100
    val errHigh = df.filter(col("metric") > 100 && col("status") === "error").count().toDouble /
      math.max(df.filter(col("metric") > 100).count(), 1)
    val errLow = df.filter(col("metric") <= 100 && col("status") === "error").count().toDouble /
      math.max(df.filter(col("metric") <= 100).count(), 1)
    assert(errHigh > 0.2 && errLow < 0.1, s"high=$errHigh low=$errLow")
  }

  test("rate-source streaming generator emits well-formed events") {
    val q = EventGenerator
      .rateEvents(spark, rowsPerSecond = 500)
      .writeStream
      .format("memory")
      .queryName("gen_stream")
      .outputMode("append")
      .start()
    try {
      Thread.sleep(2500)
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("gen_stream")
    assert(rows.count() > 0)
    assert(rows.columns.toSet ==
      Set("event_id", "ts", "source", "metric", "status", "user_id"))
    import org.apache.spark.sql.functions.col
    assert(rows.filter(col("metric") < 0).count() == 0)
  }

  test("streaming dedup drops duplicate event ids within the watermark") {
    val session = spark
    import session.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{Event, EventPipeline}
    val input = MemoryStream[Event](spark, 2)
    val q = EventPipeline
      .dedupedEvents(input.toDF())
      .writeStream
      .format("memory")
      .queryName("dedup_stream")
      .outputMode("append")
      .start()
    try {
      def ev(id: Long, t: String, v: Double) =
        Event(id, java.sql.Timestamp.valueOf(t), 1L, "web", v)
      input.addData(
        ev(1, "2024-01-01 00:00:01", 1.0),
        ev(1, "2024-01-01 00:00:02", 2.0), // duplicate id within watermark
        ev(2, "2024-01-01 00:00:03", 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dedup_stream").select("event_id")
      .as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L))
  }

  test("draws are deterministic across re-execution (restart-stable)") {
    val a = EventGenerator.batchEvents(spark, 100, "2024-01-01 00:00:00")
      .orderBy("event_id").collect().map(_.toString).toSeq
    val b = EventGenerator.batchEvents(spark, 100, "2024-01-01 00:00:00")
      .orderBy("event_id").collect().map(_.toString).toSeq
    assert(a == b)
  }
}
