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

  test("draws are deterministic across re-execution (restart-stable)") {
    val a = EventGenerator.batchEvents(spark, 100, "2024-01-01 00:00:00")
      .orderBy("event_id").collect().map(_.toString).toSeq
    val b = EventGenerator.batchEvents(spark, 100, "2024-01-01 00:00:00")
      .orderBy("event_id").collect().map(_.toString).toSeq
    assert(a == b)
  }
}
