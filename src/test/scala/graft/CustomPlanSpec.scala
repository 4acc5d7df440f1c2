package graft

import graft.operators.AnomalyOps

/** The custom whole-operator stack (RollingStatsPlan → Strategy →
  * RollingStatsExec): planned correctly and row-identical to the
  * declarative WindowExec formulation.
  */
class CustomPlanSpec extends SparkSpec {

  test("anomalyScore plans through RollingStatsExec") {
    val df = AnomalyOps.anomalyScore(spark, sf("sf0.001"))
    df.collect() // finalize the adaptive plan
    // SparkPlan.nodeName strips the Exec suffix: renders as "RollingStats"
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("RollingStats "))
    assert(!plan.contains("Window "), "should not fall back to WindowExec")
  }

  test("custom operator output is identical to the WindowExec analog") {
    val fast = AnomalyOps.anomalyScore(spark, sf("sf0.001")).collect()
    val slow = AnomalyOps.anomalyScoreWindow(spark, sf("sf0.001")).collect()
    assert(fast.length == slow.length)
    fast.zip(slow).foreach { case (a, b) => assert(a == b) }
  }

  test("per-key buffers reset between adjacent keys in a partition") {
    val session = spark
    import session.implicits._
    // two keys forced into one shuffle partition: the second key's first
    // row must see n_samples=1, not a carried-over buffer
    val fast = AnomalyOps.anomalyScore(spark, sf("sf0.001"))
    val firstPerKey = fast
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.min("n_samples").as("min_n"))
      .collect()
    // warm-up gate means min surviving n is exactly MinSamples for every key
    firstPerKey.foreach(r => assert(r.getLong(1) == 10L))
  }
}
