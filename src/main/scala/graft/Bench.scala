package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times the HEADLINE query set — the
  * reference's externally visible query surface (SURVEY §2.9: /series,
  * /kpi, /alerts, the anomaly pipeline) plus the scan-throughput probe —
  * on SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * The baseline mapping (BASELINE.md): the reference sustains ≥5,000
  * events/sec through its full aggregation surface; our analog is the
  * whole headline set over the sf events table in low single-digit
  * seconds. A warmup pass at the smallest SF runs first so JIT/codegen
  * compilation is not billed to the first measured query — the baseline's
  * numbers are steady-state, so ours are too.
  *
  * The remaining (additive) queries — dedup/similarity/text/multimodal —
  * are timed as a secondary group and included in per-query output, but
  * the headline total is the BASELINE-comparable metric.
  */
object Bench {

  /** §2.9 query surface + Q1 scan probe — the BASELINE-comparable set. */
  val headline: Seq[String] = Seq(
    "series_avg", "series_sum", "series_count", "series_p95",
    "series_filtered", "kpi_tumbling", "kpi_sliding", "kpi_lookup",
    "anomaly_score", "anomaly_alerts", "alerts_filter", "alerts_stats",
    "events_last_hour", "q1_pricing")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JIT/codegen warmup on the smallest fixture (not billed)
    val warmupDir = "/root/testdata/sf0.001"
    for (q <- Seq("kpi_tumbling", "anomaly_score", "dedup_minhash_lsh",
                  "q5_local_supplier", "ann_topk"))
      try SparkEntry.queries(q)(spark, warmupDir).count()
      catch { case _: Throwable => }

    def time(names: Seq[String]): Seq[(String, Double)] = names.map { name =>
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count() }
      catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }

    val headlineTimes = time(headline)
    val extended = SparkEntry.queries.keySet.diff(headline.toSet).toSeq.sorted
    val extendedTimes = time(extended)

    val events =
      try spark.read.parquet(s"$sfDir/events.parquet").count()
      catch { case _: Throwable => 0L }
    val headlineTotal = headlineTimes.map(_._2).sum
    val eventsPerSec =
      if (headlineTotal > 0) events * headline.size / headlineTotal else 0.0

    val qs = (headlineTimes ++ extendedTimes)
      .map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"headline_total","value":$headlineTotal,"unit":"sec",""" +
        s""""queries":$qs,"sf":"$sfDir",""" +
        s""""extended_total":${extendedTimes.map(_._2).sum},""" +
        s""""events_rows":$events,"events_per_sec":$eventsPerSec}""")
    spark.stop()
  }
}
