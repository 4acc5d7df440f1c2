package graft.streaming

import org.apache.spark.sql.streaming.GroupState

/** Streaming anomaly detector — the reference's stateful
  * `RichFlatMapFunction` + `ValueState<RollingStats>` keyed by source
  * (`AnomalyDetectionJob.java:279-368`, SURVEY §2.7 T3-T9), as a
  * `flatMapGroupsWithState` handler keyed by event_type.
  *
  * Per event: update the 100-deep ring buffer, gate on ≥10 warm-up
  * samples (T4), score with z (population stddev, T5) and MAD (T6)
  * detectors at threshold 3.0, classify severity (T7) and type (T8).
  *
  * Determinism: events inside one micro-batch are processed in
  * (ts, event_id) order — cross-batch order is arrival order, exactly the
  * reference's semantics (Flink processes in stream order per key).
  *
  * Scale: state is O(100 doubles) per key; the groupByKey shuffle is the
  * only exchange — identical dataflow to the Flink job's keyBy.
  */
object AnomalyProcessor {

  val ZThreshold = 3.0
  val MadThreshold = 3.0
  val MinSamples = 10

  def score(e: Event, stats: RollingStats): AnomalyAlert = {
    def r4(x: Double): Double = graft.functions.Rounding.scalar(x, 4)
    val mean = stats.mean
    val std = stats.stddev
    val med = stats.median
    val madV = stats.mad
    val z = r4(if (std > 0) (e.value - mean) / std else 0.0)
    val madScore = r4(if (madV > 0) math.abs(e.value - med) / madV else 0.0)
    val zAnomaly = math.abs(z) > ZThreshold
    val madAnomaly = madScore > MadThreshold
    val isAnomaly = zAnomaly || madAnomaly
    val severity =
      if (isAnomaly && (math.abs(z) > 4 || madScore > 4)) "critical"
      else if (isAnomaly && (math.abs(z) > 3.5 || madScore > 3.5)) "warning"
      else "info"
    val anomalyType =
      if (zAnomaly) "z-score" else if (madAnomaly) "mad" else "normal"
    AnomalyAlert(e.event_id, e.event_type, e.ts, e.value,
                 stats.size.toLong, r4(mean), r4(std), r4(med), r4(madV),
                 z, madScore, isAnomaly, severity, anomalyType)
  }

  /** flatMapGroupsWithState handler: (key, batchEvents, state) → alerts. */
  def detect(
      key: String,
      events: Iterator[Event],
      state: GroupState[RollingStats]): Iterator[AnomalyAlert] = {
    var stats = state.getOption.getOrElse(RollingStats())
    val out = events.toSeq
      .sortBy(e => (EventTime.micros(e.ts), e.event_id))
      .flatMap { e =>
        stats = stats.add(e.value)
        if (stats.size >= MinSamples) Some(score(e, stats)) else None
      }
    state.update(stats)
    out.iterator
  }
}
