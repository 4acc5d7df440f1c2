package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** transformWithState (Spark 4 StatefulProcessor) forms of the remaining
  * keyed stages — EWMA smoothing, event transitions, and the cooldown
  * gate — completing the T3 migration started by
  * [[AnomalyStatefulProcessor]] (SURVEY §2.7 names transformWithState as
  * the 1:1 mapping of the reference's Flink `RichFlatMapFunction` +
  * `ValueState`, `AnomalyDetectionJob.java:279-368`).
  *
  * Each processor delegates to the SAME pure `advance` core its
  * flatMapGroupsWithState twin uses, so the two APIs cannot diverge;
  * StreamingParitySpec still asserts end-to-end equality on multi-batch
  * splits. All require the RocksDB state store provider
  * ([[AnomalyStatefulProcessor.rocksdbConf]]).
  */
class EwmaStatefulProcessor
    extends StatefulProcessor[String, Event, EwmaProcessor.EwmaLevel] {
  import EwmaProcessor._

  @transient private var level: ValueState[EwmaState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    level = getHandle.getValueState[EwmaState](
      "ewmaLevel", Encoders.product[EwmaState], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      inputRows: Iterator[Event],
      timerValues: TimerValues): Iterator[EwmaLevel] = {
    val s = advance(Option(level.get()).getOrElse(EmptyState), inputRows)
    level.update(s)
    emit(key, s)
  }
}

/** Per-user transition pairing as a StatefulProcessor (one LastEvent of
  * state per user, exactly the Flink ValueState shape).
  */
class TransitionStatefulProcessor
    extends StatefulProcessor[Long, Event, TransitionProcessor.Transition] {
  import TransitionProcessor._

  @transient private var last: ValueState[LastEvent] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    last = getHandle.getValueState[LastEvent](
      "lastEvent", Encoders.product[LastEvent], TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      inputRows: Iterator[Event],
      timerValues: TimerValues): Iterator[Transition] = {
    val (prev, out) = advance(key, Option(last.get()), inputRows)
    prev.foreach(last.update)
    out.iterator
  }
}

/** Cooldown gate per (source, severity) as a StatefulProcessor. */
class CooldownStatefulProcessor
    extends StatefulProcessor[(String, String), AnomalyAlert,
                              CooldownProcessor.FiredAlert] {
  import CooldownProcessor._

  @transient private var lastFired: ValueState[LastFired] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    lastFired = getHandle.getValueState[LastFired](
      "lastFired", Encoders.product[LastFired], TTLConfig.NONE)

  override def handleInputRows(
      key: (String, String),
      inputRows: Iterator[AnomalyAlert],
      timerValues: TimerValues): Iterator[FiredAlert] = {
    val (last, out) = advance(Option(lastFired.get()).map(_.tsMillis), inputRows)
    last.foreach(l => lastFired.update(LastFired(l)))
    out.iterator
  }
}

/** Incrementally-carried moments companion for
  * [[AnomalyListStateProcessor]]'s list buffer.
  */
case class BufferMoments(sum: Double, sumSquares: Double)

/** The anomaly detector with its value buffer in LIST state — the state
  * shape a 100-TB deployment wants: [[AnomalyStatefulProcessor]] stores
  * the whole [[RollingStats]] case class in one ValueState cell, so
  * every update rewrites all ~100 buffered doubles; a `ListState` keeps
  * per-element rows in RocksDB, where `appendValue`/`appendList` is an
  * O(new) write and only eviction compacts. The running moments ride a
  * tiny companion ValueState cell rather than being recomputed from the
  * buffer — recomputation would change the float accumulation order and
  * break BIT parity with the other two detector forms
  * (StatefulProcessorSpec asserts all three emit identical alerts).
  */
class AnomalyListStateProcessor
    extends StatefulProcessor[String, Event, AnomalyAlert] {

  @transient private var buffer: org.apache.spark.sql.streaming.ListState[Double] = _
  @transient private var moments: ValueState[BufferMoments] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buffer = getHandle.getListState[Double](
      "valueBuffer", Encoders.scalaDouble, TTLConfig.NONE)
    moments = getHandle.getValueState[BufferMoments](
      "moments", Encoders.product[BufferMoments], TTLConfig.NONE)
  }

  override def handleInputRows(
      key: String,
      inputRows: Iterator[Event],
      timerValues: TimerValues): Iterator[AnomalyAlert] = {
    val prior = if (buffer.exists()) buffer.get().toVector else Vector.empty
    val mom = Option(moments.get()).getOrElse(BufferMoments(0.0, 0.0))
    var st = RollingStats(prior, mom.sum, mom.sumSquares)
    val newValues = Vector.newBuilder[Double]
    val out = inputRows.toSeq
      .sortBy(e => (e.ts.getTime, e.event_id))
      .flatMap { e =>
        st = st.add(e.value)
        newValues += e.value
        if (st.size >= AnomalyProcessor.MinSamples)
          Some(AnomalyProcessor.score(e, st))
        else None
      }
    val appended = newValues.result()
    if (prior.size + appended.size <= st.maxSize) {
      // no eviction yet: pure append writes
      buffer.appendList(appended.toArray)
    } else {
      // eviction compaction: rewrite the ≤maxSize tail
      buffer.put(st.values.toArray)
    }
    moments.update(BufferMoments(st.sum, st.sumSquares))
    out.iterator
  }
}

object TypedStatefulProcessors {

  /** events → alerts with the ListState-buffered detector. */
  def anomalyListStream(spark: SparkSession,
                        events: Dataset[Event]): Dataset[AnomalyAlert] = {
    import spark.implicits._
    events
      .filter(_.value > 0)
      .groupByKey(_.event_type)
      .transformWithState(new AnomalyListStateProcessor,
                          TimeMode.None(),
                          OutputMode.Update())
  }

  /** events → EWMA levels via the native transformWithState operator. */
  def ewmaStream(spark: SparkSession,
                 events: Dataset[Event]): Dataset[EwmaProcessor.EwmaLevel] = {
    import spark.implicits._
    events
      .groupByKey(_.event_type)
      .transformWithState(new EwmaStatefulProcessor,
                          TimeMode.None(),
                          OutputMode.Update())
  }

  /** events → per-user transitions via transformWithState. */
  def transitionStream(
      spark: SparkSession,
      events: Dataset[Event]): Dataset[TransitionProcessor.Transition] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new TransitionStatefulProcessor,
                          TimeMode.None(),
                          OutputMode.Update())
  }

  /** alerts → fired alerts (cooldown-gated) via transformWithState. */
  def cooldownStream(
      spark: SparkSession,
      alerts: Dataset[AnomalyAlert]): Dataset[CooldownProcessor.FiredAlert] = {
    import spark.implicits._
    alerts
      .filter(_.is_anomaly)
      .groupByKey(a => (a.event_type, a.severity))
      .transformWithState(new CooldownStatefulProcessor,
                          TimeMode.None(),
                          OutputMode.Update())
  }
}
