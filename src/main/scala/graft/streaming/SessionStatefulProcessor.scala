package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Running per-user session aggregate (state for
  * [[SessionStatefulProcessor]]).
  */
case class SessionAgg(startMillis: Long, lastMillis: Long, n: Long, sum: Double)

/** A closed gap-session — same shape and semantics as the
  * `session_window` rows of [[graft.operators.TemporalOps.sessionize]]:
  * `session_end` is last event time + gap, `sum_value` rounded to 4 dp
  * with the cross-engine floor formula.
  */
case class SessionClosed(user_id: Long,
                         session_start: Timestamp,
                         session_end: Timestamp,
                         n_events: Long,
                         sum_value: Double)

/** Gap-based sessionization as a transformWithState processor with
  * EVENT-TIME TIMERS — the piece of the transformWithState API surface
  * ([[AnomalyStatefulProcessor]] and friends use none of): a session
  * closes either when a same-key event arrives past the 30-minute gap
  * (emitted inline) or when the WATERMARK passes `last event + gap`
  * with no further events — which only a registered timer can observe
  * ([[handleExpiredTimer]]). This is the Flink
  * `EventTimeSessionWindows` + `onEventTime` trigger pattern 1:1, and
  * the explicit form of what `session_window` + Append mode do
  * internally; parity against the batch sessionize is asserted in
  * StatefulProcessorSpec.
  *
  * One live timer per key: each input batch re-arms the timer to the
  * current session's close instant and deletes the stale one, so timer
  * state is O(active keys), not O(events).
  */
class SessionStatefulProcessor
    extends StatefulProcessor[Long, Event, SessionClosed] {
  import SessionStatefulProcessor._

  @transient private var sess: ValueState[SessionAgg] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    sess = getHandle.getValueState[SessionAgg](
      "session", Encoders.product[SessionAgg], TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      inputRows: Iterator[Event],
      timerValues: TimerValues): Iterator[SessionClosed] = {
    val (cur, closed) = advance(key, Option(sess.get()), inputRows)
    cur.foreach { s =>
      sess.update(s)
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(s.lastMillis + GapMillis)
    }
    closed.iterator
  }

  override def handleExpiredTimer(
      key: Long,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionClosed] = {
    val s = sess.get()
    // a stale timer (re-armed later by new events) fires before the
    // session's true close instant — ignore it
    if (s != null && expiredTimerInfo.getExpiryTimeInMs >= s.lastMillis + GapMillis) {
      sess.clear()
      Iterator.single(closedRow(key, s))
    } else Iterator.empty
  }
}

object SessionStatefulProcessor {

  /** Session gap — keep in sync with TemporalOps.sessionize. */
  val GapMillis: Long = 30 * 60 * 1000L

  private[streaming] def closedRow(key: Long, s: SessionAgg): SessionClosed =
    SessionClosed(key, new Timestamp(s.startMillis),
                  new Timestamp(s.lastMillis + GapMillis), s.n,
                  graft.functions.Rounding.scalar(s.sum, 4))

  /** Pure session fold (sorts its batch internally; state carries
    * across calls) — shared by the processor and the split-invariance
    * property tests.
    */
  private[graft] def advance(
      key: Long,
      init: Option[SessionAgg],
      events: Iterator[Event]): (Option[SessionAgg], Seq[SessionClosed]) = {
    val out = Seq.newBuilder[SessionClosed]
    var cur = init
    events.toSeq
      .sortBy(e => (e.ts.getTime, e.event_id))
      .foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.lastMillis > GapMillis =>
            out += closedRow(key, s)
            cur = Some(SessionAgg(t, t, 1L, e.value))
          case Some(s) =>
            // min-start: an out-of-order event inside the watermark
            // slack may precede the stored session start; session_window
            // extends the window backwards, so this must too
            cur = Some(SessionAgg(math.min(s.startMillis, t),
                                  math.max(s.lastMillis, t),
                                  s.n + 1, s.sum + e.value))
          case None =>
            cur = Some(SessionAgg(t, t, 1L, e.value))
        }
      }
    (cur, out.result())
  }

  /** events → closed sessions via transformWithState + event-time
    * timers. Append mode: only final (watermark- or gap-closed) rows.
    */
  def sessionStream(spark: SparkSession,
                    events: Dataset[Event]): Dataset[SessionClosed] = {
    import spark.implicits._
    events
      .withWatermark("ts", "10 seconds")
      .groupByKey(_.user_id)
      .transformWithState(new SessionStatefulProcessor,
                          TimeMode.EventTime(),
                          OutputMode.Append())
  }
}
