package graft.streaming

import java.sql.Timestamp

/** Exact event-time arithmetic for the stateful processors.
  *
  * The parquet event timestamps carry MICROSECONDS, and every batch
  * analog orders by the full-precision `(ts, event_id)` — but
  * `Timestamp.getTime` truncates to millis, so a processor sorting its
  * batch by `getTime` can order two same-millisecond events differently
  * than the batch query (and a bound built from `getTime` can sit up to
  * 999 µs early). Order-dependent folds must sort by [[micros]]; bounds
  * emitted as timestamps must round-trip through [[tsOfMicros]].
  */
object EventTime {

  /** Full event-time micros of a Timestamp (`getTime` truncates to
    * millis; the sub-millisecond digits live only in `getNanos`).
    */
  def micros(ts: Timestamp): Long =
    (ts.getTime / 1000L) * 1000000L + ts.getNanos.toLong / 1000L

  def tsOfMicros(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }
}
