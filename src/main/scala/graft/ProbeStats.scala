package graft

/** The statistics definitions [[ThroughputProbe]] reports — extracted
  * from the probe's `main` so they are spec-pinned (ProbeStatsSpec)
  * instead of private inline lambdas a future edit could silently
  * change. Every THROUGHPUT.json number that is not a raw engine
  * counter comes through here.
  *
  * Definitions (all intentionally simple and stated once):
  *   - [[pct]]: nearest-rank percentile — the p95 of 20 trigger
  *     executions is the 19th smallest, never an interpolation that
  *     reports a latency no trigger actually exhibited;
  *   - [[wallMs]]: the sustained-rate denominator — first trigger's
  *     start to the LAST trigger's end, so every pacing gap is billed
  *     (drain-as-fast-as-you-can numbers would exclude them);
  *   - [[e2eP95Ms]]: worst-case detection-to-alert composition for one
  *     query — an event waits at most one trigger interval for its
  *     trigger, then one p95 execution to reach the alert sink;
  *   - [[zeroBacklog]]: the ingest-pass semantics — the stream keeps up
  *     with its arrival rate exactly when the p95 trigger execution
  *     fits strictly inside the trigger interval (queued work would
  *     otherwise grow without bound);
  *   - [[chainedE2eP95Ms]]: the two-query store-then-consume
  *     composition — leg 1 is the single-query worst case above, leg 2
  *     is the MEASURED per-row detect-stamp → routed-stamp gap (which
  *     already contains the consumer's trigger wait and execution).
  *     The detect stamp is taken at the detector's sink-write START,
  *     inside the tail of the detector execution the p95 already
  *     bills, so the seam is double-counted by a few ms — conservative
  *     by construction, never flattering.
  */
object ProbeStats {

  /** Nearest-rank percentile of an ascending-sorted sequence:
    * element at rank ⌈p·n⌉ (1-based), clamped into the sequence.
    */
  def pct(sorted: Seq[Long], p: Double): Long =
    sorted(math.min(sorted.size - 1,
                    math.ceil(p * sorted.size).toInt - 1).max(0))

  /** Sustained-rate wall-clock denominator: first data trigger's start
    * to the last data trigger's end (start + its execution time).
    */
  def wallMs(firstStartMs: Long, lastStartMs: Long, lastExecMs: Long): Long =
    lastStartMs + lastExecMs - firstStartMs

  /** Sustained events/sec over the [[wallMs]] denominator. */
  def sustainedPerSec(totalRows: Long, wallMs: Long): Double =
    totalRows.toDouble * 1000.0 / wallMs

  /** Worst-case single-query detection-to-alert latency. */
  def e2eP95Ms(intervalMs: Long, execP95Ms: Long): Long =
    intervalMs + execP95Ms

  /** True iff the query keeps up with its paced arrival rate. */
  def zeroBacklog(intervalMs: Long, execP95Ms: Long): Boolean =
    execP95Ms < intervalMs

  /** Worst-case chained (detector ⇒ store ⇒ cooldown/routing consumer)
    * latency: single-query worst case plus the measured handoff-gap
    * p95 of the second leg.
    */
  def chainedE2eP95Ms(intervalMs: Long, detExecP95Ms: Long,
                      gapP95Ms: Long): Long =
    e2eP95Ms(intervalMs, detExecP95Ms) + gapP95Ms
}
