package graft.functions

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact nearest-rank-floor percentile — the reference EventAggregator's
  * semantics: `sorted.get((int)(size * q))`, index-based, NOT
  * interpolated (`EventAggregationJob.java:247-253`, SURVEY §2.4 A2).
  *
  * A typed `Aggregator` with a mergeable buffer (partial aggregation
  * works map-side, like the Flink accumulator's `merge()` at
  * `EventAggregationJob.java:258-265`). Correct-by-definition but buffers
  * all values per group — bounded here by window length × per-source
  * rate; for unbounded groups use `percentile_approx` (documented
  * deviation, SURVEY §7 phase 2).
  *
  * KpiOps inlines the same semantics with native `sort_array` +
  * `element_at` expressions (optimizer-visible); this Aggregator is the
  * reusable UDAF form (§2.10) for callers who want a single column
  * function: `df.agg(ExactPercentile.p95($"value"))`.
  */
class ExactPercentile(q: Double)
    extends Aggregator[Double, ArrayBuffer[Double], Double] {
  require(q >= 0 && q < 1, s"quantile must be in [0,1): $q")

  def zero: ArrayBuffer[Double] = ArrayBuffer.empty

  def reduce(b: ArrayBuffer[Double], x: Double): ArrayBuffer[Double] = {
    b += x; b
  }

  def merge(a: ArrayBuffer[Double], b: ArrayBuffer[Double]): ArrayBuffer[Double] = {
    a ++= b; a
  }

  def finish(b: ArrayBuffer[Double]): Double =
    if (b.isEmpty) Double.NaN
    else {
      val sorted = b.toArray
      java.util.Arrays.sort(sorted)
      sorted((sorted.length * q).toInt)
    }

  // kryo: the buffer is engine-internal shuffle payload, not a SQL value
  def bufferEncoder: Encoder[ArrayBuffer[Double]] =
    Encoders.kryo[ArrayBuffer[Double]]

  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object ExactPercentile {
  private def make(q: Double): (Column => Column) = {
    val fn = udaf(new ExactPercentile(q))
    c => fn(c)
  }
  lazy val p50: Column => Column = make(0.5)
  lazy val p90: Column => Column = make(0.9)
  lazy val p95: Column => Column = make(0.95)
  lazy val p99: Column => Column = make(0.99)
}
