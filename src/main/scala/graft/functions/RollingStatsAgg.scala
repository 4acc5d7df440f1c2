package graft.functions

import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types._

/** Native Catalyst aggregate computing the full rolling-statistics bundle
  * — (mean, population stddev, median, MAD) — in ONE pass over the
  * window frame, returned as a struct.
  *
  * This is the performance form of the reference RollingStats
  * (`AnomalyDetectionJob.java:178-251`): used over
  * `Window.partitionBy(key).orderBy(ts).rowsBetween(-99, 0)` it evaluates
  * each frame once with primitive arrays (a single sort, sequential
  * sums), instead of four separate higher-order-function expressions that
  * the interpreter re-evaluates per output column (~4× the work plus
  * lambda overhead per element).
  *
  * Determinism contract (the DuckDB oracle depends on it): sums are
  * sequential left-folds in frame order — bit-identical to
  * `list_reduce(l, (a,b) -> a+b)`; median is the midpoint rule (average
  * of the two middles for even n); MAD is the median of absolute
  * deviations from that median; variance is `sumSq/n − mean²` clamped at
  * zero (population form), NOT Welford — exactly the reference's
  * formulas.
  */
case class RollingStatsAggExpr(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[Double]]
    with UnaryLike[Expression] {

  override def prettyName: String = "rolling_stats"

  override def nullable: Boolean = false

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("mean", DoubleType, nullable = false),
    StructField("stddev", DoubleType, nullable = false),
    StructField("median", DoubleType, nullable = false),
    StructField("mad", DoubleType, nullable = false)
  ))

  override def createAggregationBuffer(): ArrayBuffer[Double] =
    ArrayBuffer.empty[Double]

  override def update(buffer: ArrayBuffer[Double], input: InternalRow): ArrayBuffer[Double] = {
    child.eval(input) match {
      case null =>
      case d: Double => buffer += d
      case d: org.apache.spark.sql.types.Decimal => buffer += d.toDouble
      case n: java.lang.Number => buffer += n.doubleValue()
    }
    buffer
  }

  override def merge(buffer: ArrayBuffer[Double], other: ArrayBuffer[Double]): ArrayBuffer[Double] = {
    buffer ++= other
    buffer
  }

  override def eval(buffer: ArrayBuffer[Double]): Any = {
    val n = buffer.length
    if (n == 0) {
      new GenericInternalRow(Array[Any](0L, 0.0, 0.0, 0.0, 0.0))
    } else {
      // sequential folds in frame order (bit-exact vs list_reduce)
      var sum = 0.0
      var sumSq = 0.0
      var i = 0
      while (i < n) {
        val x = buffer(i)
        sum += x
        sumSq += x * x
        i += 1
      }
      val mean = sum / n
      val stddev = math.sqrt(math.max(0.0, sumSq / n - mean * mean))
      val sorted = new Array[Double](n)
      i = 0
      while (i < n) { sorted(i) = buffer(i); i += 1 }
      java.util.Arrays.sort(sorted)
      def medianOf(a: Array[Double]): Double =
        (a((n + 1) / 2 - 1) + a(n / 2)) / 2.0
      val median = medianOf(sorted)
      val dev = new Array[Double](n)
      i = 0
      while (i < n) { dev(i) = math.abs(buffer(i) - median); i += 1 }
      java.util.Arrays.sort(dev)
      val mad = medianOf(dev)
      new GenericInternalRow(Array[Any](n.toLong, mean, stddev, median, mad))
    }
  }

  override def serialize(buffer: ArrayBuffer[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.length)
    bb.putInt(buffer.length)
    buffer.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[Double](n)
    var i = 0
    while (i < n) { buf += bb.getDouble; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): RollingStatsAggExpr =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): RollingStatsAggExpr =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): RollingStatsAggExpr =
    copy(child = newChild)
}

object RollingStatsAgg {
  /** `rolling_stats(col)` as a Column — apply `.over(windowSpec)`. */
  def apply(c: Column): Column =
    GraftSqlBridge.toCol(
      RollingStatsAggExpr(GraftSqlBridge.toExpr(c)).toAggregateExpression())
}
