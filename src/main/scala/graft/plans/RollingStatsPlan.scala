package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types._


/** Whole-operator form of keyed rolling statistics (SURVEY §2.7 T3 /
  * §2.4 A6-A8): for each row, the (n, mean, stddev, median, mad) of the
  * last `windowSize` values of `value` within its `partitionKey` group in
  * `orderKeys` order.
  *
  * Motivation (the one case SURVEY §4 didn't foresee needing a custom
  * operator): the declarative form — an aggregate over
  * `rowsBetween(-windowSize+1, 0)` — is planned as WindowExec with a
  * sliding frame, which re-accumulates the whole frame through the
  * aggregate-buffer machinery for every output row. This operator makes
  * the same single demand on the planner (hash distribution +
  * in-partition sort) and then streams each partition once, maintaining
  * a primitive circular buffer per key and evaluating each frame with
  * flat double arrays, with no aggregate-buffer serialization in the
  * loop. Per-row cost is O(w) with small constants: the window multiset
  * rides an incrementally-maintained sorted array (median is a direct
  * order-statistics read), and the MAD streams deviations in ascending
  * order via an outward two-pointer merge from the median's split point
  * — no per-row comparison sort anywhere.
  *
  * Frame evaluation uses the same sequential folds and midpoint-median
  * rules as [[graft.functions.RollingStatsAggExpr]], so results are
  * bit-identical to the WindowExec form and the DuckDB oracle.
  */
case class RollingStatsPlan(
    partitionKey: Expression,
    orderKeys: Seq[SortOrder],
    value: Expression,
    windowSize: Int,
    statsAttr: AttributeReference,
    child: LogicalPlan)
    extends UnaryNode {

  override def output: Seq[Attribute] = child.output :+ statsAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(statsAttr)

  override protected def withNewChildInternal(newChild: LogicalPlan): RollingStatsPlan =
    copy(child = newChild)
}

object RollingStatsPlan {
  /** The output attribute is created ONCE by the caller and carried as a
    * constructor field — recreating it in the node body would mint a new
    * exprId on every `copy`, dangling downstream references.
    */
  def newStatsAttr(name: String): AttributeReference =
    AttributeReference(name, statsType, nullable = false)()

  val statsType: StructType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("mean", DoubleType, nullable = false),
    StructField("stddev", DoubleType, nullable = false),
    StructField("median", DoubleType, nullable = false),
    StructField("mad", DoubleType, nullable = false)
  ))
}

/** Physical operator: demands clustering on the key and a per-partition
  * sort, then one streaming pass per partition with per-key ring
  * buffers. State is O(windowSize × live keys in partition).
  */
case class RollingStatsExec(
    partitionKey: Expression,
    orderKeys: Seq[SortOrder],
    value: Expression,
    windowSize: Int,
    statsAttr: Attribute,
    child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ statsAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(statsAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(partitionKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(partitionKey, org.apache.spark.sql.catalyst.expressions.Ascending)
      +: orderKeys)

  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExpr = partitionKey
    val w = windowSize
    val schema = output
    val childOutput = child.output
    // bind once on the driver; only bound expressions enter the closure
    val boundValue =
      org.apache.spark.sql.catalyst.expressions.BindReferences
        .bindReference(value, childOutput)
    child.execute().mapPartitions({ rows =>
      val keyProj = UnsafeProjection.create(Seq(keyExpr), childOutput)
      val outProj = UnsafeProjection.create(schema, schema)
      val joined = new JoinedRow
      val statsRow = new GenericInternalRow(5)
      val statsHolder = new GenericInternalRow(1)
      // rows arrive key-clustered and key-sorted: one live buffer at a time.
      // Primitive circular buffer for arrival order; `sorted` holds the
      // SAME window multiset in ascending order, maintained
      // incrementally — insert/evict are a binary search plus one
      // arraycopy (memmove intrinsic), replacing the former per-row
      // O(w log w) comparison sorts. sum/sumSq still fold the frame
      // afresh IN ARRIVAL ORDER (incremental sum maintenance would
      // drift in the last ulps vs the WindowExec form); the median
      // reads the maintained order statistics directly, and the MAD
      // comes from the outward two-pointer merge below. All values are
      // bit-identical to WindowExec/RollingStatsAggExpr and the DuckDB
      // oracle (asserted in CustomPlanSpec).
      var currentKey: org.apache.spark.sql.catalyst.expressions.UnsafeRow = null
      val ring = new Array[Double](w)
      val frame = new Array[Double](w)
      val sorted = new Array[Double](w)
      var start = 0
      var size = 0
      def insertSorted(x: Double, n: Int): Unit = {
        var i = java.util.Arrays.binarySearch(sorted, 0, n, x)
        if (i < 0) i = -i - 1
        System.arraycopy(sorted, i, sorted, i + 1, n - i)
        sorted(i) = x
      }
      def removeSorted(x: Double, n: Int): Unit = {
        // x was previously inserted, so it is present; binarySearch on
        // double[] uses the same total order insertion used
        val i = java.util.Arrays.binarySearch(sorted, 0, n, x)
        System.arraycopy(sorted, i + 1, sorted, i, n - i - 1)
      }
      rows.map { row =>
        val k = keyProj(row)
        if (currentKey == null || k != currentKey) {
          currentKey = k.copy()
          start = 0
          size = 0
        }
        val v = boundValue.eval(row)
        if (v != null) {
          val x = v.asInstanceOf[Double]
          if (size < w) {
            ring((start + size) % w) = x
            insertSorted(x, size)
            size += 1
          } else {
            val evicted = ring(start)
            ring(start) = x
            start = (start + 1) % w
            removeSorted(evicted, size)
            insertSorted(x, size - 1)
          }
        }
        var i = 0
        while (i < size) { frame(i) = ring((start + i) % w); i += 1 }
        var sum = 0.0
        var sumSq = 0.0
        i = 0
        while (i < size) { val x = frame(i); sum += x; sumSq += x * x; i += 1 }
        val mean = if (size == 0) 0.0 else sum / size
        val stddev =
          if (size == 0) 0.0
          else math.sqrt(math.max(0.0, sumSq / size - mean * mean))
        val median =
          if (size == 0) 0.0
          else (sorted((size + 1) / 2 - 1) + sorted(size / 2)) / 2.0
        // MAD without sorting deviations: |x − median| is decreasing as
        // x walks left of the median and increasing as it walks right,
        // so merging the two runs outward from the split point streams
        // the deviations in ascending order — rank selection in O(w)
        // (the offset-window trick). `m − x` for x ≤ m and `x − m` for
        // x > m are bit-equal to the former `math.abs(x − m)` (IEEE
        // negation is exact), so the selected deviations are the same
        // doubles the sort-based form produced.
        val mad =
          if (size == 0) 0.0
          else {
            var lo0 = 0
            var hi0 = size
            while (lo0 < hi0) {
              val mid = (lo0 + hi0) >>> 1
              if (sorted(mid) <= median) lo0 = mid + 1 else hi0 = mid
            }
            val r1 = (size + 1) / 2 - 1
            val r2 = size / 2
            var lo = lo0 - 1
            var hi = lo0
            var rank = 0
            var d1 = 0.0
            var d2 = 0.0
            while (rank <= r2) {
              val dl =
                if (lo >= 0) median - sorted(lo) else Double.PositiveInfinity
              val dr =
                if (hi < size) sorted(hi) - median else Double.PositiveInfinity
              val d = if (dl <= dr) { lo -= 1; dl } else { hi += 1; dr }
              if (rank == r1) d1 = d
              if (rank == r2) d2 = d
              rank += 1
            }
            (d1 + d2) / 2.0
          }
        statsRow.update(0, size.toLong)
        statsRow.update(1, mean)
        statsRow.update(2, stddev)
        statsRow.update(3, median)
        statsRow.update(4, mad)
        statsHolder.update(0, statsRow)
        outProj(joined(row, statsHolder))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): RollingStatsExec =
    copy(child = newChild)
}

/** Planner strategy mapping the logical node to the exec. Injected via
  * [[GraftExtensions]] (`injectPlannerStrategy`).
  */
object RollingStatsStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: RollingStatsPlan =>
      RollingStatsExec(p.partitionKey, p.orderKeys, p.value, p.windowSize,
                       p.statsAttr, planLater(p.child)) :: Nil
    case _ => Nil
  }
}
