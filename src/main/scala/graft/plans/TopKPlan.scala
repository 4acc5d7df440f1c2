package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Whole-operator per-key top-k (the second case where a dedicated
  * physical operator beats the declarative plan): `row_number() OVER
  * (PARTITION BY key ORDER BY o) ≤ k` forces WindowExec to SORT EVERY
  * PARTITION — O(n log n) over all candidate rows — then discards all
  * but k per key. The dedicated operator keeps a bounded ordered buffer
  * per key (O(n log k), no partition sort), and splits into
  * partial/final stages like an aggregate: the pre-shuffle partial pass
  * caps each input partition's contribution at k rows per key, so the
  * exchange moves O(keys × k × partitions) rows instead of every
  * candidate — the difference between shuffling a 100 TB candidate set
  * and shuffling its answers.
  *
  * Rank semantics are exactly `row_number` under a TOTAL ordering (all
  * call sites tie-break to totality), so results are bit-identical to
  * the window formulation — asserted in CustomPlanSpec and by the
  * unchanged DuckDB oracles of every adopting query.
  */
case class TopKPerKeyPlan(
    keys: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: LogicalPlan)
    extends UnaryNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)

  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

object TopKPerKeyPlan {
  /** Created once by the caller (see RollingStatsPlan.newStatsAttr). */
  def newRankAttr(name: String): AttributeReference =
    AttributeReference(name, IntegerType, nullable = false)()
}

/** Physical per-key top-k pass. `partial = true` runs before the
  * exchange with no distribution requirement and emits no rank (a
  * superset-safe prefilter: a row in the global top-k is in its input
  * partition's top-k); `partial = false` demands clustering on the keys
  * and emits the 1-based rank.
  *
  * Memory posture (the 100 TB story): the partial stage buffers at most
  * k rows per distinct key but FLUSHES the whole buffer map downstream
  * whenever it holds more than [[TopKPerKeyExec.MaxPartialBufferedRows]]
  * rows — flushing early is always correct (the stage is a prefilter;
  * anything it passes through is re-ranked by the final stage), it only
  * trades shuffle volume for bounded memory on very-high-cardinality
  * keys. The final stage additionally requires its child SORTED by the
  * keys, so it streams one key group at a time holding exactly one
  * k-row buffer — O(k) memory regardless of key count, with the
  * pre-exchange sort handled by Spark's spillable SortExec.
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    partial: Boolean,
    child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    if (partial) org.apache.spark.sql.catalyst.expressions.AttributeSet.empty
    else org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  // final stage streams key groups, so equal keys must be adjacent;
  // EnsureRequirements plans this as a spillable SortExec over the
  // (already partial-pruned) shuffle output
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil)
    else Seq(keys.map(key =>
      SortOrder(key, org.apache.spark.sql.catalyst.expressions.Ascending)))

  /** Insert `row` into `buf` (ordered, capped at `limit`) iff it ranks. */
  private def boundedInsert(
      buf: java.util.ArrayList[UnsafeRow],
      row: InternalRow,
      cmp: LazilyGeneratedOrdering,
      limit: Int): Boolean = {
    // bounded insertion sort: skip fast when the row can't make the cut
    if (buf.size() < limit || cmp.compare(row, buf.get(buf.size() - 1)) < 0) {
      val copy = row.asInstanceOf[UnsafeRow].copy()
      var lo = 0
      var hi = buf.size()
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (cmp.compare(copy, buf.get(mid)) < 0) hi = mid else lo = mid + 1
      }
      buf.add(lo, copy)
      if (buf.size() > limit) { buf.remove(limit); false } else true
    } else false
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val boundKeys = keys.map(BindReferences.bindReference(_, childOutput))
    val boundOrder = ordering.map(o =>
      o.copy(child = BindReferences.bindReference(o.child, childOutput)))
    val limit = k
    val outSchema = output
    if (partial) {
      // captured on the driver at execution time; the session conf exists
      // so tests can force the multi-flush path with a tiny cap
      val maxBuffered = conf
        .getConfString("graft.topk.maxPartialBufferedRows",
                       TopKPerKeyExec.MaxPartialBufferedRows.toString)
        .toLong
      require(maxBuffered > 0,
              s"graft.topk.maxPartialBufferedRows must be positive, got $maxBuffered")
      child.execute().mapPartitions({ rows =>
        val keyProj = UnsafeProjection.create(boundKeys)
        val cmp = new LazilyGeneratedOrdering(boundOrder)
        // LinkedHashMap: deterministic (first-seen key) emission order
        val buffers =
          new java.util.LinkedHashMap[UnsafeRow, java.util.ArrayList[UnsafeRow]]()
        new Iterator[InternalRow] {
          private var nBuffered = 0L
          private var current: Iterator[InternalRow] = Iterator.empty

          /** Snapshot + clear the buffer map into an output iterator. */
          private def drain(): Iterator[InternalRow] = {
            import scala.jdk.CollectionConverters._
            val snapshot =
              new java.util.ArrayList[java.util.ArrayList[UnsafeRow]](
                buffers.values())
            buffers.clear()
            nBuffered = 0L
            snapshot.iterator().asScala.flatMap { buf =>
              (0 until buf.size()).iterator.map(buf.get(_): InternalRow)
            }
          }

          override def hasNext: Boolean = {
            while (!current.hasNext && rows.hasNext) {
              while (rows.hasNext && nBuffered < maxBuffered) {
                val row = rows.next()
                val key = keyProj(row)
                var buf = buffers.get(key)
                if (buf == null) {
                  buf = new java.util.ArrayList[UnsafeRow](limit + 1)
                  buffers.put(key.copy(), buf)
                }
                if (boundedInsert(buf, row, cmp, limit)) nBuffered += 1
              }
              current = drain()
            }
            current.hasNext
          }

          override def next(): InternalRow = {
            if (!hasNext) throw new NoSuchElementException
            current.next()
          }
        }
      }, preservesPartitioning = true)
    } else {
      // child clustered AND sorted on keys: stream one group at a time
      // with a single k-row buffer — O(k) memory per task
      child.execute().mapPartitions({ rows =>
        val keyProj = UnsafeProjection.create(boundKeys)
        val cmp = new LazilyGeneratedOrdering(boundOrder)
        val outProj = UnsafeProjection.create(outSchema, outSchema)
        val joined = new JoinedRow
        val rankRow = new GenericInternalRow(1)
        new Iterator[InternalRow] {
          private var pendingKey: UnsafeRow = null // key of lookahead row
          private var pending: InternalRow = null  // first row of next group
          private val buf = new java.util.ArrayList[UnsafeRow](limit + 1)
          private var emit: Iterator[InternalRow] = Iterator.empty

          private def emitGroup(): Iterator[InternalRow] =
            (0 until buf.size()).iterator.map { i =>
              rankRow.update(0, i + 1)
              outProj(joined(buf.get(i), rankRow))
            }

          override def hasNext: Boolean = {
            while (!emit.hasNext && (pending != null || rows.hasNext)) {
              buf.clear()
              var groupKey: UnsafeRow = null
              if (pending != null) {
                groupKey = pendingKey
                boundedInsert(buf, pending, cmp, limit)
                pending = null; pendingKey = null
              }
              var done = false
              while (!done && rows.hasNext) {
                val row = rows.next()
                val key = keyProj(row)
                if (groupKey == null) {
                  groupKey = key.copy()
                  boundedInsert(buf, row, cmp, limit)
                } else if (key == groupKey) {
                  boundedInsert(buf, row, cmp, limit)
                } else {
                  pendingKey = key.copy()
                  pending = row.asInstanceOf[UnsafeRow].copy()
                  done = true
                }
              }
              emit = emitGroup()
            }
            emit.hasNext
          }

          override def next(): InternalRow = {
            if (!hasNext) throw new NoSuchElementException
            emit.next()
          }
        }
      }, preservesPartitioning = true)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKeyExec {
  /** Partial-stage buffer cap, in ROWS (not keys): ~1M copied UnsafeRows
    * ≈ low hundreds of MB for typical row widths, well inside an
    * executor's task share. Crossing it flushes the map downstream —
    * correctness is unaffected (superset prefilter), only the exchange
    * carries more candidates for pathological key cardinalities.
    */
  val MaxPartialBufferedRows: Long = 1L << 20
}

/** Plans the logical node as partial top-k → (exchange inserted by
  * EnsureRequirements) → final top-k.
  */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: TopKPerKeyPlan =>
      val partial = TopKPerKeyExec(p.keys, p.ordering, p.k, p.rankAttr,
                                   partial = true, planLater(p.child))
      TopKPerKeyExec(p.keys, p.ordering, p.k, p.rankAttr,
                     partial = false, partial) :: Nil
    case _ => Nil
  }
}
