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

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val boundKeys = keys.map(BindReferences.bindReference(_, childOutput))
    val boundOrder = ordering.map(o =>
      o.copy(child = BindReferences.bindReference(o.child, childOutput)))
    val limit = k
    val emitRank = !partial
    val outSchema = output
    child.execute().mapPartitions({ rows =>
      val keyProj = UnsafeProjection.create(boundKeys)
      val cmp = new LazilyGeneratedOrdering(boundOrder)
      // LinkedHashMap: deterministic (first-seen key) emission order
      val buffers =
        new java.util.LinkedHashMap[UnsafeRow, java.util.ArrayList[UnsafeRow]]()
      rows.foreach { row =>
        val key = keyProj(row)
        var buf = buffers.get(key)
        if (buf == null) {
          buf = new java.util.ArrayList[UnsafeRow](limit + 1)
          buffers.put(key.copy(), buf)
        }
        // bounded insertion sort: skip fast when the row can't make the cut
        if (buf.size() < limit ||
            cmp.compare(row, buf.get(buf.size() - 1)) < 0) {
          val copy = row.asInstanceOf[UnsafeRow].copy()
          var lo = 0
          var hi = buf.size()
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (cmp.compare(copy, buf.get(mid)) < 0) hi = mid else lo = mid + 1
          }
          buf.add(lo, copy)
          if (buf.size() > limit) buf.remove(limit)
        }
      }
      val outProj = UnsafeProjection.create(outSchema, outSchema)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      import scala.jdk.CollectionConverters._
      buffers.entrySet().iterator().asScala.flatMap { e =>
        val buf = e.getValue
        (0 until buf.size()).iterator.map { i =>
          if (emitRank) {
            rankRow.update(0, i + 1)
            outProj(joined(buf.get(i), rankRow))
          } else buf.get(i): InternalRow
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
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
