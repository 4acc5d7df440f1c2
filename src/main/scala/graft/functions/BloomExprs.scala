package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column wrappers over Spark's internal bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the pair the
  * optimizer's own `InjectRuntimeFilter` rule plants for shuffle-join
  * pruning, not exposed in `functions._`). Wrapping them instead of
  * re-implementing a sketch keeps the exact production bloom (same
  * hashing, same sizing heuristics) available to EXPLICIT pipelines:
  * a curation job that builds a key filter once and prunes several
  * fact scans with it can't rely on the optimizer rule, which only
  * fires inside a single join query.
  *
  * Both sides hash with `xxhash64` (caller-supplied, so build and probe
  * visibly agree) and the filter reaches the probe as a SCALAR SUBQUERY
  * — `might_contain` requires a constant or subquery bloom (enforced by
  * its type check), which is what lets it evaluate once and ride into
  * every probe task as a literal.
  */
object BloomExprs {

  /** Aggregate a hashed-long column into bloom-filter bytes.
    * `numBits` is the real size knob (`k ≈ numBits/expectedItems · ln 2`
    * hash functions); size for the WORST-case build cardinality — an
    * undersized bloom silently degrades to "prune nothing", never to
    * wrong results (no false negatives).
    */
  def bloomAgg(hashed: Column, expectedItems: Long, numBits: Long): Column =
    GraftSqlBridge.toCol(
      new BloomFilterAggregate(GraftSqlBridge.toExpr(hashed),
                               Literal(expectedItems),
                               Literal(numBits)).toAggregateExpression())

  /** Membership probe against the one-row bloom frame `bloomDf`
    * (planted as a scalar subquery). False positives possible, false
    * negatives never — callers needing exact semantics follow with an
    * exact semi-join on the surviving rows.
    */
  def mightContain(bloomDf: DataFrame, hashed: Column): Column =
    GraftSqlBridge.toCol(
      new BloomFilterMightContain(
        ScalarSubquery(GraftSqlBridge.logicalPlan(bloomDf)),
        GraftSqlBridge.toExpr(hashed)))
}
