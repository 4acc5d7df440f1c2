package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Rounding.round

/** Skew-mitigation utilities for cluster-scale joins.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin`, left ON in
  * the library sessions) splits oversized partitions at runtime and is
  * the first line of defense. Salting is the explicit fallback for the
  * cases AQE can't fix — a single hot KEY (not partition) on the probe
  * side of a shuffled equi-join, where every row of that key lands on
  * one task no matter how partitions split.
  */
object SkewOps {

  /** Salted inner equi-join on `leftKey == rightKey`: the (large,
    * skewed) left side spreads each hot key across `salts` sub-keys via
    * a deterministic row hash; the (smaller) right side replicates each
    * row to all sub-keys. Equivalent row-for-row to the plain join —
    * every left row still meets every matching right row exactly once —
    * but the hot key's work fans out over `salts` tasks at the cost of
    * replicating the right side `salts`×. Use when one key dominates;
    * keep `salts` ≲ parallelism.
    */
  def saltedJoin(left: DataFrame,
                 right: DataFrame,
                 leftKey: Column,
                 rightKey: Column,
                 leftSaltSource: Column,
                 salts: Int): DataFrame = {
    val l = left.withColumn("__salt", pmod(hash(leftSaltSource), lit(salts)))
    val r = right.withColumn("__salt",
                             explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, leftKey === rightKey && l("__salt") === r("__salt"))
      .drop("__salt")
  }

  /** Bloom sizing for [[bloomSemiJoin]]: fixed so the filter bytes — and
    * therefore the candidate set the audit counts — are deterministic
    * run-to-run. 2¹⁷ bits ≈ 16 KB handles the build side at every test
    * SF with fpp ≪ 1 %; at a real 100 TB build cardinality these scale
    * to the worst case (an undersized bloom prunes less, never lies).
    */
  private val BloomEstItems = 8192L
  private val BloomNumBits = 1L << 17

  /** Bloom-pruned semi-join: the fact-table scan filter that
    * `InjectRuntimeFilter` plants automatically inside one query, made
    * EXPLICIT as a reusable pipeline stage (build a key filter once,
    * prune many scans). Build side: partkeys of small parts
    * (`p_size <= 5`, ~12 % of lineitem). The probe side drops ~87 % of
    * fact rows at the SCAN — before any exchange — via
    * [[graft.functions.BloomExprs.mightContain]] (a scalar-subquery
    * bloom, evaluated once, riding into every task as a literal); the
    * exact semi-join then clears the bloom's false positives, so the
    * visible result is EXACTLY the plain semi-join aggregate — which is
    * what the DuckDB oracle checks. At 100 TB this ordering is the
    * whole game: the shuffle moves the pruned 13 %, not the table.
    *
    * Self-gated like the sketch queries: `bloom_pruned` (the filter
    * actually dropped rows) and `fp_ok` (false-positive overhead ≤ 1 %
    * of the table) are computed from candidate/exact/total counts the
    * audit takes on the same frames; the oracle expects both `true`.
    * The counting passes exist only for the audit — production keeps
    * the filter inline (one pass) and reads these rates from task
    * metrics instead.
    */
  def bloomSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val keys = Tables
      .part(spark, dir)
      .filter(col("p_size") <= 5)
      .select(col("p_partkey"))
    val bloom = keys.agg(
      graft.functions.BloomExprs
        .bloomAgg(xxhash64(col("p_partkey")), BloomEstItems, BloomNumBits)
        .as("bf"))
    val li = Tables.lineitem(spark, dir)
    val candidates = li.filter(
      graft.functions.BloomExprs
        .mightContain(bloom, xxhash64(col("l_partkey"))))
    val exact =
      candidates.join(keys, col("l_partkey") === col("p_partkey"), "left_semi")
    // r13 (§1.2/§2.4): the audit used to read lineitem FOUR times
    // (candidate count, total count, exact count, and the visible
    // aggregate). Now: ONE audit pass computes n_total and n_candidates
    // together as conditional aggregates (the bloom probe rides inside
    // the count — same ReusedSubquery bloom), and n_exact is the sum of
    // the visible aggregate's own per-group counts, so the grouped
    // subtree is shared (ReuseExchange) instead of re-scanned. Plan
    // diff: 4 lineitem scans → 2 (plans/r13/bloom_semi_join_*.txt).
    // The pruned-semi-join shape itself is untouched — candidates →
    // exact semi-join → aggregate is still the production path.
    val grouped = exact
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
           round(sum(col("l_quantity")), 2).as("sum_qty"),
           count_distinct(col("l_partkey")).as("n_parts"))
    val audit = broadcast(
      li.agg(
          count(lit(1)).as("n_total"),
          count(when(graft.functions.BloomExprs
                       .mightContain(bloom, xxhash64(col("l_partkey"))),
                     1)).as("n_candidates"))
        .crossJoin(grouped.agg(sum(col("n_rows")).as("n_exact")))
        .select(
          (col("n_candidates") < col("n_total")).as("bloom_pruned"),
          ((col("n_candidates") - col("n_exact")).cast("double") <=
            col("n_total").cast("double") * lit(0.01)).as("fp_ok")))
    grouped
      .crossJoin(audit)
      .orderBy(col("l_returnflag"))
  }

  /** [[saltedJoin]] as a named end-to-end query: orders ⋈ customer on
    * custkey with 8-way salting, aggregated per market segment (exact
    * integer cents). The oracle is the PLAIN join + aggregate — the
    * whole point of salting is that the result is row-for-row identical
    * while the hot key's probe rows fan out over `salts` tasks.
    *
    * At test SFs customer is broadcast-sized and the salt is pure
    * overhead — the query exists to state the technique end-to-end on
    * real tables. ScaleTechniqueSpec pins the fan-out/equivalence
    * properties on a hot-key fixture; PlanSpec pins that the physical
    * join key includes the salt (the shape AQE cannot produce on its
    * own for a single hot key).
    */
  def saltedJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables
      .orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
              floor(col("o_totalprice") * lit(100) + lit(0.5)).as("cents"))
    val cust = Tables
      .customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    saltedJoin(orders, cust, col("o_custkey"), col("c_custkey"),
               col("o_orderkey"), salts = 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("sum_cents"))
      .orderBy(col("c_mktsegment"))
  }

  // ---- DuckDB oracles ----------------------------------------------------

  val oracles: Map[String, String] = Map(
    // plain-join equivalence: the salt must be invisible in the result
    "salted_join_agg" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS sum_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the bloom is engine-specific; the oracle checks the exact
    // semi-join aggregate the pipeline must reproduce, plus the two
    // audit gate verdicts
    "bloom_semi_join" ->
      """WITH keys AS (SELECT p_partkey FROM part WHERE p_size <= 5)
        |SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |       true AS bloom_pruned, true AS fp_ok
        |FROM lineitem
        |WHERE l_partkey IN (SELECT p_partkey FROM keys)
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
