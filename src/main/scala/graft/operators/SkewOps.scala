package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
