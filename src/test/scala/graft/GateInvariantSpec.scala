package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Mechanical guards for the driver-gate contract, applied to EVERY
  * registered query — the invariants that have actually bitten in past
  * rounds live here so a new query can't silently violate them.
  */
class GateInvariantSpec extends SparkSpec {

  test("every oracle key names a registered query; only the HLL sketch is rows-only") {
    val queries = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    assert(oracles.subsetOf(queries),
           s"oracles without queries: ${oracles.diff(queries)}")
    assert(queries.diff(oracles) == Set("approx_distinct_users"),
           s"queries without oracles: ${queries.diff(oracles)}")
  }

  test("every query output is scalar-only (driver's row sorter dies on nested types)") {
    val dir = sf("sf0.001")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val schema = q(spark, dir).schema
        schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
    }
    assert(offenders.isEmpty, s"nested output columns: $offenders")
  }
}
