package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Mechanical guards for the driver-gate contract, applied to EVERY
  * registered query — the invariants that have actually bitten in past
  * rounds live here so a new query can't silently violate them.
  */
class GateInvariantSpec extends SparkSpec {

  test("every oracle key names a registered query; every query has an oracle") {
    val queries = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    assert(oracles.subsetOf(queries),
           s"oracles without queries: ${oracles.diff(queries)}")
    // since r5 even the HLL sketch query is oracle-checked (it
    // self-gates via within_tolerance) — no rows-only queries remain
    assert(queries.diff(oracles).isEmpty,
           s"queries without oracles: ${queries.diff(oracles)}")
  }

  test("drain registry == the stream_-prefixed query names") {
    // Bench splits drain_total out of batch_extended_total using the
    // EXPLICIT SparkEntry.drainQueries registry; this pin means a new
    // drain registered under a non-stream_ name (or a stream_ query
    // missing from the registry) fails the build instead of silently
    // skewing round-over-round engine comparisons.
    val prefixed = SparkEntry.queries.keySet.filter(_.startsWith("stream_"))
    assert(SparkEntry.drainQueries === prefixed,
           s"registry-only: ${SparkEntry.drainQueries.diff(prefixed)}; " +
             s"prefix-only: ${prefixed.diff(SparkEntry.drainQueries)}")
  }

  test("bench-only session config cannot leak into library code") {
    // Bench.scala deliberately disables AQE and shrinks shuffle
    // partitions for the local micro-bench; a cluster session must never
    // inherit that posture. Guard: no file in the library surface may
    // set either knob, and the running test session — built the way
    // Verify builds its session — still has AQE on. Allowlisted mains
    // (each its own JVM, never a library entry point): Bench.scala,
    // ScalingProbe.scala (mirrors Bench's session so its 1× times are
    // comparable to BENCH_RUNS.json), and ThroughputProbe.scala (the
    // sustained-latency probe, whose measured stateful-streaming
    // posture pins shuffle partitions = state commit fan-out — a
    // documented per-deployment latency setting, not library default),
    // and QueryProbe.scala (the optimization-round dev harness that
    // must reproduce Bench's exact session posture to be comparable).
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    val offenders = java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala") &&
        !p.endsWith("Bench.scala") && !p.endsWith("ScalingProbe.scala") &&
        !p.endsWith("ThroughputProbe.scala") && !p.endsWith("QueryProbe.scala"))
      .filter { p =>
        val src = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        src.contains("spark.sql.adaptive.enabled") ||
        src.contains("""config("spark.sql.shuffle.partitions", 8)""")
      }
      .map(_.toString)
      .toList
    assert(offenders.isEmpty, s"bench-only config set outside Bench.scala: $offenders")
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
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
