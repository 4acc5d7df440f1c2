package graft

import graft.operators.DedupOps
import graft.sources.ColdStore
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Cold-store layout guards: the two storage shapes that matter at
  * 100 TB — date-partitioned facts must prune directories (the predicate
  * lands in PartitionFilters, not a post-scan data filter), and
  * same-bucketed tables must join with zero shuffle.
  */
class ColdStoreSpec extends SparkSpec {

  test("date-partitioned events: day predicate prunes directories") {
    val out = java.nio.file.Files
      .createTempDirectory("cold").toString + "/events_by_day"
    ColdStore.writeEventsByDay(spark, sf("sf0.001"), out)
    val day = Tables
      .events(spark, sf("sf0.001"))
      .select(date_format(min(col("ts")), "yyyy-MM-dd"))
      .head.getString(0)
    val df = ColdStore.readDay(spark, out, day)
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    // pruned at the directory level…
    assert(scan.partitionFilters.exists(_.toString.contains("event_date")))
    // …and never re-checked row by row
    assert(!scan.dataFilters.exists(_.toString.contains("event_date")))
    val direct = Tables
      .events(spark, sf("sf0.001"))
      .filter(to_date(col("ts")) === to_date(lit(day)))
      .count()
    assert(df.count() == direct && direct > 0)
  }

  test("co-bucketed tables join with zero exchanges") {
    val base = java.nio.file.Files.createTempDirectory("bucketed").toString
    ColdStore.writeBucketed(
      Tables.documents(spark, sf("sf0.001"))
        .select(col("doc_id"), col("source"), col("n_chars")),
      "docs_meta_b", s"$base/meta", "doc_id", 8)
    ColdStore.writeBucketed(
      DedupOps.dedupCascade(spark, sf("sf0.001")),
      "docs_verdict_b", s"$base/verdict", "doc_id", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark
        .table("docs_meta_b")
        .join(spark.table("docs_verdict_b"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
             s"bucketed join still shuffles:\n$plan")
      assert(joined.count() ==
        Tables.documents(spark, sf("sf0.001")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS docs_meta_b")
      spark.sql("DROP TABLE IF EXISTS docs_verdict_b")
    }
  }
}
