package graft

import graft.sources.EventGenerator
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** DSv2 synthetic-event source: exact parity with the column-expression
  * generator, explicit partition planning, and honored column pruning.
  */
class EventsV2Spec extends SparkSpec {

  private def v2(rows: Long, partitions: Int) =
    spark.read.format("graft-events")
      .option("rows", rows)
      .option("partitions", partitions)
      .option("start", "2024-01-01 00:00:00")
      .load()

  test("row-for-row parity with EventGenerator.batchEvents") {
    val a = v2(1000, 4).orderBy("event_id").collect()
    val b = EventGenerator.batchEvents(spark, 1000, "2024-01-01 00:00:00")
      .orderBy("event_id").collect()
    assert(a.length == 1000 && b.length == 1000)
    assert(a.sameElements(b))
  }

  test("partition planning matches the requested split count") {
    assert(v2(1000, 7).rdd.getNumPartitions == 7)
    // more partitions than rows: empty splits are dropped, not emitted
    assert(v2(3, 8).rdd.getNumPartitions == 3)
    assert(v2(3, 8).count() == 3)
  }

  test("column pruning reaches the scan (ReadSchema shrinks)") {
    val pruned = v2(100, 2).select("event_id", "status")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().collect {
      case b: BatchScanExec => b
    }.head
    assert(scan.scan.readSchema().fieldNames.toSet == Set("event_id", "status"))
    // count(*) prunes to zero columns and still counts rows
    assert(v2(500, 2).groupBy().count().head().getLong(0) == 500)
  }

  test("micro-batch stream: paced offsets, exactly-once across restart") {
    val out = java.nio.file.Files.createTempDirectory("ev2out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ev2ckpt").toString
    def stream() = spark.readStream.format("graft-events")
      .option("rows", 5000)
      .option("rowsPerBatch", 1000)
      .option("start", "2024-01-01 00:00:00")
      .load()
    def start() = stream().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        b.write.mode("overwrite").parquet(s"$out/batch_$id")
        ()
      }
      .start()

    // first run: drain two paced batches, then stop mid-stream
    val q1 = start()
    try {
      var waited = 0
      while (waited < 300 &&
             new java.io.File(out).listFiles().length < 2) {
        Thread.sleep(100); waited += 1
      }
    } finally { q1.stop(); q1.awaitTermination() }

    // restart from the checkpoint: must resume at the committed offset
    // and finish the remaining ids with no duplicates and no gaps
    val q2 = start()
    try q2.processAllAvailable()
    finally q2.stop()

    val all = spark.read.parquet(s"$out/batch_*")
    assert(all.count() == 5000)
    assert(all.select("event_id").distinct().count() == 5000)
    // pacing: > 1 micro-batch happened (5000 rows at 1000/batch)
    assert(new java.io.File(out).listFiles().length >= 5)
  }

  test("Trigger.AvailableNow drains the whole source, not one slice") {
    // regression pin for the ReadLimit fix: with the limit ignored, an
    // AvailableNow run ended after rowsPerBatch rows — silent data loss
    val out = java.nio.file.Files.createTempDirectory("ev2an").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ev2anck").toString
    val q = spark.readStream.format("graft-events")
      .option("rows", 3000)
      .option("rowsPerBatch", 500)
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        b.write.mode("overwrite").parquet(s"$out/batch_$id")
        ()
      }
      .start()
    val finished = q.awaitTermination(120000)
    if (!finished) q.stop()
    assert(finished, "AvailableNow drain timed out — not a ReadLimit failure")
    val all = spark.read.parquet(s"$out/batch_*")
    assert(all.count() == 3000)
    assert(all.select("event_id").distinct().count() == 3000)
  }

  test("deterministic across re-reads (retry/speculation safety)") {
    def contentHash(df: org.apache.spark.sql.DataFrame): Long = df
      .select(xxhash64(col("event_id"), col("source"), col("metric"),
                       col("status"), col("user_id")).as("h"))
      .agg(expr("bit_xor(h)")) // order-free, overflow-free combine
      .head().getLong(0)
    val h1 = contentHash(v2(2000, 3))
    val h2 = contentHash(v2(2000, 5))
    assert(h1 == h2) // same content regardless of split count
  }
}
