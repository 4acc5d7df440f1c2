package graft

import org.apache.spark.sql.functions._

/** Pins the OUT-OF-ORDER staging invariants the two `stream_ooo_*`
  * drains rest on ([[graft.streaming.StreamDrain.buildOooStage]]): the
  * chunk files partition the corpus exactly (shifting changes file
  * assignment, never row content), the `_moved` sidecar is nonempty for
  * BOTH boundaries, and every shifted row really sits one chunk file
  * later than rows with later event time while staying within the 10 s
  * watermark of the previous file's max — run on the SPARSEST fixture,
  * where boundary candidates are scarcest and the any-type fallback
  * path is the one exercised.
  */
class OooStagingSpec extends SparkSpec {

  test("OOO staging shifts admissible-late rows one chunk file later") {
    val dir = sf("sf0.001")
    val (stage, moved) = graft.streaming.StreamDrain.oooStaged(spark, dir)
    // the drains' own fail-loud invariants: presence in the target chunk
    // file, strictly behind the previous file's max event time, within
    // the 10 s watermark of it
    graft.streaming.StreamDrain.oooStagingAudit(spark, stage, moved)

    // file assignment only: the staged union is exactly the corpus
    val staged = spark.read.parquet(stage)
    val ev = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    assert(staged.count() === ev.count())
    assert(staged.select("event_id").except(ev.select("event_id")).isEmpty)
    assert(ev.select("event_id").except(staged.select("event_id")).isEmpty)

    // both boundaries shifted at least one row, into chunks 1 and 2
    val perBoundary = moved.groupBy(col("to_chunk")).count()
      .orderBy(col("to_chunk")).collect()
    assert(perBoundary.map(_.getInt(0)).toSeq === Seq(1, 2))
    assert(perBoundary.forall(_.getLong(1) >= 1L))
  }
}
