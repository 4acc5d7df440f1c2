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

  test("OOO boundary preference picks same-type gaps where the corpus has them") {
    // sf0.01 has 49 same-type tight gaps — the strong path the sparse
    // fixture can't exercise: at least one shifted row must share its
    // boundary row's event type, arming the two-batch grown-pane
    // assertion in stream_ooo_kpi_drain
    val (stage, moved) = graft.streaming.StreamDrain.oooStaged(spark, sf("sf0.01"))
    graft.streaming.StreamDrain.oooStagingAudit(spark, stage, moved)
    assert(moved.filter(col("strong")).count() >= 1L,
           "no strong (same-type) shifted row at sf0.01 — the preference " +
             "logic stopped selecting same-type boundaries")
  }

  test("session-OOO staging: strong rows carry an earlier-batch in-session prior") {
    val (stage, moved) =
      graft.streaming.StreamDrain.oooSessionStaged(spark, sf("sf0.01"))
    graft.streaming.StreamDrain.oooStagingAudit(spark, stage, moved)
    val strong = moved.filter(col("strong"))
    assert(strong.count() >= 1L,
           "no strong shifted row at sf0.01 — the session boundary " +
             "preference stopped finding same-user in-session priors")
    // the prior is in-session (STRICTLY under the 30-min gap —
    // session_window merges on [start, start + gap)) and old enough to
    // provably stay below the shift band of its boundary
    val bad = strong.filter(
      col("prior_ms").isNull ||
        col("prior_ms") >= col("boundary_ms") - 9000L ||
        unix_millis(col("ts")) - col("prior_ms") >= 1800000L)
    assert(bad.isEmpty, "a strong row's prior violates the in-session / " +
      "earlier-batch bounds the drain's merge assertion relies on")
    // the sentinel chunk exists as the 4th micro-batch file
    assert(new java.io.File(s"$stage/chunk-0003.parquet").exists())
  }
}
