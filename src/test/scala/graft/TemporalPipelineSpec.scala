package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Boundary-semantics specs for the temporal operators (sessionize,
  * as-of join, range join, latest snapshot) and the dataset-construction
  * pipeline ops — tiny planted fixtures where the off-by-one cases are
  * known by construction.
  */
class TemporalPipelineSpec extends SparkSpec {

  /** Write an events.parquet fixture (ts as a µs timestamp, as the driver
    * tables store it) and return its directory.
    */
  private def eventsDir(rows: Seq[(Long, String, Long, String, Double)]): String = {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ev").toString
    rows
      .map { case (id, iso, uid, typ, v) =>
        val ms = java.time.LocalDateTime
          .parse(iso.replace(' ', 'T'))
          .toInstant(java.time.ZoneOffset.UTC)
          .toEpochMilli
        (id, new java.sql.Timestamp(ms), uid, typ, v, "{}")
      }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("sessionize: inclusive 30-minute boundary merges, beyond it splits") {
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 10:00:00", 7L, "click", 1.0),
      (2L, "2024-01-01 10:29:00", 7L, "click", 1.0),     // 29 min gap: same session
      (3L, "2024-01-01 10:59:00", 7L, "click", 1.0),     // exactly 30 min: still merges
      (4L, "2024-01-01 11:00:00", 8L, "view", 1.0),
      (5L, "2024-01-01 11:30:00.001", 8L, "view", 1.0)   // > 30 min: new session
    ))
    val sessions = TemporalOps.sessionize(spark, dir).collect()
    val u7 = sessions.filter(_.getAs[Long]("user_id") == 7L)
    val u8 = sessions.filter(_.getAs[Long]("user_id") == 8L)
    assert(u7.map(_.getAs[Long]("n_events")).toSeq == Seq(3L))
    assert(u8.map(_.getAs[Long]("n_events")).toSeq == Seq(1L, 1L))
    // session end = last event + gap
    assert(u7.head.getAs[java.sql.Timestamp]("session_end").toString
      .startsWith("2024-01-01 11:29:00"))
  }

  test("asof join: boundary event sees its own minute's KPI") {
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 10:00:30", 7L, "click", 10.0),
      (2L, "2024-01-01 10:01:00", 7L, "click", 20.0) // exactly on bucket start
    ))
    val rows = TemporalOps.asofJoin(spark, dir).collect()
    val byId = rows.map(r => r.getAs[Long]("event_id") -> r).toMap
    assert(byId(1L).getAs[Double]("asof_kpi") == 10.0)
    assert(byId(2L).getAs[Double]("asof_kpi") == 20.0)
    assert(byId(2L).getAs[java.sql.Timestamp]("asof_ts").toString
      .startsWith("2024-01-01 10:01:00"))
  }

  test("range join: half-open [start, end) interval semantics") {
    // incident window 1 is click on 2024-01-02 00:00:00 .. 12:00:00
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 23:59:59", 7L, "click", 1.0), // before start: out
      (2L, "2024-01-02 00:00:00", 7L, "click", 1.0), // at start: in
      (3L, "2024-01-02 11:59:59", 7L, "click", 1.0), // inside: in
      (4L, "2024-01-02 12:00:00", 7L, "click", 1.0)  // at end: out (half-open)
    ))
    val rows = TemporalOps.rangeJoin(spark, dir).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("window_id") == 1L)
    assert(rows.head.getAs[Long]("n_events") == 2L)
  }

  test("latest snapshot: equal timestamps break ties by event_id desc") {
    val dir = eventsDir(Seq(
      (5L, "2024-01-01 10:00:00", 7L, "click", 1.0),
      (9L, "2024-01-01 10:00:00", 7L, "view", 2.0),
      (1L, "2024-01-01 09:00:00", 8L, "click", 3.0)
    ))
    val rows = TemporalOps.latestEvents(spark, dir).collect()
    assert(rows.length == 2)
    val u7 = rows.find(_.getAs[Long]("user_id") == 7L).get
    assert(u7.getAs[Long]("event_id") == 9L)
  }

  test("scd2 intervals tile each user's timeline with alternating runs") {
    val rows = TemporalOps.scd2Intervals(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, ivs) =>
      val sorted = ivs.sortBy(_.getAs[Int]("version"))
      assert(sorted.head.getAs[Int]("version") == 1)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // half-open intervals tile: this valid_to IS the next valid_from
          assert(a.getAs[java.sql.Timestamp]("valid_to") ==
            b.getAs[java.sql.Timestamp]("valid_from"))
          // a run only ends when the status actually changes
          assert(a.getAs[String]("status") != b.getAs[String]("status"))
          assert(b.getAs[Int]("version") == a.getAs[Int]("version") + 1)
        case _ => ()
      }
      // exactly one open (current) version per user, and it is the last
      assert(sorted.init.forall(_.getAs[java.sql.Timestamp]("valid_to") != null))
      assert(sorted.last.getAs[java.sql.Timestamp]("valid_to") == null)
    }
  }

  test("cdc merge: tombstones delete, classification matches presence") {
    val dir = sf("sf0.001")
    val rows = TemporalOps.cdcMerge(spark, dir).collect()
    assert(rows.nonEmpty)
    val cut = java.sql.Timestamp.valueOf("2024-01-21 00:00:00")
    val ev = graft.Tables.events(spark, dir)
      .select("user_id", "ts", "event_id", "event_type").collect()
    val byUser = ev.groupBy(_.getAs[Long]("user_id"))
    val out = rows.map(r => r.getAs[Long]("user_id") -> r).toMap
    byUser.foreach { case (u, es) =>
      val last = es.maxBy(e => (e.getAs[java.sql.Timestamp]("ts").getTime,
                                e.getAs[Long]("event_id")))
      val lastIsTombstone = last.getAs[String]("event_type") == "error" &&
        !last.getAs[java.sql.Timestamp]("ts").before(cut)
      if (lastIsTombstone) assert(!out.contains(u), s"user $u should be deleted")
      else {
        val r = out(u)
        assert(r.getAs[Long]("last_event_id") == last.getAs[Long]("event_id"))
        val hasBase = es.exists(_.getAs[java.sql.Timestamp]("ts").before(cut))
        val hasChg = es.exists(!_.getAs[java.sql.Timestamp]("ts").before(cut))
        val expected =
          if (!hasBase) "inserted" else if (!hasChg) "unchanged" else "updated"
        assert(r.getAs[String]("merge_action") == expected)
      }
    }
  }

  test("temperature resample flattens the language mix toward α=0.5") {
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val before = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = PipelineOps.temperatureResample(spark, sf("sf0.001")).collect()
    val after = out.groupBy(_.getAs[String]("lang")).map { case (l, rs) => l -> rs.length.toLong }
    val n = before.values.sum.toDouble
    // total size preserved in expectation (hash draw is ±O(√n) around it)
    assert(math.abs(out.length - n) / n < 0.05)
    // tempered target share: sqrt(n_l)/Σsqrt — achieved share must land
    // nearer the target than the raw share for every language
    val sumSqrt = before.values.map(v => math.sqrt(v.toDouble)).sum
    before.foreach { case (l, nl) =>
      val target = math.sqrt(nl.toDouble) / sumSqrt
      val raw = nl / n
      val achieved = after(l) / out.length.toDouble
      assert(math.abs(achieved - target) < math.abs(raw - target) ||
        math.abs(raw - target) < 0.01,
        s"$l: raw=$raw target=$target achieved=$achieved")
    }
    // no document is ever dropped AND repeated inconsistently: copies are 1..k
    out.groupBy(r => r.getAs[Long]("doc_id")).values.foreach { copies =>
      val idx = copies.map(_.getAs[Long]("copy_index")).sorted
      assert(idx.toSeq == (1L to idx.length).toSeq)
    }
  }

  test("stratified sample is deterministic and respects per-type rates") {
    val dir = sf("sf0.001")
    val a = PipelineOps.stratifiedSample(spark, dir).collect()
    val b = PipelineOps.stratifiedSample(spark, dir).collect()
    assert(a.map(_.getAs[Long]("event_id")).toSeq ==
      b.map(_.getAs[Long]("event_id")).toSeq)
    // purchase is sampled at 100%: every purchase event must be kept
    val purchases = graft.Tables.events(spark, dir)
      .filter(col("event_type") === "purchase").count()
    assert(a.count(_.getAs[String]("event_type") == "purchase") == purchases)
    // view at 5%: strictly fewer than all views kept
    val views = graft.Tables.events(spark, dir)
      .filter(col("event_type") === "view").count()
    assert(a.count(_.getAs[String]("event_type") == "view") < views)
  }

  test("pack_sequences: contiguous fill, bin advances at the budget line") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pk").toString
    // three docs of exactly 300 whitespace tokens each; budget is 512
    val text = Seq.fill(300)("w").mkString(" ")
    Seq((1L, text, "en", "s", text.length.toLong),
        (2L, text, "en", "s", text.length.toLong),
        (3L, text, "en", "s", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = PipelineOps.packSequences(spark, dir).collect()
    val bins = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bin")).toMap
    assert(bins == Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
    assert(rows.find(_.getAs[Long]("doc_id") == 3L).get
      .getAs[Long]("offset_tokens") == 600L)
  }

  test("quality filter: duplicates lose to the canonical min doc_id") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("qf").toString
    val good = ("the quick brown fox jumps over a lazy dog and then " +
      "it runs off to the woods for a while") // stopword-rich, diverse, 20 tokens
    Seq((1L, good, "en", "s", good.length.toLong),
        (2L, good, "en", "s", good.length.toLong), // exact dup of 1
        (3L, "tiny doc", "en", "s", 8L))           // too short
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = PipelineOps.qualityFilter(spark, dir).collect()
    val reason = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("reason")).toMap
    assert(reason(1L) == "kept")
    assert(reason(2L) == "exact_duplicate")
    assert(reason(3L) == "too_short")
  }

  test("embed_quantize: known-vector quantization") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("eq").toString
    Seq((1L, Seq(1.0f, -0.5f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = operators.VectorOps.embedQuantize(spark, dir).head()
    assert(r.getAs[Double]("scale") == 127.0)
    // q = [127, floor(-63.5 + 0.5) = -63]
    assert(r.getAs[Long]("q_sum") == 64L)
    assert(r.getAs[Int]("q_min") == -63 && r.getAs[Int]("q_max") == 127)
  }

  test("anti/semi joins agree with the subtractive definition") {
    val dir = sf("sf0.001")
    val orders = graft.Tables.orders(spark, dir)
    val returned = graft.Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey")).distinct()
    val expected = orders.count() - orders
      .join(returned, col("o_orderkey") === col("l_orderkey")).count()
    assert(OlapOps.ordersNoReturns(spark, dir).count() == expected)
    // set-op consistency: intersect + except partition the view days
    val both = MiscOps.usersClickAndPurchase(spark, dir).count()
    assert(both > 0)
  }

  test("poly_hash: known values and SQL registration") {
    val session = spark
    import session.implicits._
    val v = Seq("ab").toDF("s")
      .select(graft.functions.TextExprs.polyHash(col("s")).as("h"))
      .head().getLong(0)
    assert(v == 97L * 257L + 98L)
  }

  test("token_counts: normalized, case-folded, first-seen order") {
    val session = spark
    import session.implicits._
    val rows = Seq("The  the cat").toDF("s")
      .select(explode(graft.functions.TextExprs.tokenCounts(col("s"))).as("tc"))
      .select(col("tc.token"), col("tc.tf"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq == Seq(("the", 2L), ("cat", 1L)))
  }

  test("midstate reader: batch-1 session store equals the time-sliced, " +
       "watermark-evicted batch sessionization") {
    val dir = sf("sf0.001")
    val mid = graft.streaming.StreamDrain.streamMidstateReader(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
                 r.getTimestamp(2).getTime, r.getLong(3)) -> r.getDouble(4))
      .toMap

    // independent DataFrame-API re-derivation of the oracle: sentinel
    // unioned into the ntile ranking, first two chunks sessionized,
    // sessions ending at-or-below batch 1's watermark evicted
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    val sentinel = spark.range(1).select(
      lit(-1L).as("event_id"),
      lit(new java.sql.Timestamp(maxTs.getTime + 7200000L)).as("ts"),
      lit(-1L).as("user_id"), lit(1.0).as("value"))
    val chunked = ev.unionAll(sentinel).withColumn(
      "chunk",
      ntile(3).over(org.apache.spark.sql.expressions.Window
        .orderBy(col("ts"), col("event_id"))) - 1)
    val wmUs = (chunked.filter(col("chunk") === 0)
      .agg(max(col("ts"))).head().getTimestamp(0).getTime - 10000L) * 1000L
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val runByUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"))
      .rowsBetween(Long.MinValue, 0)
    val oracle = chunked
      .filter(col("chunk") <= 1)
      .withColumn("prev", lag(col("ts"), 1).over(byUser))
      .withColumn("new_s",
                  when(col("prev").isNull ||
                    unix_micros(col("ts")) - unix_micros(col("prev")) >
                      1800L * 1000000L, 1).otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(runByUser))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts")).as("st"), max(col("ts")).as("lastTs"),
           count(lit(1)).as("n"),
           sum(graft.functions.Rounding.microUnits(col("value"))).as("sm"))
      .withColumn("en", timestamp_micros(unix_micros(col("lastTs")) +
        1800L * 1000000L))
      .filter(unix_micros(col("en")) > wmUs)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(2).getTime,
                 r.getTimestamp(6).getTime, r.getLong(4)) ->
        // same half-up definition as the engine/DuckDB side
        // (Rounding.scalar = floor(x·1e4 + 0.5)/1e4); math.rint here
        // would be half-EVEN and diverge whenever a session's
        // micro-unit sum is ≡50 mod 100
        graft.functions.Rounding.scalar(r.getLong(5).toDouble / 1e6, 4))
      .toMap

    assert(mid.keySet == oracle.keySet)
    assert(mid.nonEmpty)
    mid.foreach { case (k, v) => assert(math.abs(v - oracle(k)) < 1e-9) }
  }

  test("midstate join reader: batch-2 buffers equal the time-sliced, " +
       "horizon-evicted click/purchase sets") {
    val dir = sf("sf0.001")
    val mid = graft.streaming.StreamDrain.streamMidstateJoinReader(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(3)))
      .toSet

    val chunked = Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"),
              col("event_type"), col("value"))
      .withColumn("chunk",
                  ntile(5).over(org.apache.spark.sql.expressions.Window
                    .orderBy(col("ts"), col("event_id"))) - 1)
    val wmRow = chunked.filter(col("chunk") <= 1).agg(
      max(when(col("event_type") === "click", unix_millis(col("ts")))),
      max(when(col("event_type") === "purchase", unix_millis(col("ts")))))
      .head()
    val wmUs = (math.min(wmRow.getLong(0), wmRow.getLong(1)) - 10000L) * 1000L
    val seen = chunked.filter(col("chunk") <= 2)
    val oracle = (seen
      .filter(col("event_type") === "click" &&
        unix_micros(col("ts")) >= wmUs - 600000000L)
      .select(lit("click").as("side"), col("event_id")) unionAll seen
      .filter(col("event_type") === "purchase" &&
        unix_micros(col("ts")) >= wmUs)
      .select(lit("purchase").as("side"), col("event_id")))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

    assert(mid == oracle)
    assert(mid.exists(_._1 == "click") && mid.exists(_._1 == "purchase"))
  }

  test("kpi rollup: grand total equals the sum of per-type subtotals") {
    val df = OlapOps.kpiRollup(spark, sf("sf0.001")).collect()
    val grand = df.find(r =>
      r.getAs[String]("event_type") == "ALL" && r.getAs[String]("status") == "ALL").get
    val typeTotals = df.filter(r =>
      r.getAs[String]("event_type") != "ALL" && r.getAs[String]("status") == "ALL")
    assert(typeTotals.map(_.getAs[Long]("n_events")).sum == grand.getAs[Long]("n_events"))
  }
}
