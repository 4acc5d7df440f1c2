package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Semantic specs for the change-point / seasonal / entropy / skyline
  * operators — planted-signal and brute-force checks that complement the
  * DuckDB oracle gate's engine-parity hashing.
  */
class DetectorSpec extends SparkSpec {

  private val T0 = 1700000000000L
  private val Min = 60000L

  private def writeEvents(rows: Seq[(Long, java.sql.Timestamp, Long, String,
                                     Double, String)]): String = {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("det").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def ev(id: Long, typ: String, offMs: Long, v: Double) =
    (id, new java.sql.Timestamp(T0 + offMs), 1L, typ, v, "{}")

  test("cusum: a planted mean shift fires; a flat series never does") {
    // type "shifted": 60 min at 10.0 then 60 min at 20.0 — a 2σ step
    // (σ = 5 over the pooled series), which CUSUM accumulates at
    // (x−μ−σ/2) = 2.5 per bucket and crosses h = 4σ = 20 within 8
    // buckets on each side of the change. type "flat": constant value,
    // σ = 0 → h = 0 and s stays exactly 0, so `> h` never fires.
    val rows =
      (0 until 60).map(i => ev(i, "shifted", i * Min, 10.0)) ++
        (60 until 120).map(i => ev(i, "shifted", i * Min, 20.0)) ++
        (0 until 120).map(i => ev(200L + i, "flat", i * Min, 7.0))
    val df = SeriesOps.cusumChangepoints(spark, writeEvents(rows))
    val byType = df.collect().map(r => r.getString(0) -> r).toMap
    assert(byType("shifted").getAs[Long]("n_shifts_up") >= 1)
    assert(byType("shifted").getAs[Long]("n_shifts_down") >= 1)
    assert(byType("flat").getAs[Long]("n_shifts_up") == 0)
    assert(byType("flat").getAs[Long]("n_shifts_down") == 0)
    assert(byType("flat").getAs[Double]("baseline_sigma") == 0.0)
    assert(byType("flat").getAs[Double]("baseline_mean") == 7.0)
  }

  test("seasonal anomaly: one planted bad hour in a month of rhythm") {
    // 30 days × hour 3 at value 100, except day 15 spikes to 200:
    // that slot's z ≈ 5.4 > 3 → exactly one anomalous hour; the quiet
    // constant slots have σ = 0 → z NULL → never counted.
    val hour = 3600000L
    val rows = (0 until 30).flatMap { day =>
      val v = if (day == 15) 200.0 else 100.0
      Seq(ev(day.toLong, "kpi", day * 24 * hour + 3 * hour, v),
          ev(1000L + day, "kpi", day * 24 * hour + 9 * hour, 50.0))
    }
    val df = SeriesOps.seasonalAnomaly(spark, writeEvents(rows))
    val r = df.collect().head
    assert(r.getString(0) == "kpi")
    assert(r.getAs[Long]("n_hours") == 60)
    assert(r.getAs[Long]("n_anomalous_hours") == 1)
    assert(r.getAs[Double]("max_abs_z") > 3.0)
  }

  test("hourly entropy: uniform load → 1.0, single-hour load → 0.0") {
    val hourMs = 3600000L
    val rows =
      // "uniform": exactly 5 events in each of the 24 hours
      (0 until 24).flatMap(h =>
        (0 until 5).map(i =>
          ev(h * 10L + i, "uniform", h * hourMs + i * 1000L, 1.0))) ++
        // "burst": everything in one hour
        (0 until 50).map(i => ev(5000L + i, "burst", i * 1000L, 1.0))
    val df = SeriesOps.hourlyEntropy(spark, writeEvents(rows))
    val byType =
      df.collect().map(r => r.getString(0) -> r).toMap
    assert(byType("uniform").getAs[Double]("norm_entropy") == 1.0)
    assert(byType("uniform").getAs[Long]("n_events") == 120)
    assert(byType("burst").getAs[Double]("entropy_bits") == 0.0)
    assert(byType("burst").getAs[Double]("norm_entropy") == 0.0)
  }

  test("ks drift: a planted location shift fires; identical halves don't") {
    // the split cut is 2024-01-16 00:00 UTC; place halves either side
    val before = 1704844800000L - T0 // 2024-01-10 as an offset from T0
    val after = 1705708800000L - T0 // 2024-01-20
    val rows =
      // "shifted": 200 draws at value v, then 200 at v+50 — a pure
      // location shift (bands would need to straddle a boundary; the
      // exact ECDF gap is ~1.0 regardless)
      (0 until 200).map(i =>
        ev(i, "shifted", before + i * 60000L, 10.0 + (i % 10))) ++
        (0 until 200).map(i =>
          ev(500L + i, "shifted", after + i * 60000L, 60.0 + (i % 10))) ++
        // "same": the identical value multiset in both halves → gap 0
        (0 until 200).map(i => ev(2000L + i, "same", before + i * 60000L,
                                  10.0 + (i % 10))) ++
        (0 until 200).map(i => ev(2500L + i, "same", after + i * 60000L,
                                  10.0 + (i % 10)))
    val byType = SeriesOps.driftKs(spark, writeEvents(rows))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(byType("shifted").getAs[Boolean]("drifted"))
    assert(byType("shifted").getAs[Double]("ks_stat") == 1.0)
    assert(!byType("same").getAs[Boolean]("drifted"))
    assert(byType("same").getAs[Double]("ks_stat") == 0.0)
  }

  test("mutual info: exact independence yields exactly zero bits") {
    // counts proportional across the grid (every (type, hour) cell =
    // base * type-multiplier): p(t,h) = p(t)p(h), every ln ratio is
    // ln(1) = 0 — MI must be EXACTLY 0.0, not merely small
    val hourMs = 3600000L
    var id = 0L
    val rows = for {
      (typ, mult) <- Seq(("a", 1), ("b", 2))
      h <- 0 until 4
      i <- 0 until (3 * mult)
    } yield { id += 1; ev(id, typ, h * hourMs + i * 1000L, 1.0) }
    val r = SeriesOps.mutualInfo(spark, writeEvents(rows)).head()
    assert(r.getAs[Long]("n_events") == 36)
    assert(r.getAs[Long]("n_cells") == 8)
    assert(r.getAs[Double]("mi_bits") == 0.0)
  }

  test("slo burn: an active error storm pages; a recovered one doesn't") {
    val hourMs = 3600000L
    // "storm": clean for 5h, then the last hour ~50% errors (value>=100)
    // → long burn ~8.3x, short ~50x → page. "recovered": the same storm
    // placed in hours 1-2, last hour clean → short burn 0 → NO page
    // (the multiwindow rule's whole point).
    val rows =
      (0 until 500).map(i => ev(i, "storm", (i % 5) * hourMs + i * 10L,
                                10.0)) ++
        (0 until 100).map(i => ev(1000L + i, "storm",
                                  5 * hourMs + i * 30000L,
                                  if (i % 2 == 0) 150.0 else 10.0)) ++
        (0 until 100).map(i => ev(2000L + i, "recovered",
                                  1 * hourMs + i * 30000L,
                                  if (i % 2 == 0) 150.0 else 10.0)) ++
        (0 until 500).map(i => ev(3000L + i, "recovered",
                                  (2 + i % 4) * hourMs + i * 10L, 10.0))
    val byType = KpiOps.sloBurnRate(spark, writeEvents(rows))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(byType("storm").getAs[Boolean]("page"))
    assert(!byType("recovered").getAs[Boolean]("page"))
  }

  test("ab test: a planted arm effect is significant; no-conversion is null") {
    val session = spark
    import session.implicits._
    def arm(uid: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(uid.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if ("01234567".contains(hex.charAt(0))) "A" else "B"
    }
    // arm-A users convert, arm-B users never do → huge z
    val rows = (1L to 200L).flatMap { uid =>
      val base = Seq(ev(uid * 10, "view", uid * 1000L, 1.0)
        .copy(_3 = uid))
      if (arm(uid) == "A")
        base :+ ev(uid * 10 + 1, "purchase", uid * 1000L + 500L, 1.0)
          .copy(_3 = uid)
      else base
    }
    val r = FunnelOps.abTestConversion(spark, writeEvents(rows)).head()
    assert(r.getAs[Double]("rate_a") == 1.0)
    assert(r.getAs[Double]("rate_b") == 0.0)
    assert(r.getAs[Boolean]("significant"))
    // nobody converts → pooled variance 0 → z and verdict NULL
    val quiet = (1L to 50L).map(uid =>
      ev(uid, "view", uid * 1000L, 1.0).copy(_3 = uid))
    val q = FunnelOps.abTestConversion(spark, writeEvents(quiet)).head()
    assert(q.isNullAt(q.fieldIndex("z_stat")))
    assert(q.isNullAt(q.fieldIndex("significant")))
  }

  test("burstiness: one-minute spike is bursty, metronome traffic is not") {
    val rows =
      // "spike": 300 events in minute 0, then one event at minute 299
      // to stretch the span
      (0 until 300).map(i => ev(i, "spike", i * 100L, 1.0)) ++
        Seq(ev(400L, "spike", 299 * 60000L, 1.0)) ++
        // "steady": exactly one event per minute for 300 minutes
        (0 until 300).map(i => ev(1000L + i, "steady", i * 60000L, 1.0))
    val byType = SeriesOps.burstinessFano(spark, writeEvents(rows))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(byType("spike").getAs[Boolean]("bursty"))
    assert(byType("spike").getAs[Double]("fano") > 100)
    assert(!byType("steady").getAs[Boolean]("bursty"))
    assert(byType("steady").getAs[Double]("fano") == 0.0)
  }

  test("holt-winters: a perfect daily sawtooth forecasts its next hour") {
    val hourMs = 3600000L
    // 10 days of a noiseless 24-hour sawtooth: value at hour h is
    // 100 + (h mod 24). After warm-up the seasonal ring converges to
    // the sawtooth shape, trend ≈ 0, and forecast_1 lands near the true
    // next value (hour 240 → 100 + 240 mod 24 = 100).
    val rows = (0 until 240).map(h =>
      ev(h, "saw", h * hourMs, 100.0 + (h % 24)))
    val r = SeriesOps.seriesHw(spark, writeEvents(rows)).head()
    assert(r.getAs[Long]("n_buckets") == 240)
    assert(math.abs(r.getAs[Double]("trend")) < 0.5)
    // with the correct ring slot (n mod 24 → hour 0) the converged
    // forecast sits well inside one seasonal step of the true value;
    // the wrong slot (hour 1's seasonal) would miss by ~1.0
    assert(math.abs(r.getAs[Double]("forecast_1") - 100.0) < 0.75,
           s"forecast was ${r.getAs[Double]("forecast_1")}")
    val amp = r.getAs[Double]("season_amp")
    assert(amp > 15.0 && amp < 26.0, s"amp was $amp")
  }

  test("sax motifs: a repeating daily shape yields period-count motifs") {
    val hourMs = 3600000L
    // 10 days of the noiseless sawtooth: the symbol stream has period
    // 24 (runs of a/b/c/d), so at most 24 distinct phase words exist
    // and every one recurs at least daily (9+ times across 10 days;
    // within-run words like 'aaaa' recur several times per day)
    val rows = (0 until 240).map(h =>
      ev(h, "saw", h * hourMs, 100.0 + (h % 24)))
    val motifs = SeriesOps.saxMotifs(spark, writeEvents(rows)).collect()
    assert(motifs.nonEmpty)
    assert(motifs.length <= 24)
    assert(motifs.forall(_.getAs[Long]("n_occurrences") >= 9))
    // and a pure-noise-free CONSTANT series yields exactly one motif:
    // sigma = 0 pins z = 0 → all-'c' words
    val flat = (0 until 100).map(h =>
      ev(1000L + h, "flat", h * hourMs, 42.0))
    val fm = SeriesOps.saxMotifs(spark, writeEvents(flat)).collect()
    assert(fm.length == 1 && fm.head.getAs[String]("word") == "cccc")
    assert(fm.head.getAs[Long]("n_occurrences") == 97)
  }

  test("theil-sen: recovers the exact slope through planted outliers") {
    val hourMs = 3600000L
    // a perfect 0.5/hour line with 5 wild outlier hours: < 10% of
    // pairs touch an outlier, so the MEDIAN pairwise slope is exactly
    // the clean 50 centi/hour → 12.0 units/day (OLS would be dragged)
    val rows = (0 until 100).map { h =>
      val v = if (h % 20 == 7) 5000.0 else 10.0 + 0.5 * h
      ev(h, "lin", h * hourMs, v)
    }
    val r = SeriesOps.theilsenTrend(spark, writeEvents(rows)).head()
    assert(r.getAs[Long]("n_pairs") == 100L * 99 / 2)
    assert(r.getAs[Double]("slope_per_day") == 12.0)
    assert(r.getAs[Boolean]("trending_up"))
  }

  test("dtw: identical profiles are 0; a phase shift beats a shape change") {
    val hourMs = 3600000L
    // "morning"/"morning2": identical 6-hour block at hours 0-5 →
    // DTW exactly 0. "shifted": the same block at hours 2-7 — DTW
    // absorbs the 2h phase drift cheaply. "flat": uniform across all
    // 24 hours — a genuinely different shape, much farther away.
    def block(typ: String, idBase: Long, startH: Int) =
      (0 until 6).flatMap(h => (0 until 10).map(i =>
        ev(idBase + h * 10 + i, typ, (startH + h) * hourMs + i * 1000L, 1.0)))
    val flat = (0 until 24).flatMap(h => (0 until 10).map(i =>
      ev(9000L + h * 10 + i, "flat", h * hourMs + i * 1000L, 1.0)))
    val rows = block("morning", 0, 0) ++ block("morning2", 1000, 0) ++
      block("shifted", 2000, 2) ++ flat
    val d = SeriesOps.dtwProfiles(spark, writeEvents(rows))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("dtw_ppm"))
      .toMap
    assert(d(("morning", "morning2")) == 0L)
    assert(d(("morning", "shifted")) < d(("flat", "morning")))
    assert(d(("morning", "shifted")) < d(("flat", "shifted")))
  }

  test("type correlation: perfect linear pairs hit r = ±1 exactly") {
    val hourMs = 3600000L
    val rows = (0 until 48).flatMap { h =>
      Seq(ev(h, "p", h * hourMs, 10.0 + h),
          ev(1000L + h, "q", h * hourMs, 20.0 + 2 * h),
          ev(2000L + h, "r", h * hourMs, 1000.0 - h))
    }
    val m = SeriesOps.typeCorrMatrix(spark, writeEvents(rows))
      .collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getAs[Double]("pearson_r"))
      .toMap
    assert(m(("p", "q")) == 1.0)
    assert(m(("p", "r")) == -1.0)
    assert(m(("q", "r")) == -1.0)
  }

  test("benford: log-uniform values pass, uniform magnitudes get flagged") {
    val n = 2000
    val rows =
      // "organic": v = 10^(3i/n) — log-uniform over 1..1000, whose
      // first digits follow Benford almost exactly (χ² ≈ 0.03)
      (0 until n).map(i =>
        ev(i, "organic", i * 1000L, math.pow(10.0, i.toDouble / n * 3))) ++
        // "fabricated": uniform 10..99 magnitudes — flat first digits,
        // χ² in the hundreds
        (0 until n).map(i =>
          ev(10000L + i, "fabricated", i * 1000L, (10 + i % 90).toDouble))
    val byType = SeriesOps.benfordDeviation(spark, writeEvents(rows))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(!byType("organic").getAs[Boolean]("suspicious"),
           s"organic chi2 = ${byType("organic").getAs[Double]("chi2")}")
    assert(byType("fabricated").getAs[Boolean]("suspicious"))
    assert(byType("fabricated").getAs[Double]("chi2") >
      byType("organic").getAs[Double]("chi2") * 100)
  }

  test("skyline: matches brute-force dominance on the sf0.001 catalog") {
    val parts = Tables.part(spark, sf("sf0.001"))
      .select(col("p_partkey"),
              col("p_size").cast("long"),
              floor(col("p_retailprice") * 100 + lit(0.5)).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def dominated(x: (Long, Long, Long)) = parts.exists { o =>
      o._3 <= x._3 && o._2 >= x._2 && (o._3 < x._3 || o._2 > x._2)
    }
    val expected = parts.filterNot(dominated).map(_._1).toSet
    val got = OlapOps.skylinePareto(spark, sf("sf0.001"))
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }
}
