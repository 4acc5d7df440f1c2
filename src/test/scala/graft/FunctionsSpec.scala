package graft

import graft.functions.{ExactPercentile, Rounding, WindowParam}
import org.apache.spark.sql.functions.{col, sum}
import scala.util.Random

/** Unit specs for the custom function surface: the exact nearest-rank
  * percentile Aggregator (SURVEY §2.4 A2 / §2.10) and the deterministic
  * cross-engine rounding helpers.
  */
class FunctionsSpec extends SparkSpec {

  test("ExactPercentile matches the reference nearest-rank-floor definition") {
    val session = spark
    import session.implicits._
    val rnd = new Random(7)
    for (n <- Seq(1, 2, 10, 99, 100)) {
      val xs = List.fill(n)(rnd.nextDouble() * 500)
      val ds = xs.toDF("v")
      val got95 = ds.agg(ExactPercentile.p95(col("v"))).as[Double].head()
      val got99 = ds.agg(ExactPercentile.p99(col("v"))).as[Double].head()
      val sorted = xs.sorted
      assert(got95 == sorted((n * 0.95).toInt), s"p95 n=$n")
      assert(got99 == sorted((n * 0.99).toInt), s"p99 n=$n")
    }
  }

  test("ExactPercentile merges partial buffers across partitions") {
    val session = spark
    import session.implicits._
    val xs = (1 to 1000).map(_.toDouble)
    val got = spark.sparkContext
      .parallelize(xs, 8)
      .toDF("v")
      .agg(ExactPercentile.p95(col("v")))
      .as[Double]
      .head()
    assert(got == xs.sorted.apply((1000 * 0.95).toInt))
  }

  test("BpeEncodeStatsExpr applies merges by rank and round-trips") {
    val session = spark
    import session.implicits._
    def stats(text: String, merges: Seq[String]) =
      Seq(text).toDF("text")
        .select(graft.functions.TextExprs.bpeEncodeStats(col("text"), merges)
          .as("s"))
        .select("s.n_words", "s.n_chars", "s.n_pieces", "s.round_trip",
                "s.bounds_ok")
        .head()
    // "low" with lo<ow: "lo"+"w" (rank decides, not position)
    val a = stats("low", Seq("lo", "ow"))
    assert(a.getLong(2) == 2 && a.getBoolean(3) && a.getBoolean(4))
    // same word, ow ranked first: "l"+"ow"
    val b = stats("low", Seq("ow", "lo"))
    assert(b.getLong(2) == 2 && b.getBoolean(3))
    // "lower" with only "lo": lo|w|e|r = 4 pieces, 5 chars, 1 word
    val c = stats("lower", Seq("lo"))
    assert(c.getLong(0) == 1 && c.getLong(1) == 5 && c.getLong(2) == 4)
    // no applicable merges: one piece per char
    val d = stats("abc def", Seq("zz"))
    assert(d.getLong(0) == 2 && d.getLong(1) == 6 && d.getLong(2) == 6)
    // more merges never increase the piece count (monotonicity)
    val text = "banana bandana cabana"
    val p1 = stats(text, Seq("an")).getLong(2)
    val p2 = stats(text, Seq("an", "ba", "na")).getLong(2)
    assert(p2 <= p1)
    assert(stats(text, Seq("an", "ba", "na")).getBoolean(3)) // round trip
    // trailing non-space whitespace: split limit -1 keeps the empty
    // token, matching the DuckDB oracle's string_split count
    val e = stats("hello world\n", Seq("lo"))
    assert(e.getLong(0) == 3 && e.getLong(1) == 10)
    // astral-plane text: counts are codepoints and pieces are never
    // lone surrogates (round trip must survive)
    val g = stats("a𝄞b", Seq("zz"))
    assert(g.getLong(1) == 3 && g.getLong(2) == 3 && g.getBoolean(3))
  }

  test("Rounding.fixSql rewrites nested round() calls") {
    val in = "SELECT round(avg(x), 6) AS a, round(round(y, 4) / z, 2) AS b FROM t"
    val out = Rounding.fixSql(in)
    assert(!out.toLowerCase.contains("round("))
    assert(out.contains("floor((avg(x)) * 1e6 + 0.5) / 1e6"))
    assert(out.contains("floor((floor((y) * 1e4 + 0.5) / 1e4 / z) * 1e2 + 0.5) / 1e2"))
  }

  test("Rounding.round matches scalar floor formula in Spark") {
    val session = spark
    import session.implicits._
    val xs = Seq(29.63125, -3.14155, 6.395, 0.0, 123.456789)
    val got = xs.toDF("x")
      .select(Rounding.round(col("x"), 4))
      .as[Double]
      .collect()
      .toSeq
    val want = xs.map(x => math.floor(x * 1e4 + 0.5) / 1e4)
    assert(got == want)
  }

  test("WindowParam maps the API's five window strings and rejects others") {
    assert(WindowParam.seconds("1m") == 60L)
    assert(WindowParam.seconds("5m") == 300L)
    assert(WindowParam.seconds("15m") == 900L)
    assert(WindowParam.seconds("1h") == 3600L)
    assert(WindowParam.seconds("1d") == 86400L)
    assert(WindowParam.duration("5m") == "300 seconds")
    Seq("2m", "60", "", "1M", "7d").foreach { bad =>
      intercept[IllegalArgumentException](WindowParam.seconds(bad))
    }
  }

  test("kpiTumbling window param changes bucket length, conserves events") {
    val one = operators.KpiOps.kpiTumbling(spark, sf("sf0.001"), "1m")
    val five = operators.KpiOps.kpiTumbling(spark, sf("sf0.001"), "5m")
    def total(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(col("n_events"))).head.getLong(0)
    assert(total(one) == total(five))
    assert(one.count() >= five.count())
  }
}
