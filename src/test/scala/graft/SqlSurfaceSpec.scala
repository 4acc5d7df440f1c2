package graft

import org.apache.spark.sql.functions._

/** The pure-SQL face of the engine: the same queries a user would type
  * against registered views (`spark.sql`), asserted equal to the
  * DataFrame-API forms — API completeness, not just internal parity.
  */
class SqlSurfaceSpec extends SparkSpec {

  private def registerViews(): Unit = {
    Tables.events(spark, sf("sf0.001")).createOrReplaceTempView("events_v")
    Tables.documents(spark, sf("sf0.001")).createOrReplaceTempView("documents_v")
  }

  test("the /series query in plain SQL equals the DataFrame form") {
    registerViews()
    val viaSql = spark.sql(
      """SELECT event_type, date_trunc('minute', ts) AS bucket,
        |       floor(avg(value) * 1e6 + 0.5) / 1e6 AS avg_value
        |FROM events_v GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin).collect()
    val viaDf = graft.operators.SeriesOps
      .seriesAvg(spark, sf("sf0.001")).collect()
    assert(viaSql.length == viaDf.length)
    assert(viaSql.sameElements(viaDf))
  }

  test("sessionization in plain SQL (session_window) equals the operator") {
    registerViews()
    val viaSql = spark.sql(
      """SELECT user_id, session_window.start AS session_start,
        |       session_window.end AS session_end,
        |       count(*) AS n_events,
        |       floor(sum(value) * 1e4 + 0.5) / 1e4 AS sum_value
        |FROM events_v
        |GROUP BY user_id, session_window(ts, '30 minutes')
        |ORDER BY user_id, session_start""".stripMargin).collect()
    val viaDf = graft.operators.TemporalOps
      .sessionize(spark, sf("sf0.001")).collect()
    assert(viaSql.length == viaDf.length)
    assert(viaSql.sameElements(viaDf))
  }

  test("custom functions compose with builtin SQL in one statement") {
    graft.plans.GraftExtensions.registerOn(spark)
    registerViews()
    // dedup fingerprint + quality gate in a single SQL statement using
    // three custom functions alongside builtins
    val rows = spark.sql(
      """SELECT doc_id,
        |       poly_hash(text) AS h,
        |       size(word_shingles(text, 3)) AS n_shingles,
        |       simhash64(text) AS sh
        |FROM documents_v
        |WHERE size(token_counts(text)) >= 10
        |ORDER BY doc_id LIMIT 50""".stripMargin).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(3).matches("[0-9a-f]{16}")))
  }

  test("vector functions reach SQL: brute-force cosine top-k in one query") {
    graft.plans.GraftExtensions.registerOn(spark)
    Tables.embeddings(spark, sf("sf0.001"))
      .createOrReplaceTempView("embeddings_v")
    val rows = spark.sql(
      """WITH q AS (SELECT embedding AS qv FROM embeddings_v WHERE vec_id = 1)
        |SELECT e.vec_id,
        |       vec_dot(e.embedding, q.qv)
        |         / (vec_norm(e.embedding) * vec_norm(q.qv)) AS cosine,
        |       vec_dist2(e.embedding, q.qv) AS dist2
        |FROM embeddings_v e CROSS JOIN q
        |WHERE e.vec_id <> 1
        |ORDER BY cosine DESC LIMIT 5""".stripMargin).collect()
    assert(rows.length == 5)
    // cosine in [-1, 1]; dist2 nonnegative; ranking is descending
    val cs = rows.map(_.getDouble(1))
    assert(cs.forall(c => c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9))
    assert(cs.sameElements(cs.sorted.reverse))
    assert(rows.map(_.getDouble(2)).forall(_ >= 0.0))
  }
}
