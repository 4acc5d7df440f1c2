package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PII detection + redaction — the privacy pass every training-data
  * pipeline runs before text leaves the ingest tier (the reference has
  * no analog; this is part of the additive LLM-pipeline surface, like
  * the quality/dedup cascades).
  *
  * The synthetic `documents` corpus is PII-free token soup, so the pass
  * is demonstrated on deterministically RENDERED log lines (order ×
  * customer) that contain real pattern instances — emails, phone-shaped
  * strings, entity names, raw numeric ids — the way an ingest tier sees
  * rendered support tickets or server logs. The rendering uses integer
  * and string columns only (never a formatted double: float-to-string
  * is not portable across engines).
  *
  * Scale shape: ONE broadcast join (customer is the dim side) then a
  * pure codegen'd map — `regexp_replace`/`regexp_count` chains stay
  * inside whole-stage codegen, nothing shuffles after the join, and the
  * projection pushes down to both scans. At 100 TB this is a map over
  * the fact table; the masking order (email → phone → name → residual
  * ids) is fixed so every count is computed on the exact intermediate
  * that class sees, which is what a scrub audit must report.
  *
  * Regex dialect: patterns restricted to the Java-regex ∩ RE2 common
  * subset (ASCII classes, bounded quantifiers, `\b` — no lookaround, no
  * backreferences) so Spark and the DuckDB oracle agree byte-for-byte.
  */
object PrivacyOps {

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\b555-\\d{4}\\b"
  private val NameRe  = "Customer#\\d+"
  private val IdRe    = "\\b\\d{4,}\\b"

  /** Per-line scrub: masked text plus a per-class detection count, one
    * row per order. Counts are longs on both sides (DuckDB `len()` is
    * BIGINT).
    */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val dim = Tables
      .customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    Tables
      .orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(broadcast(dim), col("o_custkey") === col("c_custkey"))
      .select(
        col("o_orderkey"),
        concat(
          lit("order "), col("o_orderkey"), lit(" by "), col("c_name"),
          lit(" <user"), col("c_custkey"), lit("@example.com> phone 555-"),
          lpad((col("c_custkey") % 10000).cast("string"), 4, "0"),
          lit(" segment "), col("c_mktsegment")).as("line"))
      .withColumn("n_emails", regexp_count(col("line"), lit(EmailRe)).cast("long"))
      .withColumn("t1", regexp_replace(col("line"), EmailRe, "[EMAIL]"))
      .withColumn("n_phones", regexp_count(col("t1"), lit(PhoneRe)).cast("long"))
      .withColumn("t2", regexp_replace(col("t1"), PhoneRe, "[PHONE]"))
      .withColumn("n_names", regexp_count(col("t2"), lit(NameRe)).cast("long"))
      .withColumn("t3", regexp_replace(col("t2"), NameRe, "[NAME]"))
      .withColumn("n_ids", regexp_count(col("t3"), lit(IdRe)).cast("long"))
      .withColumn("scrubbed", regexp_replace(col("t3"), IdRe, "[ID]"))
      .select(col("o_orderkey"), col("scrubbed"), col("n_emails"),
              col("n_phones"), col("n_names"), col("n_ids"))
      .orderBy(col("o_orderkey"))
  }

  /** DuckDB oracles. Plain (non-interpolated) triple-quoted strings so
    * `\d`/`\b` stay literal; DuckDB `regexp_replace` needs the explicit
    * 'g' flag to match Spark's replace-all default.
    */
  val oracles: Map[String, String] = Map(
    "pii_scrub" ->
      """WITH lines AS (
        |  SELECT o_orderkey,
        |         'order ' || o_orderkey || ' by ' || c_name || ' <user' ||
        |         c_custkey || '@example.com> phone 555-' ||
        |         lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') ||
        |         ' segment ' || c_mktsegment AS line
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |), m1 AS (
        |  SELECT o_orderkey,
        |         len(regexp_extract_all(line, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |         regexp_replace(line, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g') AS t1
        |  FROM lines
        |), m2 AS (
        |  SELECT o_orderkey, n_emails,
        |         len(regexp_extract_all(t1, '\b555-\d{4}\b')) AS n_phones,
        |         regexp_replace(t1, '\b555-\d{4}\b', '[PHONE]', 'g') AS t2
        |  FROM m1
        |), m3 AS (
        |  SELECT o_orderkey, n_emails, n_phones,
        |         len(regexp_extract_all(t2, 'Customer#\d+')) AS n_names,
        |         regexp_replace(t2, 'Customer#\d+', '[NAME]', 'g') AS t3
        |  FROM m2
        |)
        |SELECT o_orderkey,
        |       regexp_replace(t3, '\b\d{4,}\b', '[ID]', 'g') AS scrubbed,
        |       n_emails, n_phones, n_names,
        |       len(regexp_extract_all(t3, '\b\d{4,}\b')) AS n_ids
        |FROM m3 ORDER BY o_orderkey""".stripMargin)
}
