package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Rounding.round

/** Data-layout operators: the write-side half of scan pruning.
  *
  * Every read-path operator in this library leans on parquet min/max
  * row-group stats (see [[graft.Tables.eventsTimeRange]]); whether those
  * stats PRUNE anything is decided when the data is written. A 100 TB
  * events table laid out in arrival order answers time slices cheaply but
  * scans every file for a user slice; Z-ordering interleaves the bits of
  * both dimensions so every file covers a small rectangle of
  * (user, time-of-day) space and BOTH predicates prune (the technique
  * behind Delta/Iceberg `OPTIMIZE ZORDER BY`, Morton 1966).
  *
  * [[zorderLayout]] is the measurement version: it assigns each event to
  * a file under both layouts and emits the per-file min/max envelope a
  * reader would prune on, plus each envelope's span as a fraction of the
  * global range — the direct answer to "what fraction of files does a
  * point query scan". Everything is exact integer/bit arithmetic: one
  * min/max aggregate (broadcast), a pure-map key computation, and a
  * 2×[[LayoutOps.Files]]-group rollup. No sort, no window, no sampled
  * range boundaries — unlike `repartitionByRange`-based Z-order writes,
  * the file of a row depends only on the row and the global min/max, so
  * the oracle can replay it.
  */
object LayoutOps {

  /** Files per layout = 2^6: file id is the top 6 bits of the 16-bit
    * Morton code (3 bits of each dimension → an 8×8 grid of rectangles).
    */
  private val Files = 64

  /** Interleave-spread of an 8-bit value into even bit positions
    * (0b_abcd → 0a0b0c0d), the classic mask-and-shift ladder; exact on
    * both engines because it is pure integer arithmetic.
    */
  private def spread8(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(255L))
    val x1 = x0.bitwiseOR(shiftleft(x0, 4)).bitwiseAND(lit(0x0F0FL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 2)).bitwiseAND(lit(0x3333L))
    x2.bitwiseOR(shiftleft(x2, 1)).bitwiseAND(lit(0x5555L))
  }

  /** Rank-normalize `v` in [lo, hi] to an 8-bit cell. Double division is
    * safe here: operands are exact integers ≪ 2^53 and the quotient is
    * never within an ulp of an integer boundary (spans ≤ 10^7, so the
    * true remainder gap ≥ 10^-7 dwarfs the ~10^-13 rounding error), and
    * both engines evaluate the identical expression bit-for-bit.
    */
  private def rank8(v: Column, lo: Column, span: Column): Column =
    floor((v - lo).cast("double") * lit(256.0) / span.cast("double"))
      .cast("long")

  def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables
      .events(spark, dir)
      .select(col("event_id"), col("user_id"),
              (hour(col("ts")) * 60 + minute(col("ts"))).cast("long").as("m"))
    val stats = broadcast(
      e.agg(min(col("user_id")).as("min_u"), max(col("user_id")).as("max_u"),
            min(col("event_id")).as("min_id"),
            max(col("event_id")).as("max_id")))
    val keyed = e
      .crossJoin(stats)
      .withColumn("u8",
                  rank8(col("user_id"), col("min_u"),
                        col("max_u") - col("min_u") + 1))
      .withColumn("m8", rank8(col("m"), lit(0L), lit(1440L)))
      .withColumn("morton",
                  spread8(col("u8"))
                    .bitwiseOR(shiftleft(spread8(col("m8")), 1)))
      .withColumn("zorder",
                  shiftright(col("morton"), 16 - 6)) // top 3 bits each dim
      .withColumn("linear",
                  floor((col("event_id") - col("min_id")).cast("double") *
                    lit(Files.toDouble) /
                    (col("max_id") - col("min_id") + 1).cast("double"))
                    .cast("long"))
      .withColumn("u_span",
                  (col("max_u") - col("min_u") + 1).cast("double"))
    def files(fileCol: String): DataFrame =
      keyed
        .groupBy(col(fileCol).as("file_id"))
        .agg(
          count(lit(1)).as("n_rows"),
          min(col("user_id")).as("min_user"),
          max(col("user_id")).as("max_user"),
          min(col("m")).as("min_minute"), max(col("m")).as("max_minute"),
          first(col("u_span")).as("u_span"))
        .select(
          lit(fileCol).as("layout"), col("file_id"), col("n_rows"),
          col("min_user"), col("max_user"), col("min_minute"),
          col("max_minute"),
          round((col("max_user") - col("min_user") + 1).cast("double") /
                  col("u_span"), 6).as("user_span_frac"),
          round((col("max_minute") - col("min_minute") + 1).cast("double") /
                  lit(1440.0), 6).as("minute_span_frac"))
    files("zorder")
      .unionAll(files("linear"))
      .orderBy(col("layout"), col("file_id"))
  }

  /** Small-file compaction planner (the `OPTIMIZE`/bin-packing pass of a
    * lakehouse table): group each date partition's files into contiguous
    * arrival-order bins of ≈`target` bytes, so the rewrite job that
    * follows turns many small files into few target-sized ones without
    * destroying the time-locality the reads prune on.
    *
    * The "files" are the per-(date, hour) manifest a streaming ingest
    * actually produces (one commit per trigger interval); byte size is
    * an exact integer proxy (16 B fixed + `length(props)` per row) so
    * the oracle can replay the packing bit-for-bit. Bin assignment is
    * next-fit on the running total: a file joins bin
    * `⌊cum_before / target⌋` — deterministic, one pass, oversized files
    * never split (they own the quantum they start in, and their
    * overshoot may strand one small successor bin — the price of
    * single-pass determinism vs true bin packing). Bins are contiguous
    * hour runs with conserved rows/bytes; [[graft.OperatorSpec]] pins
    * those invariants and the next-fit bin-count bound.
    *
    * Scale shape: one shuffle builds the manifest (partial-aggregated
    * groupBy over the raw table); everything after — the running-sum
    * window, the bin rollup — runs on the MANIFEST (one row per file:
    * metadata scale, ~10⁶ rows for a 100 TB table), partitioned by date
    * so no window partition outgrows a day's file count. The planner
    * never moves data; the rewrite is a separate write keyed by
    * (event_date, bin_id). Target defaults to 4 KiB at test scale
    * (stands in for the production 128 MiB) and is session-tunable via
    * `graft.compact.target`.
    */
  def compactionPlan(spark: SparkSession, dir: String): DataFrame = {
    val target = spark.conf.get("graft.compact.target", "4096").toLong
    require(target > 0, s"graft.compact.target=$target must be positive")
    val manifest = Tables
      .events(spark, dir)
      .select(date_trunc("day", col("ts")).as("event_date"),
              hour(col("ts")).cast("long").as("file_hour"),
              (lit(16L) + length(col("props")).cast("long")).as("row_bytes"))
      .groupBy(col("event_date"), col("file_hour"))
      .agg(count(lit(1)).as("n_rows"), sum(col("row_bytes")).as("file_bytes"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_date"))
      .orderBy(col("file_hour"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
                   org.apache.spark.sql.expressions.Window.currentRow)
    manifest
      .withColumn("cum", sum(col("file_bytes")).over(w))
      .withColumn("bin_id", expr(s"(cum - file_bytes) div ${target}L"))
      .groupBy(col("event_date"), col("bin_id"))
      .agg(count(lit(1)).as("n_files"), sum(col("n_rows")).as("n_rows"),
           sum(col("file_bytes")).as("bin_bytes"),
           min(col("file_hour")).as("first_hour"),
           max(col("file_hour")).as("last_hour"))
      .orderBy(col("event_date"), col("bin_id"))
  }

  // ---- DuckDB oracles ----------------------------------------------------

  /** SQL twin of [[spread8]] as stepwise CTE columns (`p1`/`p2`/`p3`). */
  private def spreadSql(x: String): String = {
    val s1 = s"((($x) | (($x) << 4)) & 3855)"
    val s2 = s"(($s1 | ($s1 << 2)) & 13107)"
    s"(($s2 | ($s2 << 1)) & 21845)"
  }

  private def fileAggSql(fileCol: String): String =
    s"""SELECT '$fileCol' AS layout, $fileCol AS file_id,
       |       CAST(count(*) AS BIGINT) AS n_rows,
       |       min(user_id) AS min_user, max(user_id) AS max_user,
       |       min(m) AS min_minute, max(m) AS max_minute,
       |       round(CAST(max(user_id) - min(user_id) + 1 AS DOUBLE)
       |               / any_value(u_span), 6) AS user_span_frac,
       |       round(CAST(max(m) - min(m) + 1 AS DOUBLE) / 1440.0, 6)
       |         AS minute_span_frac
       |FROM keyed GROUP BY $fileCol""".stripMargin

  val oracles: Map[String, String] = Map(
    "compaction_plan" ->
      s"""WITH m AS (
         |  SELECT date_trunc('day', ts) AS event_date,
         |         CAST(hour(ts) AS BIGINT) AS file_hour,
         |         CAST(count(*) AS BIGINT) AS n_rows,
         |         CAST(sum(16 + length(props)) AS BIGINT) AS file_bytes
         |  FROM (${Tables.eventsSql}) ev GROUP BY 1, 2
         |),
         |c AS (
         |  SELECT *,
         |         CAST(sum(file_bytes) OVER (
         |           PARTITION BY event_date ORDER BY file_hour
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |           AS BIGINT) AS cum
         |  FROM m
         |)
         |SELECT event_date,
         |       CAST((cum - file_bytes) // 4096 AS BIGINT) AS bin_id,
         |       count(*) AS n_files,
         |       CAST(sum(n_rows) AS BIGINT) AS n_rows,
         |       CAST(sum(file_bytes) AS BIGINT) AS bin_bytes,
         |       min(file_hour) AS first_hour, max(file_hour) AS last_hour
         |FROM c GROUP BY 1, 2
         |ORDER BY event_date, bin_id""".stripMargin,
    "zorder_layout" ->
      s"""WITH e AS (
         |  SELECT event_id, user_id,
         |         CAST(hour(ts) * 60 + minute(ts) AS BIGINT) AS m
         |  FROM (${Tables.eventsSql}) ev
         |),
         |s AS (
         |  SELECT min(user_id) AS min_u, max(user_id) AS max_u,
         |         min(event_id) AS min_id, max(event_id) AS max_id
         |  FROM e
         |),
         |n AS (
         |  SELECT event_id, user_id, m,
         |         CAST(floor(CAST(user_id - min_u AS DOUBLE) * 256.0
         |                    / CAST(max_u - min_u + 1 AS DOUBLE)) AS BIGINT) AS u8,
         |         CAST(floor(CAST(m AS DOUBLE) * 256.0 / 1440.0) AS BIGINT) AS m8,
         |         CAST(floor(CAST(event_id - min_id AS DOUBLE) * ${Files}.0
         |                    / CAST(max_id - min_id + 1 AS DOUBLE)) AS BIGINT)
         |           AS linear,
         |         CAST(max_u - min_u + 1 AS DOUBLE) AS u_span
         |  FROM e CROSS JOIN s
         |),
         |keyed AS (
         |  SELECT *,
         |         ((${spreadSql("u8")}) | ((${spreadSql("m8")}) << 1)) >> 10
         |           AS zorder
         |  FROM n
         |)
         |${fileAggSql("zorder")}
         |UNION ALL
         |${fileAggSql("linear")}
         |ORDER BY layout, file_id""".stripMargin
  )
}
