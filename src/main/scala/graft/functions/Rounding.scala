package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** Cross-engine deterministic rounding.
  *
  * Spark's `round()` (and Java's `%.2f`) round the *shortest decimal
  * representation* of a double (BigDecimal.valueOf semantics), while
  * DuckDB rounds the *binary* value — so values whose decimal expansion
  * lands exactly on a half at the cut digit (common here: inputs are
  * 2-decimal prices/metrics, and means over n≤100 samples produce short
  * decimal expansions) disagree between the engines.
  *
  * `floor(x * 10^p + 0.5) / 10^p` is pure double arithmetic: identical
  * operand bits → identical result bits on both engines, always. All
  * oracle-facing query output uses this form; [[fixSql]] rewrites
  * `round(expr, p)` in oracle SQL to the same formula so authors can keep
  * writing readable `round(...)`.
  */
object Rounding {

  /** Deterministic replacement for `functions.round` — import this to
    * shadow the Spark builtin in operator code.
    */
  def round(c: Column, p: Int): Column = {
    val s = math.pow(10, p)
    floor(c * lit(s) + lit(0.5)) / lit(s)
  }

  /** Scalar twin of [[round]] for JVM-side state code (the streaming
    * processors) — one definition of the formula, not hand-typed copies
    * that must stay in sync.
    */
  def scalar(x: Double, p: Int): Double = {
    val s = math.pow(10, p)
    math.floor(x * s + 0.5) / s
  }

  /** Round-half-up fixed-point encoding at an arbitrary scale:
    * `⌊x·scale + 0.5⌋` as a long — ONE definition for every
    * fixed-point unit here (micro for metrics, centi for money), so
    * the hand-typed copies that must stay bit-aligned with the DuckDB
    * oracles' inline formula live in exactly one place.
    */
  def fixedUnits(c: Column, scale: Long): Column =
    floor(c * lit(scale) + lit(0.5)).cast("long")

  /** Exact integer micro-units: `⌊x·10⁶ + 0.5⌋` as a long — the
    * round-half-up fixed-point encoding every money/metric sum uses so
    * aggregation is associative bit-for-bit. One definition shared by
    * the batch operators, the streaming snapshot processor, and the
    * parity specs; the DuckDB oracles write the same formula inline.
    */
  def microUnits(c: Column): Column = fixedUnits(c, 1000000L)

  /** Scalar twin of [[microUnits]] for streaming state code. */
  def microUnitsScalar(x: Double): Long =
    math.floor(x * 1000000.0 + 0.5).toLong

  /** Rewrite every `round(expr, p)` in a SQL string into the
    * floor-formula (balanced-parenthesis aware, innermost-first).
    */
  def fixSql(sql: String): String = {
    val marker = "round("
    val idx = sql.toLowerCase.indexOf(marker)
    if (idx < 0) return sql
    var depth = 1
    var i = idx + marker.length
    var lastTopComma = -1
    while (depth > 0 && i < sql.length) {
      sql.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 1 => lastTopComma = i
        case _ =>
      }
      i += 1
    }
    require(depth == 0 && lastTopComma > 0, s"unparseable round() in: $sql")
    val exprPart = fixSql(sql.substring(idx + marker.length, lastTopComma).trim)
    val p = sql.substring(lastTopComma + 1, i - 1).trim.toInt
    val repl = s"floor(($exprPart) * 1e$p + 0.5) / 1e$p"
    fixSql(sql.substring(0, idx) + repl + sql.substring(i))
  }
}
