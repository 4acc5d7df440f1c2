package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the embedding-similarity hot loops
  * (dot product, L2 norm, squared L2 distance).
  *
  * The same semantics are expressible with `zip_with` + `aggregate`
  * higher-order functions — the first version of VectorOps did exactly
  * that — but HOFs are interpreted: every row allocates lambda frames and
  * boxes each of the 64 elements, and the ANN queries evaluate these
  * folds once per (candidate × query) pair. A primitive while-loop over
  * the unsafe array data is an order of magnitude cheaper and keeps the
  * accumulation LEFT-TO-RIGHT sequential — the exact fold order DuckDB's
  * `list_reduce` uses, so scores stay bit-identical for the oracle.
  *
  * Accepts `array<float>` or `array<double>` on either side; floats are
  * widened per element (exact) so the engine can pass raw embedding
  * columns without materializing doubled copies.
  */
private[graft] trait VecArrayInput { self: Expression =>

  protected def checkVec(dt: DataType, name: String): TypeCheckResult =
    dt match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$name expects array<float|double>, got $other")
    }

  protected def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  protected def isFloatArr(dt: DataType): Boolean =
    dt.asInstanceOf[ArrayType].elementType == FloatType
}

/** Sequential left-fold dot product Σ aᵢ·bᵢ over the common prefix. */
case class VecDotExpr(left: Expression, right: Expression)
    extends BinaryExpression
    with BinaryRefCodegen
    with VecArrayInput {

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = checkVec(left.dataType, "vec_dot")
    if (l.isFailure) l else checkVec(right.dataType, "vec_dot")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val fa = isFloatArr(left.dataType)
    val fb = isFloatArr(right.dataType)
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += elem(a, i, fa) * elem(b, i, fb); i += 1 }
    acc
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): VecDotExpr =
    copy(left = newLeft, right = newRight)
}

/** L2 norm √(Σ xᵢ²), sequential left fold. */
case class VecNormExpr(child: Expression)
    extends UnaryExpression
    with UnaryRefCodegen
    with VecArrayInput {

  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(child.dataType, "vec_norm")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val f = isFloatArr(child.dataType)
    var acc = 0.0
    var i = 0
    while (i < a.numElements()) { val x = elem(a, i, f); acc += x * x; i += 1 }
    math.sqrt(acc)
  }

  override protected def withNewChildInternal(newChild: Expression): VecNormExpr =
    copy(child = newChild)
}

/** Squared L2 distance Σ (aᵢ−bᵢ)², sequential left fold. */
case class VecDist2Expr(left: Expression, right: Expression)
    extends BinaryExpression
    with BinaryRefCodegen
    with VecArrayInput {

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = checkVec(left.dataType, "vec_dist2")
    if (l.isFailure) l else checkVec(right.dataType, "vec_dist2")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dist2"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val fa = isFloatArr(left.dataType)
    val fb = isFloatArr(right.dataType)
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = elem(a, i, fa) - elem(b, i, fb)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): VecDist2Expr =
    copy(left = newLeft, right = newRight)
}

/** Symmetric int8 quantization statistics in one pass: with
  * amax = max |xᵢ| and scale = round(127/amax, 6) (deterministic floor
  * formula), each element quantizes to
  * clamp(floor(xᵢ·scale + 0.5), −127, 127); emits
  * (scale, q_sum, q_min, q_max, n_dims) — the per-vector summary a
  * training pipeline stores next to the quantized payload. Struct
  * output; consume behind a generate-barrier (`explode(array(...))`)
  * so the pass runs once per row.
  */
case class VecQuantStatsExpr(child: Expression)
    extends UnaryExpression
    with UnaryRefCodegen
    with VecArrayInput {

  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(child.dataType, "vec_quant_stats")

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q_sum", LongType, nullable = false),
    StructField("q_min", IntegerType, nullable = false),
    StructField("q_max", IntegerType, nullable = false),
    StructField("n_dims", IntegerType, nullable = false)
  ))

  override def prettyName: String = "vec_quant_stats"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val f = isFloatArr(child.dataType)
    val n = a.numElements()
    var amax = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(elem(a, i, f)); if (x > amax) amax = x; i += 1
    }
    val scale =
      if (amax > 0) math.floor(127.0 / amax * 1e6 + 0.5) / 1e6 else 0.0
    var qSum = 0L
    var qMin = Int.MaxValue
    var qMax = Int.MinValue
    i = 0
    while (i < n) {
      val q0 = math.floor(elem(a, i, f) * scale + 0.5).toLong
      val q = math.max(-127L, math.min(127L, q0)).toInt
      qSum += q
      if (q < qMin) qMin = q
      if (q > qMax) qMax = q
      i += 1
    }
    if (n == 0) { qMin = 0; qMax = 0 }
    org.apache.spark.sql.catalyst.InternalRow(scale, qSum, qMin, qMax, n)
  }

  override protected def withNewChildInternal(newChild: Expression): VecQuantStatsExpr =
    copy(child = newChild)
}

object VectorExprs {

  def vecQuantStats(c: Column): Column =
    GraftSqlBridge.toCol(VecQuantStatsExpr(GraftSqlBridge.toExpr(c)))

  def vecDot(a: Column, b: Column): Column =
    GraftSqlBridge.toCol(
      VecDotExpr(GraftSqlBridge.toExpr(a), GraftSqlBridge.toExpr(b)))

  def vecNorm(c: Column): Column =
    GraftSqlBridge.toCol(VecNormExpr(GraftSqlBridge.toExpr(c)))

  def vecDist2(a: Column, b: Column): Column =
    GraftSqlBridge.toCol(
      VecDist2Expr(GraftSqlBridge.toExpr(a), GraftSqlBridge.toExpr(b)))
}
