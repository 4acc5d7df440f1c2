package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Whole-stage-codegen support for the custom expressions via a
  * reference-object call: doGenCode emits
  * `((UnaryRefCodegen) references[i]).refEval(childValue)` — ONE
  * virtual call into the same tight JVM loop `nullSafeEval` runs —
  * instead of `CodegenFallback`'s interpreted path, which rebuilds an
  * InternalRow per input row and walks the Expression tree
  * reflectively. The expression therefore stays INSIDE the fused
  * WholeStageCodegen stage (PlanSpec pins the span), null handling
  * rides the standard `nullSafeCodeGen` scaffolding, and scalar results
  * (long hashes, double distances) unbox straight into the primitive
  * slot. This is the same shape Spark's own regexp/json expressions
  * use: generate the orchestration, delegate the loop-heavy kernel to a
  * compiled JVM method.
  *
  * Contract: `nullSafeEval` must never return null — every expression
  * here is total on non-null input (specs exercise empty strings /
  * empty arrays), so the standard null-propagation scaffolding fully
  * covers the null surface.
  */
private[functions] object RefCodegen {
  def assign(value: String, dt: DataType, ref: String, args: String): String = {
    val jt = CodeGenerator.javaType(dt)
    val boxed = CodeGenerator.boxedType(dt)
    if (jt == boxed) s"$value = ($boxed) $ref.refEval($args);"
    else s"$value = (($boxed) $ref.refEval($args)).${jt}Value();"
  }
}

/** Mix-in for unary custom expressions: codegen as a single call to
  * [[refEval]] (public bridge to the protected `nullSafeEval`).
  */
trait UnaryRefCodegen extends UnaryExpression {
  def refEval(input: Any): Any = nullSafeEval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref =
      ctx.addReferenceObj("graftExpr", this, classOf[UnaryRefCodegen].getName)
    nullSafeCodeGen(ctx, ev, c => RefCodegen.assign(ev.value, dataType, ref, c))
  }
}

/** Binary twin of [[UnaryRefCodegen]]. */
trait BinaryRefCodegen extends BinaryExpression {
  def refEval(l: Any, r: Any): Any = nullSafeEval(l, r)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref =
      ctx.addReferenceObj("graftExpr", this, classOf[BinaryRefCodegen].getName)
    nullSafeCodeGen(ctx, ev,
                    (l, r) => RefCodegen.assign(ev.value, dataType, ref,
                                                s"$l, $r"))
  }
}
