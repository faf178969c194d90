package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, LongType}

/** Optimizer rule: rewrite the portable HOF exact-grid dot product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) ->
  *       CAST(floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1e9) AS BIGINT)),
  *     0L, (acc, e) -> acc + e) }}}
  *
  * into the native codegen'd [[FloorDotE9]]. Higher-order functions run
  * interpreted (per-element lambda dispatch on boxed rows, outside
  * whole-stage codegen); the native expression is the same longs in a tight
  * primitive loop — bit-identical by construction (GridExpressionsSpec pins
  * long-for-long equality INCLUDING the null chain: null array, null
  * element, and unequal lengths — zip_with null-pads the shorter side —
  * all yield NULL in both forms), so substituting it can never change a
  * certified value. Users writing the engine-portable SQL form get the
  * codegen kernel for free.
  *
  * The match is deliberately exact: the zero must be literal 0L, the merge
  * a bare lambda-var addition, the finish the identity, the inner lambda
  * the floor(x·y·1e9) chain over double-valued lambda vars (float vars
  * through an explicit cast), the grid constant exactly 1.0e9, and both
  * array children float/double-typed. Anything else — a different grid, a
  * seeded zero, extra arithmetic — is left alone. (The optimizer may have
  * already removed the outer no-op CAST once floor's bigint output is
  * resolved, so the floor chain matches with or without it.)
  *
  * ANSI guard: under ANSI evaluation the HOF's `acc + e` THROWS on Long
  * overflow while a wrapping kernel would be observably different, so the
  * merge Add's evalMode carries through to [[FloorDotE9]]'s `failOnError`
  * (ANSI → checked add, LEGACY → wrapping). TRY mode (null-on-overflow) has
  * no kernel equivalent and is left untouched. The floor→bigint cast and
  * the float→double lambda-var casts are mode-independent (no-op long cast;
  * exact widening), so those match any evalMode. */
object RewriteFloorDotE9 extends Rule[LogicalPlan] {

  private def isFloatOrDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** The lambda-var itself (already double) or an explicit cast to double. */
  private def isDoubleOf(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable =>
      nv.exprId == v.exprId && nv.dataType == DoubleType
    case Cast(nv: NamedLambdaVariable, DoubleType, _, _) => nv.exprId == v.exprId
    case _ => false
  }

  /** CAST(floor(x' * y' * 1.0e9) AS BIGINT) — cast optional (SimplifyCasts
    * may have removed the no-op long-to-long cast before this rule runs). */
  private def isFloorE9(e: Expression, x: NamedLambdaVariable,
                        y: NamedLambdaVariable): Boolean = {
    val floor = e match {
      case Cast(f: Floor, LongType, _, _) => Some(f)
      case f: Floor if f.dataType == LongType => Some(f)
      case _ => None
    }
    floor.exists(_.child match {
      case Multiply(Multiply(xe, ye, _), Literal(c: Double, DoubleType), _)
          if c == 1.0e9 =>
        (isDoubleOf(xe, x) && isDoubleOf(ye, y)) ||
          (isDoubleOf(xe, y) && isDoubleOf(ye, x))
      case _ => false
    })
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(left, right,
              LambdaFunction(body,
                Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(0L, LongType),
            LambdaFunction(
              Add(a1: NamedLambdaVariable, a2: NamedLambdaVariable, addCtx),
              Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
            LambdaFunction(idRef: NamedLambdaVariable,
              Seq(idv: NamedLambdaVariable), _))
          if (addCtx.evalMode == EvalMode.LEGACY ||
              addCtx.evalMode == EvalMode.ANSI) &&
            isFloorE9(body, x, y) &&
            Set(a1.exprId, a2.exprId) == Set(acc.exprId, el.exprId) &&
            idRef.exprId == idv.exprId &&
            isFloatOrDoubleArray(left) && isFloatOrDoubleArray(right) =>
        FloorDotE9(left, right, failOnError = addCtx.evalMode == EvalMode.ANSI)
    }
}
