package graft.plans

import graft.functions.FloatDot
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Strength-reduction rule: rewrite the higher-order-function dot product
  *
  *   `aggregate(zip_with(CAST(a AS ARRAY<DOUBLE>), CAST(b AS ARRAY<DOUBLE>),
  *              (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)`
  *
  * over `array<float>` columns into the native [[FloatDot]] expression.
  *
  * Why a Rule and not "just use float_dot": the HOF form is what users
  * naturally write (and what arrives from ported SQL) — it allocates an
  * intermediate array and dispatches two lambdas per element, which s20's
  * measurement put at an order of magnitude over the fused loop at 10×
  * data. The rewrite is exactly value-preserving: [[FloatDot]] widens each
  * float pair to double and accumulates left-to-right from 0.0 — the same
  * op sequence the matched tree performs (float→double casts are exact,
  * double multiply/add of identical operands are IEEE-deterministic), a
  * parity VectorFunctionsSpec pins. Reordered operands are accepted
  * (per-element multiply and the running add are IEEE-commutative on
  * identical operands); anything else — different zero, extra conjuncts in
  * a lambda, nullable array elements (FloatDot assumes dense float arrays)
  * — is left untouched.
  *
  * Injected by [[graft.GraftExtensions]] (`injectOptimizerRule`) and
  * available for a live session via `spark.experimental.extraOptimizations`
  * (the u11 surface).
  */
object DotStrengthReduction extends Rule[LogicalPlan] {

  /** Accept an `array<float>` child either bare or under exactly ONE
    * `CAST(x AS ARRAY<DOUBLE>)` — the documented exact-widening shape the
    * HOF dot produces. Nothing else: stripping arbitrary cast chains
    * (e.g. float→string→double, or via ARRAY<INT>) would rewrite a
    * VALUE-CHANGING pipeline onto the raw floats — silently wrong in
    * every session, since the rule is globally injected. Parquet schemas
    * mark list elements nullable, so `containsNull` is accepted: the
    * engine's contract for embedding columns is dense float arrays
    * (every similarity operator applies [[FloatDot]] to them directly), and
    * a null element is data corruption either way — the HOF form would
    * yield a silent null score for it, which is not behavior to preserve.
    */
  private def floatArrayChild(e: Expression): Option[Expression] = e match {
    case c: Cast =>
      (c.dataType, c.child.dataType) match {
        case (ArrayType(DoubleType, _), ArrayType(FloatType, _)) =>
          Some(c.child)
        case _ => None
      }
    case other => other.dataType match {
      case ArrayType(FloatType, _) => Some(other)
      case _ => None
    }
  }

  /** The lambda body must be `f(x, y)` over exactly the lambda's own two
    * arguments (either order), with nothing else mixed in.
    */
  private def bindsBothArgs(
      args: Seq[NamedLambdaVariable], l: Expression, r: Expression): Boolean = {
    val ids = args.map(_.exprId).toSet
    Seq(l, r).forall {
      case v: NamedLambdaVariable => ids.contains(v.exprId)
      case _ => false
    } && (l match {
      case lv: NamedLambdaVariable => r match {
        case rv: NamedLambdaVariable => lv.exprId != rv.exprId
        case _ => false
      }
      case _ => false
    })
  }

  private def isIdentityFinish(finish: Expression): Boolean = finish match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      body.exprId == arg.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(zl, zr,
              LambdaFunction(Multiply(mx, my, _), zargs, _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(ax, ay, _), aargs, _),
            finish)
          if isIdentityFinish(finish) &&
            bindsBothArgs(zargs.collect { case v: NamedLambdaVariable => v }, mx, my) &&
            bindsBothArgs(aargs.collect { case v: NamedLambdaVariable => v }, ax, ay) &&
            floatArrayChild(zl).isDefined && floatArrayChild(zr).isDefined =>
        FloatDot(floatArrayChild(zl).get, floatArrayChild(zr).get)
    }
}
