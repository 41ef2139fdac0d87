package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreePattern
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import graft.functions.ArrayDotProductF

/** Optimizer rule (the `injectOptimizerRule` extension tier, completing
  * the toolbox next to the AsOfJoin LogicalPlan/Strategy pair): rewrite
  * the higher-order-function dot-product idiom
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  *               0.0D, (acc, v) -> acc + v) }}}
  *
  * over `array<float>` columns into the codegen'd [[ArrayDotProductF]]
  * primitive — same double-precision array-order fold, but no
  * intermediate product array and no per-element lambda dispatch. Users
  * who write the portable HOF form get the native hot loop for free.
  *
  * Deliberately conservative: it fires ONLY on the exact
  * double-cast-then-multiply shape above (a bare float multiply rounds
  * each product to float first — numerically different — and is left
  * alone). Injected rules run after the main optimizer batch, so the
  * zero literal may arrive either pre- or post-constant-folding; both
  * spellings are accepted.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isDoubleZero(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType)                   => true
    case Cast(Literal(v, _), DoubleType, _, _)      => v == 0 || v == 0.0
    case _                                          => false
  }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  private def doubleCastOf(e: Expression): Option[ExprId] = e match {
    case Cast(v: NamedLambdaVariable, DoubleType, _, _) => Some(v.exprId)
    case _                                              => None
  }

  // TreePattern pruning matters: injected rules re-run on every AQE
  // stage re-optimization, so an unguarded whole-tree expression walk
  // taxes EVERY query in the engine (~10% measured on the full bench).
  // With the bitmask guard, plans without higher-order functions skip
  // the rule in O(1).
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(
      _.containsPattern(TreePattern.HIGH_ORDER_FUNCTION)) {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(Multiply(ml, mr, _),
              Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            zero,
            LambdaFunction(Add(al, ar, _),
              Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable,
              Seq(fv: NamedLambdaVariable), _))
          if isFloatArray(a) && isFloatArray(b) && isDoubleZero(zero) &&
            fin.exprId == fv.exprId &&
            Set(doubleCastOf(ml), doubleCastOf(mr)) ==
              Set[Option[ExprId]](Some(x.exprId), Some(y.exprId)) &&
            Set(al, ar).collect { case nv: NamedLambdaVariable => nv.exprId } ==
              Set(acc.exprId, v.exprId) =>
        ArrayDotProductF(a, b)
    }
}
