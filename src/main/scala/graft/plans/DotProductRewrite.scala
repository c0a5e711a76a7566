package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.DotProduct

/** Optimizer rule: recognize the higher-order-function dot-product
  * patterns and rewrite them to the native codegen'd
  * [[graft.functions.DotProduct]]:
  *
  *  - `aggregate(zip_with(a, b, (u, v) -> u * v), 0.0D, (acc, x) -> acc + x)`
  *    → `graft_dot(a, b)`
  *  - `aggregate(v, 0.0D, (acc, x) -> acc + x * x)` → `graft_dot(v, v)`
  *
  * Sound because DotProduct reproduces the HOF semantics exactly: the
  * same sequential left-to-right fold (bit-identical doubles), NULL on
  * a null element, and NULL on length mismatch (zip_with pads with
  * nulls, which the fold then propagates).
  *
  * Runs in the operator-optimization batch (fixed point, after
  * constant folding normalizes the zero literal), injected via
  * [[graft.functions.GraftExtensions]] or
  * `experimentalMethods.extraOptimizations` (GraftSession).
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _                        => false
  }

  // (acc, x) -> acc + x
  private object SumLambda {
    def unapply(e: Expression): Boolean = e match {
      case LambdaFunction(Add(acc: NamedLambdaVariable, x: NamedLambdaVariable, _),
          Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
        acc.exprId == a.exprId && x.exprId == b.exprId
      case _ => false
    }
  }

  // (acc, x) -> acc + x * x
  private object SumSquareLambda {
    def unapply(e: Expression): Boolean = e match {
      case LambdaFunction(
          Add(acc: NamedLambdaVariable,
            Multiply(x1: NamedLambdaVariable, x2: NamedLambdaVariable, _), _),
          Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
        acc.exprId == a.exprId && x1.exprId == b.exprId && x2.exprId == b.exprId
      case _ => false
    }
  }

  // (u, v) -> u * v
  private object ProductLambda {
    def unapply(e: Expression): Boolean = e match {
      case LambdaFunction(Multiply(u: NamedLambdaVariable, v: NamedLambdaVariable, _),
          Seq(lu: NamedLambdaVariable, lv: NamedLambdaVariable), _) =>
        u.exprId == lu.exprId && v.exprId == lv.exprId
      case _ => false
    }
  }

  private object IdentityFinish {
    def unapply(e: Expression): Boolean = e match {
      case LambdaFunction(x: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
        x.exprId == a.exprId
      case _ => false
    }
  }

  private object DoubleZero {
    def unapply(e: Expression): Boolean = e match {
      case Literal(0.0, DoubleType) => true
      case _                        => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(ZipWith(a, b, ProductLambda()), DoubleZero(),
        SumLambda(), IdentityFinish())
        if isDoubleArray(a) && isDoubleArray(b) =>
      DotProduct(a, b)
    // DotProduct(v, v) names v twice; whole-stage codegen's
    // subexpression elimination evaluates the duplicate subtree once,
    // and the deterministic guard keeps the interpreted fallback
    // correct (merely up to 2× on that cold path).
    case ArrayAggregate(v, DoubleZero(), SumSquareLambda(), IdentityFinish())
        if isDoubleArray(v) && v.deterministic =>
      DotProduct(v, v)
  }
}
