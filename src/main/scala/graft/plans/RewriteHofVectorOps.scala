package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType
import graft.expressions.DotProduct

/** Optimizer rule: rewrite the interpreted higher-order-function dot-product
  * pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, v) -> acc + v)
  *
  * into the native codegen'd [[graft.expressions.DotProduct]]. The HOF
  * formulation is the natural way users write this against the public API,
  * but ArrayAggregate/ZipWith are CodegenFallback — every element walks an
  * interpreted expression tree (measured ~50× slower in pairwise similarity
  * joins, PLANS.md). The rewrite is bit-exact: both fold left-to-right over
  * doubles, and DotProduct reproduces the HOF's NULL semantics (ragged
  * lengths → zip_with null-pads → NULL; any null element poisons the
  * running add → NULL). Equivalence asserted in SimilaritySpec.
  *
  * Registered via GraftExtensions (session extension) or
  * `spark.experimental.extraOptimizations` at runtime.
  *
  * SURVEY.md §7.3: this is the ladder's step (b)→(c) boundary — a custom
  * Expression plus a Rule, no custom physical operator needed.
  */
object RewriteHofVectorOps extends Rule[LogicalPlan] {

  private def isIdentityFinish(finish: Expression): Boolean = finish match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      v.exprId == arg.exprId
    case _ => false
  }

  private def isElementwiseMultiply(fn: Expression): Boolean = fn match {
    case LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      (x.exprId == a.exprId && y.exprId == b.exprId) ||
        (x.exprId == b.exprId && y.exprId == a.exprId)
    case _ => false
  }

  private def isSumMerge(fn: Expression): Boolean = fn match {
    case LambdaFunction(Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
        Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      (l.exprId == acc.exprId && r.exprId == v.exprId) ||
        (l.exprId == v.exprId && r.exprId == acc.exprId)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(ZipWith(a, b, mult), Literal(0.0, DoubleType), merge, finish)
        if isElementwiseMultiply(mult) && isSumMerge(merge) && isIdentityFinish(finish) &&
          Seq(a, b).forall(_.dataType match {
            case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
            case _ => false
          }) =>
      DotProduct(a, b)
  }
}
