package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftshims.ScaledDotProduct
import org.apache.spark.sql.types.{DoubleType, FloatType, LongType}

/** Optimizer rule: recognize the declarative scaled-dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> CAST(FLOOR(CAST(x AS DOUBLE) * 1e6) AS BIGINT)
  *                                    * CAST(FLOOR(CAST(y AS DOUBLE) * 1e6) AS BIGINT)),
  *             0L, (acc, v) -> acc + v)
  *
  * and replace it with the fused native [[ScaledDotProduct]] — users (and
  * older query code) writing the composable higher-order-function form get
  * the no-allocation loop automatically. Registered via [[GraftExtensions]]
  * (injectOptimizerRule) or `spark.experimental.extraOptimizations`.
  */
object RewriteScaledDot extends Rule[LogicalPlan] {

  /** FLOOR(CAST(x AS DOUBLE) * 1000000.0) over a lambda var, with or
    * without a (redundant, optimizer-stripped) outer BIGINT cast.
    */
  private def isScaledElement(e: Expression): Boolean = e match {
    case Cast(inner, LongType, _, _) => isScaledElement(inner)
    case Floor(Multiply(inner, Literal(1000000.0, DoubleType), _)) =>
      inner match {
        case Cast(v: NamedLambdaVariable, DoubleType, _, _) => v.dataType == FloatType
        case v: NamedLambdaVariable                         => v.dataType == DoubleType
        case _                                              => false
      }
    case _ => false
  }

  private def isScaledMultiply(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(lx, ly, _), _, _) => isScaledElement(lx) && isScaledElement(ly)
    case _ => false
  }

  private def isSumMerge(f: Expression): Boolean = f match {
    case LambdaFunction(Add(_: NamedLambdaVariable, _: NamedLambdaVariable, _), _, _) => true
    case _ => false
  }

  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) => v.exprId == arg.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(ZipWith(l, r, merge), Literal(0L, LongType), agg, finish)
        if isScaledMultiply(merge) && isSumMerge(agg) && isIdentityFinish(finish) =>
      ScaledDotProduct(l, r)
  }
}
