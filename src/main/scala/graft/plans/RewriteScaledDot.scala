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

  /** FLOOR(CAST(x AS DOUBLE) * 1000000.0) over a FLOAT lambda variable,
    * with or without a (redundant, optimizer-stripped) outer BIGINT cast —
    * returns the variable's exprId. Only the float form may match:
    * [[ScaledDotProduct]] reads elements via getFloat, so rewriting an
    * array<double> zip_with (bare DoubleType variable) would misread the
    * ArrayData buffer. Running post-analysis, no cast gets re-inserted.
    */
  private def scaledVarId(e: Expression): Option[ExprId] = e match {
    case Cast(inner, LongType, _, _) => scaledVarId(inner)
    case Floor(Multiply(Cast(v: NamedLambdaVariable, DoubleType, _, _),
                        Literal(1000000.0, DoubleType), _)) if v.dataType == FloatType =>
      Some(v.exprId)
    case _ => None
  }

  /** The multiply must consume the LambdaFunction's own two DISTINCT
    * arguments (by exprId), one on each side — else (x, y) -> f(x)*f(x)
    * or a lambda over captured outer variables would wrongly match.
    */
  private def isScaledMultiply(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(lx, ly, _), Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _)
        if a.exprId != b.exprId =>
      (scaledVarId(lx), scaledVarId(ly)) match {
        case (Some(i), Some(j)) =>
          (i == a.exprId && j == b.exprId) || (i == b.exprId && j == a.exprId)
        case _ => false
      }
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
