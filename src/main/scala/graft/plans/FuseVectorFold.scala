package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.functions.{DotProduct, SquaredDiffSum}

/** Optimizer rule (SURVEY §4.3 stretch): rewrite the higher-order-function
  * vector folds into the native codegen'd expressions, so user code written
  * in the declarative HOF style gets the fused loop automatically:
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *     ==> graft_dot(a, b)
  *   aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0.0, (acc, v) -> acc + v)
  *     ==> graft_sqdiff(a, b)
  *
  * Safe because the native expressions evaluate the identical left-to-right
  * IEEE fold (graft.functions.VectorFold), so this is a pure physical
  * speedup: no value changes. Only fires on array<double> inputs with the
  * exact 0.0 seed, identity finish, and commutative-multiply step.
  *
  * Installed by GraftExtensions via injectOptimizerRule.
  */
object FuseVectorFold extends Rule[LogicalPlan] {

  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a), _) => v.exprId == a.exprId
    case _ => false
  }

  private def isSumMerge(f: Expression): Boolean = f match {
    case LambdaFunction(Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _), Seq(acc, elem), _) =>
      (l.exprId == acc.exprId && r.exprId == elem.exprId) ||
        (l.exprId == elem.exprId && r.exprId == acc.exprId)
    case _ => false
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isZero(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case _ => false
  }

  /** x * y over exactly the two zip_with lambda vars (either order). */
  private def isPairMultiply(f: Expression): Option[Unit] = f match {
    case LambdaFunction(Multiply(l: NamedLambdaVariable, r: NamedLambdaVariable, _), Seq(x, y), _)
        if (l.exprId == x.exprId && r.exprId == y.exprId) ||
          (l.exprId == y.exprId && r.exprId == x.exprId) => Some(())
    case _ => None
  }

  /** (x - y) * (x - y) over the two zip_with lambda vars. */
  private def isSquaredDiff(f: Expression): Option[Unit] = f match {
    case LambdaFunction(
        Multiply(Subtract(a1: NamedLambdaVariable, b1: NamedLambdaVariable, _),
          Subtract(a2: NamedLambdaVariable, b2: NamedLambdaVariable, _), _),
        Seq(x, y), _)
        if a1.exprId == a2.exprId && b1.exprId == b2.exprId &&
          a1.exprId == x.exprId && b1.exprId == y.exprId => Some(())
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(ZipWith(a, b, zipF), zero, merge, finish)
        if isDoubleArray(a) && isDoubleArray(b) && isZero(zero) &&
          isSumMerge(merge) && isIdentityFinish(finish) &&
          isPairMultiply(zipF).isDefined =>
      DotProduct(a, b)
    case ArrayAggregate(ZipWith(a, b, zipF), zero, merge, finish)
        if isDoubleArray(a) && isDoubleArray(b) && isZero(zero) &&
          isSumMerge(merge) && isIdentityFinish(finish) &&
          isSquaredDiff(zipF).isDefined =>
      SquaredDiffSum(a, b)
  }
}
