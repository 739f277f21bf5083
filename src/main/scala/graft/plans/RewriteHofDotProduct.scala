package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Cast, Expression, LambdaFunction, Literal, Multiply, NamedExpression, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

import graft.functions.DotProduct

/** Optimizer rule: rewrite the portable higher-order dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, v) => acc + v)
  *
  * into the fused codegen [[DotProduct]] expression. Users (and the
  * engine's own portable fallback `Similarity.dotHof`) writing the HOF
  * form get the native loop automatically.
  *
  * Safe as a pure performance rewrite because DotProduct's null semantics
  * deliberately mirror the HOF form: unequal lengths → null (zip_with pads
  * with null), null element → null (poisons multiply then sum), and
  * summation runs in ascending index order in both.
  *
  * Registered via SparkSessionExtensions.injectOptimizerRule in
  * [[graft.GraftExtensions]].
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isVec(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** strip a cast-to-double wrapper (dotHof casts float elems up) */
  private def strip(e: Expression): Expression = e match {
    case c: Cast if c.dataType == DoubleType => c.child
    case other => other
  }

  private def isArgPair(l: Expression, r: Expression, args: Seq[NamedExpression]): Boolean = {
    val (x, y) = (args(0), args(1))
    (strip(l).semanticEquals(x) && strip(r).semanticEquals(y)) ||
      (strip(l).semanticEquals(y) && strip(r).semanticEquals(x)) // commutative
  }

  private def isIdentity(lf: LambdaFunction): Boolean =
    lf.arguments.size == 1 && lf.function.semanticEquals(lf.arguments.head)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(l, r, LambdaFunction(m: Multiply, margs, _)),
          Literal(zero, DoubleType),
          LambdaFunction(a: Add, aargs, _),
          fin: LambdaFunction)
        if zero == 0.0 && isVec(l.dataType) && isVec(r.dataType) &&
          margs.size == 2 && aargs.size == 2 &&
          isArgPair(m.left, m.right, margs) &&
          isArgPair(a.left, a.right, aargs) &&
          isIdentity(fin) =>
      DotProduct(l, r)
  }
}
