package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.VecDot

/** Rewrites the builtin higher-order-function dot-product idiom
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v) }}}
  *
  * into the codegen'd [[graft.functions.VecDot]] kernel. The HOF form is
  * how users naturally write a dot product in plain SQL, but it
  * allocates an intermediate array per row and evaluates the lambdas
  * interpreted, outside whole-stage codegen — a 100 TB similarity scan
  * written that way pays for it per candidate pair. The rewrite keeps
  * results bit-identical by being conservative:
  *
  *   - both inputs must be `array<double>` with non-null elements
  *     (float inputs round the product to float in the HOF but not in
  *     VecDot; a null element nulls the HOF fold);
  *   - the fold must be exactly the ascending-index double chain VecDot
  *     performs: zero literal 0.0, merge `acc + v` (either operand
  *     order), finish the identity lambda;
  *   - unequal lengths null the HOF result (zip_with pads with null,
  *     which poisons the fold), so the rewrite guards with
  *     `if(size(a) = size(b), vec_dot(a, b), null)`;
  *   - non-deterministic inputs are left alone (the guard would
  *     re-evaluate them).
  *
  * Registered by `GraftExtensions` via `injectOptimizerRule`, so any
  * session deployed with `spark.sql.extensions=graft.functions
  * .GraftExtensions` upgrades user SQL transparently. */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case agg @ ArrayAggregate(
            ZipWith(a, b, LambdaFunction(Multiply(mx, my, _), Seq(zx, zy), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(al, ar, _), Seq(acc, elem), _),
            LambdaFunction(fv: NamedLambdaVariable, Seq(farg), _))
          if sameVars(Seq(mx, my), Seq(zx, zy)) &&
            sameVars(Seq(al, ar), Seq(acc, elem)) &&
            sameVar(fv, farg) &&
            doubleArray(a) && doubleArray(b) &&
            a.deterministic && b.deterministic =>
        If(EqualTo(Size(a, legacySizeOfNull = false),
             Size(b, legacySizeOfNull = false)),
          VecDot(a, b),
          Literal(null, DoubleType))
    }

  // the merge/multiply operands must be exactly the lambda's own two
  // variables, one each, in either order
  private def sameVars(used: Seq[Expression], declared: Seq[Expression]): Boolean = {
    val ids = declared.collect { case v: NamedLambdaVariable => v.exprId }
    ids.length == 2 &&
      used.forall {
        case v: NamedLambdaVariable => ids.contains(v.exprId)
        case _ => false
      } &&
      used.collect { case v: NamedLambdaVariable => v.exprId }.distinct.length == 2
  }

  private def sameVar(used: NamedLambdaVariable, declared: Expression): Boolean =
    declared match {
      case v: NamedLambdaVariable => v.exprId == used.exprId
      case _ => false
    }

  private def doubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, containsNull) => !containsNull
    case _ => false
  }
}
