package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the declarative higher-order-function dot
  * product — `aggregate(zip_with(a, b, (x, y) -> x * y), 0d,
  * (acc, v) -> acc + v)` — into the codegen'd [[DotProduct]]
  * expression.
  *
  * Why a RULE and not just a function: the HOF chain is what a user
  * naturally writes, and it evaluates as CodegenFallback with a
  * per-row intermediate array — measured ~100× slower than the native
  * expression on the all-pairs similarity workload (AnnSpec proves the
  * two are bit-identical: same strict left fold from 0.0). With the
  * rule injected, user-written HOF cosine gets the native inner loop
  * automatically; nobody has to know `graft_dot` exists.
  *
  * Scope guard: both arrays must be `array<double>`. For the dense
  * equal-length embedding arrays this engine processes, results are
  * bit-identical. The semantic difference is ragged/null input:
  * `zip_with` null-pads the shorter array and propagates null elements
  * (sum becomes null) while [[DotProduct]] truncates to the shorter
  * length — embeddings are fixed-dimension and dense, and the engine's
  * own HOF baseline (`Vectors.dotHof`) documents the same truncation
  * intent. Sessions processing ragged/nullable array data can switch
  * the rule off per-session with
  * `SET spark.graft.rewriteHofDot.enabled=false`.
  */
object RewriteHofDot extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.rewriteHofDot.enabled"

  /** Parquet-loaded arrays usually carry containsNull=true even for
    * dense data, which keeps the static guard conservative (the rule
    * then does not fire). Sessions that KNOW their array<double> data
    * is dense can relax the guard to nullable element types with
    * `SET spark.graft.rewriteHofDot.assumeDense=true` — the documented
    * ragged/null caveats then apply. */
  val AssumeDenseKey = "spark.graft.rewriteHofDot.assumeDense"

  // Default guard: containsNull must be statically false — a null
  // element makes the HOF form return NULL while DotProduct reads the
  // slot as 0. The cost of the safety is reduced applicability
  // (parquet schemas usually say nullable even for dense data);
  // AssumeDenseKey opts trusted-dense sessions back in. The
  // ragged-length case is never statically checkable and is covered by
  // the kill switch + scaladoc.
  private def isDoubleArray(e: Expression, assumeDense: Boolean): Boolean =
    e.dataType match {
      case ArrayType(DoubleType, containsNull) => assumeDense || !containsNull
      case _ => false
    }

  private def isIdentity(finish: Expression): Boolean = finish match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      v.exprId == a.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "true").toBoolean) return plan
    val assumeDense = conf.getConfString(AssumeDenseKey, "false").toBoolean
    plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b,
          LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
            Seq(xv: NamedLambdaVariable, yv: NamedLambdaVariable), _)),
        Literal(0.0, DoubleType),
        LambdaFunction(Add(m1: NamedLambdaVariable, m2: NamedLambdaVariable, _),
          Seq(av: NamedLambdaVariable, vv: NamedLambdaVariable), _),
        finish)
      if isIdentity(finish) &&
        Set(x.exprId, y.exprId) == Set(xv.exprId, yv.exprId) &&
        Set(m1.exprId, m2.exprId) == Set(av.exprId, vv.exprId) &&
        isDoubleArray(a, assumeDense) && isDoubleArray(b, assumeDense) =>
      DotProduct(a, b)
    }
  }
}

/** `spark.sql.extensions`-loadable entry point: registers the
  * [[RewriteHofDot]] optimizer rule AND the `graft_dot` function on
  * every session built with these extensions
  * (`--conf spark.sql.extensions=graft.expressions.GraftExtensions`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteHofDot)
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier(GraftFunctions.DotName),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DotProduct].getName, GraftFunctions.DotName),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
  }
}
