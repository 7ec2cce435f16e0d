package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.CosineSimilarity

/** Optimizer rule (SURVEY §4.3's optional `Rule[LogicalPlan]`): rewrite
  * the declarative higher-order-function cosine —
  * `aggregate(zip_with(a,b,*), 0.0, +) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))`,
  * the tree `VectorFunctions.cosine` builds — into the codegen'd
  * [[CosineSimilarity]] expression. HOF lambdas run interpreted per
  * element outside whole-stage codegen; the native kernel is a measured
  * 4.4× on embedding scans, and the rewrite lets users keep writing the
  * declarative form.
  *
  * Soundness contract: bit-identical accumulation (same element order,
  * double precision — CosineSimilaritySpec asserts equality) for
  * equal-length, non-degenerate float vectors. Degenerate inputs differ
  * deliberately: the HOF form yields null/NaN for mismatched lengths or
  * zero norms where the native kernel yields 0.0. Embedding columns are
  * fixed-dimension by construction, but the rewrite is conf-gated
  * (`spark.graft.cosineRewrite`, default true) for strict-HOF-semantics
  * users. Only `array<float>` inputs rewrite (the kernel's input type).
  *
  * Registered by [[graft.GraftExtensions]]
  * (`spark.sql.extensions=graft.GraftExtensions`) or per-session via
  * `spark.experimental.extraOptimizations`.
  */
object RewriteHofCosine extends Rule[LogicalPlan] {

  /** Matches `aggregate(zip_with(a, b, (x,y) => double(x) * double(y)),
    * 0.0, (acc,v) => acc + v)` — the dot-product subtree.
    */
  private object DotProduct {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(
            Multiply(Cast(_: NamedLambdaVariable, DoubleType, _, _),
              Cast(_: NamedLambdaVariable, DoubleType, _, _), _), _, _)),
          Literal(0.0, DoubleType),
          LambdaFunction(
            Add(_: NamedLambdaVariable, _: NamedLambdaVariable, _), _, _),
          LambdaFunction(_: NamedLambdaVariable, _, _)) => Some((a, b))
      case _ => None
    }
  }

  private def floatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString("spark.graft.cosineRewrite", "true") != "true") {
      plan
    } else {
      plan.transformAllExpressions {
        case Divide(DotProduct(a, b),
            Multiply(Sqrt(DotProduct(a1, a2)), Sqrt(DotProduct(b1, b2)), _), _)
            if floatArray(a) && floatArray(b) &&
              a.semanticEquals(a1) && a.semanticEquals(a2) &&
              b.semanticEquals(b1) && b.semanticEquals(b2) =>
          CosineSimilarity(a, b)
      }
    }
}
