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
    * 0.0, (acc,v) => acc + v)` — the dot-product subtree. Each referenced
    * variable is bound back to its enclosing lambda's parameters (one of
    * each, in either order — `*` and `+` are bit-commutative on doubles),
    * so look-alike trees over the wrong variables (`x*x` sums of squares,
    * `v+v` merges, references to an outer lambda's variable) do NOT match.
    */
  private object DotProduct {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(
            Multiply(Cast(x: NamedLambdaVariable, DoubleType, _, _),
              Cast(y: NamedLambdaVariable, DoubleType, _, _), _),
            Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(
            Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _),
            Seq(ma: NamedLambdaVariable, mv: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable,
            Seq(fa: NamedLambdaVariable), _))
          if oneEach(x, y, zx, zy) && oneEach(acc, v, ma, mv) &&
            fin.exprId == fa.exprId =>
        Some((a, b))
      case _ => None
    }

    /** p and q are exactly the two lambda parameters, one each. */
    private def oneEach(p: NamedLambdaVariable, q: NamedLambdaVariable,
        arg1: NamedLambdaVariable, arg2: NamedLambdaVariable): Boolean =
      (p.exprId == arg1.exprId && q.exprId == arg2.exprId) ||
        (p.exprId == arg2.exprId && q.exprId == arg1.exprId)
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
