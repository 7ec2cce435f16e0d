package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, GlobalLimit, LocalLimit, LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, FloatType}

import graft.functions.{CosineSimilarity, LshBucketMatch, LshBuckets}

/** ANN index substitution (SURVEY §4.3: "rewrite similarity-search-then-
  * limit into a pruned top-k exchange"): a `Rule[LogicalPlan]` that
  * recognizes the exact cosine top-k shape —
  *
  * {{{
  *   corpus.withColumn("sim", cosine($"embedding", lit(queryVec)))
  *         .orderBy($"sim".desc).limit(k)        // or orderBy(cosine...desc)
  * }}}
  *
  * — and injects a random-hyperplane LSH bucket filter under the sort,
  * so the `TakeOrderedAndProject` that Spark plans for sort+limit scans
  * only the query's collision candidates (~n·tables/2^bits rows) instead
  * of scoring the whole corpus. The query vector is a literal, so its
  * buckets are computed once at PLANNING time on the driver; the
  * per-row side is the same codegen'd [[LshBuckets]] kernel the explicit
  * ANN operators use. This is the planner move a vector store makes when
  * it selects an approximate index for a top-k query.
  *
  * The rewrite is APPROXIMATE — the result is a subset of the exact
  * top-k with LSH's OR-construction recall — so unlike
  * [[RewriteHofCosine]] it defaults OFF and must be opted into per
  * session/query:
  *
  * {{{
  *   spark.graft.annRewrite         = true | false   (default false)
  *   spark.graft.annRewrite.tables  = 16             (hash tables)
  *   spark.graft.annRewrite.bits    = 6              (bits per table)
  * }}}
  *
  * Matching is deliberately conservative: a single descending sort key,
  * the key is `CosineSimilarity(emb, Literal)` either inline or through
  * one `Alias` in the immediate child `Project`, the non-literal side is
  * `array<float>`, and every attribute the filter needs is visible at
  * the injection point. Idempotence: the rule skips when the sort child
  * is already the bucket filter it would inject.
  */
object RewriteAnnTopK extends Rule[LogicalPlan] {

  /** The cosine scoring expression with exactly one literal side:
    * (corpus-side expression, query literal).
    */
  private object ScoredCosine {
    def unapply(e: Expression): Option[(Expression, Literal)] = e match {
      case CosineSimilarity(emb, q: Literal) => Some((emb, q))
      case CosineSimilarity(q: Literal, emb) => Some((emb, q))
      case _ => None
    }
  }

  private def floatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Resolve the sort key to a scored cosine: either the expression
    * itself, or an attribute aliased to one in the immediate Project.
    */
  private def resolveKey(
      key: Expression, child: LogicalPlan): Option[(Expression, Literal)] =
    key match {
      case ScoredCosine(emb, q) => Some((emb, q))
      case a: AttributeReference =>
        child match {
          case Project(projectList, _) =>
            projectList.collectFirst {
              case al @ Alias(ScoredCosine(emb, q), _)
                  if al.exprId == a.exprId => (emb, q)
            }
          case _ => None
        }
      case _ => None
    }

  /** The query literal's bucket per table, computed once on the driver. */
  private def queryBuckets(q: Literal, tables: Int, bits: Int): Array[Int] =
    LshBuckets.computeBuckets(q.value.asInstanceOf[ArrayData], tables, bits)
      .toIntArray()

  /** One [[LshBucketMatch]] probe — a single early-exit kernel pass per
    * row. An Or-chain of per-table `GetArrayItem(LshBuckets(emb), t) =
    * qb(t)` comparisons would embed the full projection kernel once per
    * branch (no subexpression elimination inside a Filter predicate),
    * costing `tables×` the work and dwarfing the exact cosine the
    * rewrite avoids.
    */
  private def bucketPredicate(
      emb: Expression, q: Literal, tables: Int, bits: Int): Expression =
    LshBucketMatch(emb, queryBuckets(q, tables, bits), bits)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString("spark.graft.annRewrite", "false") != "true") {
      return plan
    }
    val tables =
      conf.getConfString("spark.graft.annRewrite.tables", "16").toInt
    val bits = conf.getConfString("spark.graft.annRewrite.bits", "6").toInt
    plan.transform {
      case gl @ GlobalLimit(IntegerLiteral(_), ll @ LocalLimit(_,
          srt @ Sort(Seq(SortOrder(key, Descending, _, _)), true, child, _))) =>
        resolveKey(key, child) match {
          case Some((emb, q))
              if floatArray(emb) && floatArray(q) &&
                q.value != null &&
                q.value.asInstanceOf[ArrayData].numElements() > 0 &&
                // already rewritten? (fixed-point safety)
                !child.exists {
                  case Filter(cond, _) =>
                    cond.exists(_.isInstanceOf[LshBucketMatch])
                  case _ => false
                } =>
            val pred = bucketPredicate(emb, q, tables, bits)
            if (pred.references.subsetOf(child.outputSet)) {
              gl.copy(child = ll.copy(child =
                srt.copy(child = Filter(pred, child))))
            } else gl
          case _ => gl
        }
    }
  }
}
