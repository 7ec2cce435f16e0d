package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression

/** Shared argument folding for function registration: kernel knobs
  * (deletion budget k, LSH tables/bits, signature width) are plan-shape
  * constants, so they must fold to literals at registration time — one
  * helper instead of a private copy per expression object.
  */
object ExprArgs {
  def literalInt(e: Expression, context: String): Int = e.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"$context expects a literal int, got $other")
  }
}
