package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All strings reachable from the input by deleting at most `k`
  * characters (the input itself included) — the SymSpell blocking key
  * set for bounded edit distance.
  *
  * Soundness: if levenshtein(a, b) <= k then some common string lies in
  * both k-deletion neighborhoods (a substitution deletes one char from
  * each side, an insertion into `a` is a deletion from `b`, a deletion
  * from `a` is a deletion from `a`), so joining on neighborhood members
  * can never lose a qualifying pair. The converse does not hold —
  * candidates still get an exact `levenshtein` verify.
  *
  * Neighborhood size is O(len^k) (len<=12, k=2 → <=79 variants), so the
  * index is a constant factor over the corpus — pair generation becomes
  * output-driven instead of block-quadratic, the truly subquadratic
  * entity-resolution path.
  */
case class DeletionNeighborhood(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    DeletionNeighborhood.computeNeighborhood(
      input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.DeletionNeighborhood$$.MODULE$$" +
        s".computeNeighborhood($a, $k);")

  override protected def withNewChildInternal(
      newChild: Expression): DeletionNeighborhood = copy(child = newChild)
}

object DeletionNeighborhood {

  val functionName = "deletion_neighborhood"

  /** Kernel shared by interpreted eval and generated code: BFS over
    * single-character deletions, depth `k`, deduplicated. Deletions step
    * by CODE POINT, not UTF-16 unit — Spark's `levenshtein` counts code
    * points, so a surrogate pair (emoji, astral CJK) must cost one
    * deletion, not two, or the soundness guarantee breaks for
    * supplementary characters.
    */
  def computeNeighborhood(s: UTF8String, k: Int): GenericArrayData = {
    val seen = new java.util.LinkedHashSet[String]()
    var frontier = List(s.toString)
    seen.add(s.toString)
    var depth = 0
    while (depth < k && frontier.nonEmpty) {
      var next = List.empty[String]
      frontier.foreach { w =>
        var i = 0
        while (i < w.length) {
          val n = Character.charCount(w.codePointAt(i))
          val v = w.substring(0, i) + w.substring(i + n)
          if (seen.add(v)) next ::= v
          i += n
        }
      }
      frontier = next
      depth += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      functionName,
      exprs => DeletionNeighborhood(exprs(0),
        ExprArgs.literalInt(exprs(1), s"$functionName k")),
      "built-in")

  /** Column API: `array<string>` of ≤k-deletion variants. */
  def neighborhood(spark: SparkSession, s: Column, k: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      functionName, s, org.apache.spark.sql.functions.lit(k))
  }
}
