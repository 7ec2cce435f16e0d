package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro string similarity (Jaro 1989, the record-linkage classic) as a
  * codegen'd Catalyst expression — the fuzzy-match kernel for entity
  * resolution where Levenshtein's edit-window blocking is too strict:
  * Jaro tolerates transpositions and scores against BOTH lengths, the
  * standard choice for name/label matching.
  *
  * Definition (the one every engine implements): characters match if
  * equal and within ⌊max(|a|,|b|)/2⌋−1 positions; m = matches, t = half
  * the aligned-match mismatches; sim = (m/|a| + m/|b| + (m−t)/m)/3,
  * with 1.0 for two empty strings and 0.0 when either is empty or
  * m = 0. Comparison is by UTF-16 code unit, which coincides with
  * codepoint comparison on the fixture's ASCII data.
  *
  * Scale shape: a pure per-row kernel (zero shuffle, participates in
  * whole-stage codegen via the static-call pattern all repo kernels
  * use). The PAIR GENERATION around it must be blocked — same argument
  * as the edit-distance family ([[graft.operators.Dedup]]): Jaro's
  * match window gives no index structure, so blocking is the scale
  * path, and the kernel's O(|a|·window) worst case is bounded by the
  * block's string lengths.
  */
case class JaroSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, string), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroSimilarity.jaro(
      a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroSimilarity$$.MODULE$$" +
        s".jaro($a.toString(), $b.toString());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroSimilarity =
    copy(left = newLeft, right = newRight)
}

object JaroSimilarity {

  val functionName = "jaro_sim"

  /** Kernel shared by interpreted eval and generated code. One flag
    * array per side, two passes (match, then transposition count) —
    * O(|a|·window) time, O(|a|+|b|) scratch.
    */
  def jaro(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aFlags = new Array[Boolean](la)
    val bFlags = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(i - window, 0)
      val hi = math.min(i + window + 1, lb)
      var j = lo
      var found = false
      while (!found && j < hi) {
        if (!bFlags(j) && a.charAt(i) == b.charAt(j)) {
          aFlags(i) = true; bFlags(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // aligned walk over matched characters of both sides
    var mismatches = 0
    var j = 0
    i = 0
    while (i < la) {
      if (aFlags(i)) {
        while (!bFlags(j)) j += 1
        if (a.charAt(i) != b.charAt(j)) mismatches += 1
        j += 1
      }
      i += 1
    }
    val md = m.toDouble
    val t = mismatches / 2.0
    (md / la + md / lb + (md - t) / md) / 3.0
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      functionName,
      exprs => JaroSimilarity(exprs(0), exprs(1)),
      "built-in")

  /** Column API: jaro similarity of two string columns in [0, 1]. */
  def sim(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(functionName, a, b)
  }
}
