package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd Catalyst expression — the
  * canonicalization step every text pipeline runs before hashing or
  * matching: visually-identical strings with different codepoint
  * sequences (é precomposed vs e + combining acute) hash differently,
  * so exact dedup, decontamination n-grams, and blocklist joins all
  * silently miss unless input is canonical. Spark ships no NFC
  * built-in; this wraps `java.text.Normalizer` (the JDK's ICU-derived
  * implementation of UAX #15 — the same standard DuckDB's utf8proc
  * implements, which is what makes the differential oracle possible).
  *
  * Scale shape: pure per-row kernel, zero shuffle, whole-stage codegen
  * via the static-call pattern all repo kernels use. The already-NFC
  * fast path (`Normalizer.isNormalized`) returns the INPUT UTF8String
  * unchanged — on real corpora almost every row, so the common case
  * allocates nothing.
  */
case class NormalizeNfc(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects string, got ${t.catalogString}")
    }

  override def dataType: DataType = StringType

  override def nullSafeEval(s: Any): Any =
    NormalizeNfc.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.NormalizeNfc$$.MODULE$$.nfc($s);")

  override protected def withNewChildInternal(
      newChild: Expression): NormalizeNfc = copy(child = newChild)
}

object NormalizeNfc {

  val functionName = "graft_nfc"

  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(
        str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Register as a SQL function on the session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      functionName, exprs => NormalizeNfc(exprs(0)), "built-in")

  /** Column-level API (the [[CosineSimilarity.cosineNative]] routing —
    * Column no longer wraps Expressions directly in Spark 4).
    */
  def normalize(spark: SparkSession, text: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(functionName, text)
  }
}
