package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 64-bit SimHash fingerprint of a token-hash array, in one pass.
  *
  * Replaces the explode-by-bit-index aggregation (tokens × 64 narrow
  * rows through a two-level groupBy): per-document token hashes are
  * collected once (one narrow shuffle) and the ±1 bit sums accumulate in
  * a primitive loop — `64 × tokens` shift-and-add per row with no
  * intermediate rows. Fingerprints are bit-identical to the aggregate
  * form (same per-bit counts, same sign rule, bit j set iff more tokens
  * carry bit j than not).
  *
  * Duplicate tokens weight the sums exactly as the exploded form did
  * (collect_list keeps duplicates). Empty input → fingerprint 0L
  * (all counts zero; such documents never reach this expression — they
  * have no token rows).
  */
case class SimHashFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHashFingerprint.computeFingerprint(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimHashFingerprint$$.MODULE$$" +
        s".computeFingerprint($a);")

  override protected def withNewChildInternal(
      newChild: Expression): SimHashFingerprint = copy(child = newChild)
}

object SimHashFingerprint {

  val functionName = "simhash_fingerprint"

  /** Kernel shared by interpreted eval and generated code. */
  def computeFingerprint(hs: ArrayData): Long = {
    val n = hs.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) fp |= 1L << j
      j += 1
    }
    fp
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      functionName,
      exprs => SimHashFingerprint(exprs(0)),
      "built-in")

  /** Column API: bigint fingerprint of a token-hash array. */
  def fp(spark: SparkSession, hs: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(functionName, hs)
  }
}
