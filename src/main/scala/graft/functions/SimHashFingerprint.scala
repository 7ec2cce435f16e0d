package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash fingerprint of a document's token array, in one pass.
  *
  * Shape history: 64 separate sum() columns are a Janino cold-compile
  * trap; explode-by-bit-index fixed that but materialized tokens × 64
  * rows; collect_list-then-kernel removed the row blowup but still
  * shuffled every token hash and buffered a whole document's hashes as
  * aggregation state. Final form: the kernel consumes the PER-ROW token
  * array directly — `array<string>` tokens are hashed inside the loop
  * with the same XXH64 family as Spark's `xxhash64` (seed 42), so
  * fingerprints stay bit-identical to the exploded form while the
  * operator becomes a pure per-row map: zero shuffle, zero aggregation
  * state, trivially scale-safe.
  *
  * `array<bigint>` input (pre-hashed tokens) is still accepted for
  * callers that already carry fingerprints.
  *
  * Duplicate tokens weight the ±1 sums exactly as the exploded form did.
  * Empty input → fingerprint 0L (callers filter token-less documents to
  * preserve the exploded form's semantics, which emitted no row).
  */
case class SimHashFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) | ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint> or array<string>, " +
        s"got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  private def fromStrings: Boolean = child.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    if (fromStrings)
      SimHashFingerprint.computeFromTokens(input.asInstanceOf[ArrayData])
    else
      SimHashFingerprint.computeFingerprint(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel =
      if (fromStrings) "computeFromTokens" else "computeFingerprint"
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimHashFingerprint$$.MODULE$$" +
        s".$kernel($a);")
  }

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
      accumulate(counts, hs.getLong(i))
      i += 1
    }
    assemble(counts)
  }

  /** Token-array kernel: per-token `xxhash64` (bit-compatible with
    * Spark's expression — XXH64 over the UTF-8 bytes, seed 42) fused
    * with the bit-count accumulation.
    */
  def computeFromTokens(toks: ArrayData): Long = {
    val n = toks.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      accumulate(counts,
        XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L))
      i += 1
    }
    assemble(counts)
  }

  private def accumulate(counts: Array[Int], h: Long): Unit = {
    var j = 0
    while (j < 64) {
      if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
      j += 1
    }
  }

  private def assemble(counts: Array[Int]): Long = {
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

  /** Column API: bigint fingerprint of a token-hash or token-string array. */
  def fp(spark: SparkSession, hs: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(functionName, hs)
  }
}
