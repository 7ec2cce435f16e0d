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

/** 32-bit md5 SimHash — the ENGINE-NEUTRAL fingerprint kernel (DuckDB
  * computes identical md5 hex, so this variant is oracle-expressible;
  * see Dedup.qDedupSimhashMd5Sql). Bit p of the fingerprint weights the
  * p-th bit of the first 4 digest bytes packed big-endian — exactly the
  * nibble-order convention the SQL twin derives from the first 8 hex
  * chars. Same per-row zero-shuffle shape as [[SimHashFingerprint]];
  * kept separate because md5 costs ~4× an XXH64 and 32 bits
  * discriminate less — production stays on the 64-bit kernel.
  */
case class SimHashMd5Fingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHashMd5Fingerprint.computeFromTokens(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimHashMd5Fingerprint$$.MODULE$$" +
        s".computeFromTokens($a);")

  override protected def withNewChildInternal(
      newChild: Expression): SimHashMd5Fingerprint = copy(child = newChild)
}

object SimHashMd5Fingerprint {

  val functionName = "simhash_md5_fingerprint"

  // one digest per executor thread — getInstance per token would
  // dominate the kernel
  private val digest =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  def computeFromTokens(toks: ArrayData): Long = {
    val md = digest.get()
    val n = toks.numElements()
    val counts = new Array[Int](32)
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(toks.getUTF8String(i).getBytes)
      // first 4 digest bytes, big-endian = first 8 hex chars MSB-first
      val h = ((d(0) & 0xff) << 24) | ((d(1) & 0xff) << 16) |
        ((d(2) & 0xff) << 8) | (d(3) & 0xff)
      var j = 0
      while (j < 32) {
        if (((h >>> j) & 1) == 1) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 32) {
      if (counts(j) > 0) fp |= 1L << j
      j += 1
    }
    fp
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      functionName,
      exprs => SimHashMd5Fingerprint(exprs(0)),
      "built-in")

  /** Column API: bigint md5-simhash of a token-string array. */
  def fp(spark: SparkSession, toks: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(functionName, toks)
  }
}
