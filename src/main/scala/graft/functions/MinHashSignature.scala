package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All `numHashes` MinHash signature slots for one document, in one pass
  * over its shingle-fingerprint array.
  *
  * Replaces the explode-by-hash-index formulation (shingles × numHashes
  * narrow rows through a two-level aggregation): correct and
  * codegen-small, but it materializes a 48× row blowup per corpus pass.
  * Here the per-document fingerprints are collected once (one shuffle of
  * the narrow index) and every slot's min is computed in a primitive
  * loop — `numHashes × shingles` fused hash+min per row, no intermediate
  * rows at all.
  *
  * Slot i's value is min over shingle fingerprints g of Spark's
  * `xxhash64(i, g)` (int, long), reproduced exactly via
  * `XXH64.hashLong(g, XXH64.hashInt(i, 42L))` — bit-identical signatures
  * to the aggregate form, so banding/candidate behavior is unchanged.
  *
  * Empty input yields an empty array (documents shorter than the shingle
  * width have no index rows and never reach this expression; defensive).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.computeSignature(
      input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinHashSignature$$.MODULE$$" +
        s".computeSignature($a, $numHashes);")

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSignature = copy(child = newChild)
}

object MinHashSignature {

  val functionName = "minhash_signature"

  /** Per-slot seeds = xxhash64's fold state after the int slot index —
    * memoized per numHashes (tiny).
    */
  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]

  private[functions] def seeds(numHashes: Int): Array[Long] =
    seedCache.computeIfAbsent(numHashes,
      k => Array.tabulate(k)(i => XXH64.hashInt(i, 42L)))

  /** Kernel shared by interpreted eval and generated code. */
  def computeSignature(gs: ArrayData, numHashes: Int): ArrayData = {
    val n = gs.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val s = seeds(numHashes)
    val out = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      var mn = Long.MaxValue
      val seed = s(i)
      var j = 0
      while (j < n) {
        val h = XXH64.hashLong(gs.getLong(j), seed)
        if (h < mn) mn = h
        j += 1
      }
      out(i) = mn
      i += 1
    }
    new GenericArrayData(out)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      functionName,
      exprs => MinHashSignature(exprs(0),
        ExprArgs.literalInt(exprs(1), s"$functionName numHashes")),
      "built-in")

  /** Column API: `array<bigint>` signature of a fingerprint array. */
  def sig(spark: SparkSession, gs: Column, numHashes: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      functionName, gs, org.apache.spark.sql.functions.lit(numHashes))
  }
}
