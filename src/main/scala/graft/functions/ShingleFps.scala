package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** DISTINCT word n-gram fingerprints of a token array, in one codegen'd
  * pass: `array<string>` tokens → `array<long>` of
  * `xxhash64("tok_i tok_i+1 … tok_i+n-1")`, first-occurrence order.
  *
  * Bit-compatible BY CONSTRUCTION with the composed form
  * `array_distinct(transform(shinglesFromTokens(toks, n), g ->
  * xxhash64(g)))`: each shingle's UTF-8 bytes are assembled with single
  * space joiners exactly as `concat_ws(" ", …)` produces them and
  * hashed with Spark's XXH64/seed-42 — PipelineOpsSpec asserts set
  * equality against the HOF definition.
  *
  * Why it exists: the HOF chain evaluates its lambdas interpreted —
  * measured 5.6× slower than the exploded codegen path on the 50k-doc
  * probe — and building per-row ARRAYS of fingerprints (for scan-side
  * kernels like [[BloomContainsAny]]) forces that chain. This kernel
  * keeps array-producing consumers (bloom gates) AND the exploding
  * shingle index inside whole-stage codegen: one primitive loop per
  * row, one byte-buffer per shingle, a longs-only hash set for the
  * distinct.
  */
case class ShingleFps(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, s"shingle width $n must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleFps.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ShingleFps$$.MODULE$$" +
        s".compute($a, $n);")

  override protected def withNewChildInternal(
      newChild: Expression): ShingleFps = copy(child = newChild)
}

object ShingleFps {

  val functionName = "shingle_fps"

  /** Kernel shared by interpreted eval and generated code. */
  def compute(toks: ArrayData, n: Int): ArrayData = {
    val cnt = toks.numElements()
    if (cnt < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](cnt - n + 1)
    val seen = new java.util.HashSet[java.lang.Long](
      math.min(cnt, 1024))
    var kept = 0
    var i = 0
    while (i <= cnt - n) {
      var len = n - 1 // the space joiners
      var k = 0
      while (k < n) {
        len += toks.getUTF8String(i + k).numBytes()
        k += 1
      }
      val buf = new Array[Byte](len)
      var off = 0
      k = 0
      while (k < n) {
        val t = toks.getUTF8String(i + k)
        t.writeToMemory(buf,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off)
        off += t.numBytes()
        if (k < n - 1) { buf(off) = ' '; off += 1 }
        k += 1
      }
      val h = XXH64.hashUnsafeBytes(buf,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, 42L)
      if (seen.add(h)) { out(kept) = h; kept += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, kept))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      functionName,
      exprs => ShingleFps(exprs(0),
        ExprArgs.literalInt(exprs(1), s"$functionName n")),
      "built-in")

  /** Column API: distinct n-gram fingerprints of a materialized token
    * array (see [[TextFunctions.shinglesFromTokens]]'s contract — pass
    * a real attribute, not the tokens() expression, or the tokenizer
    * re-runs per access).
    */
  def fps(spark: SparkSession, toks: Column, n: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      functionName, toks, org.apache.spark.sql.functions.lit(n))
  }
}
