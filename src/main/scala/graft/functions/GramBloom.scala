package graft.functions

import org.apache.spark.sql.{Column, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Bloom filter over 64-bit gram fingerprints — the membership gate for
  * benchmark sets too large to broadcast exactly. Classic double
  * hashing (Kirsch–Mitzenmatcher): bit index i is
  * `(h1 + i·h2) mod m` with h1/h2 two independent XXH64 draws of the
  * key, so build and probe agree bit-for-bit everywhere with no RNG.
  *
  * Two halves, each in the repo's standard shape:
  *   - [[BloomAgg]] — typed Aggregator building the bit array
  *     distributedly: O(numBits/64) mergeable state (bitwise OR),
  *     map-side combine, ONE array row out — the benchmark stream is
  *     never collected.
  *   - [[BloomContainsAny]] — codegen'd per-row kernel: does ANY
  *     fingerprint in this row's gram array hit the filter? Early-exits
  *     on the first hit; a clean row pays numHashes probes per gram and
  *     the filter rides the plan as one reference object.
  *
  * No false negatives ever, so `bloom-gate → exact verify` pipelines
  * return EXACTLY the exact pipeline's output — the gate only sheds the
  * rows the verify join would have dropped anyway.
  */
object GramBloom {

  private val SeedA = 0x9e3779b97f4a7c15L
  private val SeedB = 0xc2b2ae3d27d4eb4fL

  private def h1(key: Long): Long = XXH64.hashLong(key, SeedA)
  private def h2(key: Long): Long = XXH64.hashLong(key, SeedB) | 1L

  /** Set this key's bits in `bits` (m = bits.length * 64). */
  def add(bits: Array[Long], numHashes: Int, key: Long): Unit = {
    val m = bits.length.toLong * 64
    val a = h1(key); val b = h2(key)
    var i = 0
    while (i < numHashes) {
      val idx = java.lang.Long.remainderUnsigned(a + i * b, m)
      bits((idx >>> 6).toInt) |= 1L << (idx & 63)
      i += 1
    }
  }

  def contains(bits: Array[Long], numHashes: Int, key: Long): Boolean = {
    val m = bits.length.toLong * 64
    val a = h1(key); val b = h2(key)
    var i = 0
    while (i < numHashes) {
      val idx = java.lang.Long.remainderUnsigned(a + i * b, m)
      if ((bits((idx >>> 6).toInt) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Kernel body for [[BloomContainsAny]]. */
  def containsAny(
      grams: ArrayData, bits: Array[Long], numHashes: Int): Boolean = {
    val n = grams.numElements()
    var i = 0
    while (i < n) {
      if (contains(bits, numHashes, grams.getLong(i))) return true
      i += 1
    }
    false
  }

  private val regCounter = new java.util.concurrent.atomic.AtomicInteger()

  /** Column wrapper: `grams` is `array<long>` of fingerprints. The bit
    * array can't travel as a SQL literal (it's an opaque MB-scale
    * buffer), so each filter registers a uniquely-named temp function
    * whose builder closes over it — one registry entry per built filter,
    * same session-scoped lifetime as the filter itself.
    */
  def mightContainAny(
      s: SparkSession, grams: Column, bits: Array[Long],
      numHashes: Int): Column = {
    val fn = s"graft_bloom_contains_${regCounter.incrementAndGet()}"
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      fn, exprs => BloomContainsAny(exprs(0), bits, numHashes), "built-in")
    org.apache.spark.sql.functions.call_function(fn, grams)
  }

  /** The distributed build as a typed aggregate column (typed so
    * `Dataset[Long].select` dispatches to the typed overload).
    */
  def agg(numBits: Int, numHashes: Int)
      : org.apache.spark.sql.TypedColumn[Long, Array[Long]] =
    new BloomAgg(numBits, numHashes).toColumn.name("bloom")
}

/** Distributed bloom build: reduce sets bits in place, merge ORs two
  * buffers — O(numBits/64) state regardless of key count, the same
  * mergeable-Aggregator policy as [[MinHashAgg]]/[[KMinSketch]].
  */
class BloomAgg(numBits: Int, numHashes: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  require(numBits >= 64 && (numBits & 63) == 0,
    s"numBits $numBits must be a positive multiple of 64")
  require(numHashes > 0)

  override def zero: Array[Long] = new Array[Long](numBits / 64)

  override def reduce(buf: Array[Long], key: Long): Array[Long] = {
    GramBloom.add(buf, numHashes, key)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** Does any element of this row's `array<long>` hit the filter?
  * The bit array rides the plan as a codegen reference object (same
  * pattern as [[LshBucketMatch]]'s query buckets); per-row cost is
  * grams × numHashes probes worst case, with first-hit early exit.
  */
case class BloomContainsAny(
    child: Expression, bits: Array[Long], numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = BooleanType

  override def nullSafeEval(input: Any): Any =
    GramBloom.containsAny(
      input.asInstanceOf[ArrayData], bits, numHashes)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("bloomBits", bits, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.GramBloom$$.MODULE$$" +
        s".containsAny($a, $b, $numHashes);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomContainsAny = copy(child = newChild)
}
