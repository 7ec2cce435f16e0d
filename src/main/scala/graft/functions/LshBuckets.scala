package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** All random-hyperplane LSH bucket ids for one embedding, in one pass.
  *
  * Replaces the previous formulation (posexplode the embedding, then
  * `tables * bits` separate sum-aggregate columns) whose generated
  * aggregate class was the same Janino cold-compile trap measured for
  * MinHash (~15 s at 64 columns; 27.8 s observed for ANN at 96). This
  * expression computes every projection in a single primitive loop per
  * row — no explode, no shuffle, no wide codegen — which is also the
  * right 100 TB shape: bucketing becomes a pure scan-side map with a
  * `tables`-element output instead of an `O(dims × planes)` row blowup
  * feeding an exchange.
  *
  * Hyperplane (p = t*bits + j)'s component for dimension kk is ±1 from
  * the parity of Spark's `xxhash64(p, kk)` (both int-typed), reproduced
  * exactly via `XXH64.hashInt(kk, XXH64.hashInt(p, 42L))` — the same
  * deterministic, model-free family the aggregate form used. The ±1
  * matrix is memoized per (planes, dims) in a JVM-wide cache, so per-row
  * work is `dims × planes` fused multiply-adds.
  *
  * Output: `array<int>` of length `tables`; element t is the bucket id
  * `Σ_j [proj(t*bits+j) > 0] << j`.
  */
case class LshBuckets(child: Expression, tables: Int, bits: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    LshBuckets.computeBuckets(input.asInstanceOf[ArrayData], tables, bits)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.LshBuckets$$.MODULE$$" +
        s".computeBuckets($a, $tables, $bits);")

  override protected def withNewChildInternal(
      newChild: Expression): LshBuckets = copy(child = newChild)
}

/** Boolean probe: does this embedding share its LSH bucket with the
  * (driver-computed) query buckets in ANY hash table? One kernel pass
  * with per-table early exit — built for
  * [[graft.plans.RewriteAnnTopK]]'s injected filter, where an
  * Or-chain of `GetArrayItem(LshBuckets(emb), t) = qb(t)` comparisons
  * would re-evaluate the full `tables × bits × dims` projection kernel
  * once per branch (Filter predicates get no subexpression
  * elimination), making the pruning filter costlier than the exact
  * scan it replaces. Here a non-colliding row pays at most the same
  * single kernel pass as bucketing itself, and a colliding row exits at
  * its first matching table.
  *
  * `queryBuckets.length` defines the table count. The Array param loses
  * case-class `semanticEquals` (reference equality) — harmless, it only
  * forfeits subexpression reuse the filter doesn't need.
  */
case class LshBucketMatch(child: Expression, queryBuckets: Array[Int],
    bits: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${other.catalogString}")
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.BooleanType

  override def nullSafeEval(input: Any): Any =
    LshBuckets.matchesAny(
      input.asInstanceOf[ArrayData], queryBuckets, bits)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qb = ctx.addReferenceObj("queryBuckets", queryBuckets, "int[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.LshBuckets$$.MODULE$$" +
        s".matchesAny($a, $qb, $bits);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): LshBucketMatch = copy(child = newChild)
}

object LshBuckets {

  val functionName = "lsh_buckets"

  /** ±1 hyperplane components, memoized per (planes, dims). A few KB per
    * shape; one shape per workload in practice.
    */
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Array[Float]]]

  private def signMatrix(planes: Int, dims: Int): Array[Array[Float]] =
    signCache.computeIfAbsent((planes.toLong << 32) | dims, _ => {
      Array.tabulate(planes, dims) { (p, kk) =>
        if ((XXH64.hashInt(kk, XXH64.hashInt(p, 42L)) & 1L) == 1L) 1.0f
        else -1.0f
      }
    })

  /** Table t's bucket id — the ONE copy of the projection/bit-assembly
    * loop; both kernels below call it so the probe can never drift from
    * the assignment.
    */
  private def bucketFor(
      arr: ArrayData, signs: Array[Array[Float]], t: Int, bits: Int): Int = {
    val dims = arr.numElements()
    var bucket = 0
    var j = 0
    while (j < bits) {
      val s = signs(t * bits + j)
      var proj = 0.0d
      var kk = 0
      while (kk < dims) {
        proj += arr.getFloat(kk).toDouble * s(kk)
        kk += 1
      }
      if (proj > 0.0d) bucket |= 1 << j
      j += 1
    }
    bucket
  }

  /** Kernel shared by interpreted eval and generated code. */
  def computeBuckets(arr: ArrayData, tables: Int, bits: Int): ArrayData = {
    val signs = signMatrix(tables * bits, arr.numElements())
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      out(t) = bucketFor(arr, signs, t, bits)
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Early-exit probe kernel shared by [[LshBucketMatch]]'s interpreted
    * eval and generated code: computes table t's bucket and compares
    * before moving to table t+1.
    */
  def matchesAny(arr: ArrayData, qb: Array[Int], bits: Int): Boolean = {
    val tables = qb.length
    val signs = signMatrix(tables * bits, arr.numElements())
    var t = 0
    while (t < tables) {
      if (bucketFor(arr, signs, t, bits) == qb(t)) return true
      t += 1
    }
    false
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      functionName,
      exprs => LshBuckets(exprs(0),
        ExprArgs.literalInt(exprs(1), s"$functionName tables"),
        ExprArgs.literalInt(exprs(2), s"$functionName bits")),
      "built-in")

  /** Column API: `array<int>` of per-table bucket ids. */
  def buckets(
      spark: SparkSession, emb: Column, tables: Int, bits: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      functionName, emb,
      org.apache.spark.sql.functions.lit(tables),
      org.apache.spark.sql.functions.lit(bits))
  }
}
