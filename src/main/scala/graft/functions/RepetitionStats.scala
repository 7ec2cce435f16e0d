package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Per-document repetition counters over a token array, in one pass —
  * the Gopher/C4-style repetition quality signals (duplicate-token,
  * duplicate-bigram, and top-bigram mass) used to filter LLM training
  * corpora.
  *
  * Repetition is a PER-DOCUMENT property, so the scale-correct shape is
  * a per-row kernel, not the explode → groupBy(doc_id, gram) → re-join
  * formulation: that version shuffles every n-gram occurrence of the
  * corpus (at 100 TB, an exchange orders of magnitude larger than the
  * input) to compute counts that never leave their row. This expression
  * is a pure scan-side map with zero shuffle — the same shape argument
  * as [[SimHashFingerprint]].
  *
  * Tokens and bigrams are counted via 64-bit XXH64 fingerprints
  * (Spark's `xxhash64` family, seed 42) in open-address tables, so a
  * hash collision could in principle merge two distinct grams; at 2⁻⁶⁴
  * per pair this is deterministic-per-fixture noise, the same trade
  * documented for [[graft.operators.Dedup]]'s shingle index. The DuckDB
  * oracle counts the gram STRINGS — agreement is asserted by the driver
  * hash check.
  *
  * Output `array<long>` of length 6:
  * {{{
  *   [0] n_tokens
  *   [1] n_distinct_tokens
  *   [2] n_bigrams            (= max(n_tokens − 1, 0))
  *   [3] dup_bigram_positions (bigram occurrences whose bigram count > 1)
  *   [4] top_bigram_count     (occurrences of the most frequent bigram;
  *                             0 when the document has no bigram)
  *   [5] top_bigram_ppm       (⌊10⁶·top/n_bigrams⌋; 0 when the document
  *                             has no bigram — no repetition evidence)
  * }}}
  * Ratio assembly (and 4-dp rounding for oracle parity) stays in plain
  * Column arithmetic on the exact integers [0]..[4]; [5] exists so a
  * repetition GATE can be one single kernel reference (predicate
  * pushdown inlines a projected alias into the pushed filter, so every
  * extra reference in a gate becomes a whole extra kernel evaluation
  * per row — see [[graft.streaming.DocStreams.prepare]]).
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.RepetitionStats$$.MODULE$$" +
        s".compute($a);")

  override protected def withNewChildInternal(
      newChild: Expression): RepetitionStats = copy(child = newChild)
}

object RepetitionStats {

  val functionName = "repetition_stats"

  /** Kernel shared by interpreted eval and generated code. Two counting
    * passes over primitive-long hash tables sized to the document (open
    * addressing, power-of-two capacity ≥ 2n — no boxing, no rehash).
    */
  def compute(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val out = new Array[Long](6)
    out(0) = n.toLong
    if (n == 0) return new GenericArrayData(out)

    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      hashes(i) =
        XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
      i += 1
    }

    out(1) = countTable(hashes, n)._1

    if (n >= 2) {
      val bg = new Array[Long](n - 1)
      i = 0
      while (i < n - 1) {
        bg(i) = XXH64.hashLong(hashes(i + 1), hashes(i))
        i += 1
      }
      out(2) = (n - 1).toLong
      val (_, dup, top) = countTable(bg, n - 1)
      out(3) = dup
      out(4) = top
      out(5) = top * 1000000L / (n - 1)
    }
    new GenericArrayData(out)
  }

  /** Counts `m` hashed grams; returns (distinct, duplicated-position
    * count, max count). Open-addressed on the hash itself; 0 is a legal
    * hash value so occupancy is tracked in a parallel flag array.
    */
  private def countTable(hs: Array[Long], m: Int): (Long, Long, Long) = {
    var cap = 4
    while (cap < m * 2) cap <<= 1
    val mask = cap - 1
    val keys = new Array[Long](cap)
    val counts = new Array[Int](cap)
    var distinct = 0L
    var i = 0
    while (i < m) {
      val h = hs(i)
      var slot = (h ^ (h >>> 32)).toInt & mask
      while (counts(slot) != 0 && keys(slot) != h) slot = (slot + 1) & mask
      if (counts(slot) == 0) { keys(slot) = h; distinct += 1 }
      counts(slot) += 1
      i += 1
    }
    var dup = 0L
    var top = 0L
    var s = 0
    while (s < cap) {
      val c = counts(s)
      if (c > 1) dup += c
      if (c > top) top = c
      s += 1
    }
    (distinct, dup, top)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      functionName,
      exprs => RepetitionStats(exprs(0)),
      "built-in")

  /** Column API: the 6-element counter array (see class doc). */
  def stats(spark: SparkSession, toks: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(functionName, toks)
  }
}
