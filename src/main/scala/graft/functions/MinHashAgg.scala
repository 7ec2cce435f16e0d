package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.expressions.Aggregator

/** MinHash signature as a typed Aggregator: state is the `numHashes`-slot
  * running minimum — O(numHashes) per group, mergeable, with map-side
  * partial aggregation.
  *
  * This is the bounded-state alternative to collect_list-then-
  * [[MinHashSignature]]: the collect form buffers one document's whole
  * fingerprint set as aggregation state (O(document) — fine while a
  * document fits a row, but it forfeits map-side combine, so every index
  * row crosses the shuffle). Here each map task pre-folds its rows into
  * 48-slot minima and the shuffle carries O(documents × numHashes) longs
  * regardless of document size — the shape that survives a boilerplate-
  * heavy 100 TB corpus with multi-megabyte outliers.
  *
  * Slot hashes are the same family as the kernel —
  * `XXH64.hashLong(g, seed_i)` with seed_i = `xxhash64(i, 42)` — and min
  * commutes, so signatures are BIT-IDENTICAL to [[MinHashSignature]]'s
  * regardless of row order or partial-aggregation split
  * (PipelineOpsSpec asserts the equality).
  */
class MinHashAgg(numHashes: Int)
    extends Aggregator[Long, Array[Long], Seq[Long]] {

  @transient private lazy val seeds: Array[Long] =
    MinHashSignature.seeds(numHashes)

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(b: Array[Long], g: Long): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      val h = XXH64.hashLong(g, seeds(i))
      if (h < b(i)) b(i) = h
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(b: Array[Long]): Seq[Long] = b.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object MinHashAgg {
  /** Column form: `minhash_agg(g)` over a grouped fingerprint column. */
  def sig(numHashes: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(
      new MinHashAgg(numHashes), Encoders.scalaLong)
      .apply(org.apache.spark.sql.functions.col("g"))
}
