package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` (SURVEY §2.11 policy: Aggregator for custom typed
  * aggregation) building a k-minimum-values sketch of a group's 64-bit
  * hash stream.
  *
  * The sketch (the k smallest distinct hashes) supports set-similarity
  * estimation between groups: for two sketches A and B with union-sketch
  * X = k smallest of A∪B, the estimator |X ∩ A ∩ B| / |X| is the
  * classic bottom-k Jaccard estimate — one fixed-size value per group
  * regardless of group size, mergeable across partitions, so
  * corpus-level pairwise similarity costs O(groups² · k) instead of
  * touching the raw data again. Used for source-vs-source content
  * overlap on the documents table.
  */
class KMinSketch(k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  require(k > 0)

  override def zero: Array[Long] = Array.empty

  /** Keep the k smallest distinct values; buffer stays sorted. */
  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) buf // duplicate
    else if (buf.length < k) {
      val ins = -pos - 1
      val out = new Array[Long](buf.length + 1)
      System.arraycopy(buf, 0, out, 0, ins)
      out(ins) = h
      System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
      out
    } else if (h < buf(buf.length - 1)) {
      val ins = -pos - 1
      val out = new Array[Long](k)
      System.arraycopy(buf, 0, out, 0, ins)
      out(ins) = h
      System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
      out
    } else buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    b.foldLeft(a)(reduce)

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object KMinSketch {

  /** Bottom-k Jaccard estimate between two sketches built with the same
    * k and hash function.
    */
  def estimateJaccard(a: Array[Long], b: Array[Long], k: Int): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    val union = (a ++ b).distinct.sorted.take(k)
    val sa = a.toSet
    val sb = b.toSet
    val both = union.count(h => sa.contains(h) && sb.contains(h))
    both.toDouble / union.length
  }
}
