package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Per-key top-k as a typed Aggregator with a BOUNDED buffer.
  *
  * Spark 4's `WindowGroupLimit` already makes the window formulation
  * (`row_number() … rk <= k`) shuffle-bounded — a map-side limit runs
  * before the exchange. What it cannot remove is the SORT: each map
  * partition fully sorts its rows before the limit, and the reduce side
  * sorts again. This aggregator replaces both sorts with an O(rows × k)
  * insertion into a k-slot buffer per group (k is small by definition)
  * inside hash aggregation — no Sort operator anywhere in the plan, and
  * the same O(groups × k × partitions) exchange volume. Measured at
  * sf0.1: 0.49 s vs the window form's 0.66 s median.
  *
  * Ordering is value DESC with ascending tie-break on `tie` (a unique
  * row key makes the result deterministic — same contract as the window
  * form; RelationalSpec asserts the two forms are equal).
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  require(k > 0, "k must be positive")

  /** (a) ranks before (b): higher value first, then smaller tie. */
  private def before(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(
      buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] = {
    if (buf.size >= k && before(buf.last, in)) buf
    else {
      val i = buf.indexWhere(before(in, _))
      val at = if (i < 0) buf.size else i
      (buf.take(at) :+ in) ++ buf.drop(at) take k
    }
  }

  override def merge(
      a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.foldLeft(a)(reduce)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKAgg {
  /** `top_k((value, tie))` — array<struct<_1: value, _2: tie>> ranked
    * best-first; posexplode downstream yields (rank-1, row).
    */
  def topK(k: Int, value: Column, tie: Column): Column =
    udaf(new TopKAgg(k),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
      .apply(value, tie)
}
