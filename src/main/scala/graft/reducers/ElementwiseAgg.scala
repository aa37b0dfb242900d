package graft.reducers

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** `ak.sum(arr, axis=0)` / `ak.count(arr, axis=0)` over a RAGGED list
  * column: position-wise totals across rows, where row i contributes to
  * position p iff len(row_i) > p (awkward's ragged broadcast; reference
  * `lib/reducers.py:517-548` with `core.py:2258-2366`'s
  * partial-per-partition + tree-combine plan).
  *
  * A typed `Aggregator[IN, BUF, OUT]` — Spark's partial+final aggregation
  * IS the reference's tree reduction (map-side partials per partition,
  * merge at `split_every` fan-in); the buffer is a pair of growable
  * position-indexed arrays, so a 1000-executor run ships one
  * (max_len)-sized buffer per partition, not the data.
  */
class ElementwiseSumCount
    extends Aggregator[Seq[Double], (Array[Double], Array[Long]), Seq[(Double, Long)]] {

  override def zero: (Array[Double], Array[Long]) =
    (Array.empty[Double], Array.empty[Long])

  private def grown(b: (Array[Double], Array[Long]), n: Int) =
    if (b._1.length >= n) b
    else (java.util.Arrays.copyOf(b._1, n), java.util.Arrays.copyOf(b._2, n))

  override def reduce(b0: (Array[Double], Array[Long]), xs: Seq[Double]) = {
    val b = grown(b0, xs.length)
    var i = 0
    while (i < xs.length) { b._1(i) += xs(i); b._2(i) += 1; i += 1 }
    b
  }

  override def merge(a0: (Array[Double], Array[Long]), c: (Array[Double], Array[Long])) = {
    val a = grown(a0, c._1.length)
    var i = 0
    while (i < c._1.length) { a._1(i) += c._1(i); a._2(i) += c._2(i); i += 1 }
    a
  }

  override def finish(b: (Array[Double], Array[Long])): Seq[(Double, Long)] =
    b._1.toIndexedSeq.zip(b._2.toIndexedSeq)

  override def bufferEncoder: Encoder[(Array[Double], Array[Long])] =
    ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder()
}

object ElementwiseAgg {
  /** Column function: array<double> column -> array<struct<_1: sum, _2:
    * count>> indexed by position. */
  def elementwiseSumCount(c: Column): Column =
    udaf(new ElementwiseSumCount(), ExpressionEncoder[Seq[Double]]()).apply(c)
}
