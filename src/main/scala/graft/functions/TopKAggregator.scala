package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k accumulator: per group, keep only the k largest
  * (order, id) pairs — order descending, ties broken by ascending id,
  * the exact ordering of `ROW_NUMBER() OVER (ORDER BY ord DESC, id)`.
  *
  * This is the partial-aggregable form of W3 (top-n per group): the
  * window form ([[graft.operators.Windows.topNPerGroup]]) shuffles
  * EVERY row of every group and sorts each group fully, while this
  * aggregator's map-side combine caps the state at k pairs per group
  * per input partition — the shuffle carries at most
  * k x groups x partitions rows no matter how hot a key gets, which
  * is the difference between a skew stall and a flat profile when one
  * group holds a million rows at 100 TB (the X5 LedgerAggregator
  * pattern applied to ranking).
  *
  * The buffer is a DESC-sorted list; insert keeps it sorted and trims
  * to k (O(k) per row — k is single digits in every ranking query
  * here), merge is a sorted-list merge. A full buffer rejects rows
  * that sort below its minimum without allocating. Deterministic for
  * a deterministic input set: the result is a pure function of the
  * group's value multiset. */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {
  require(k >= 1, s"k must be >= 1, got $k")

  private def before(x: (Double, Long), y: (Double, Long)): Boolean =
    x._1 > y._1 || (x._1 == y._1 && x._2 < y._2)

  override def zero: List[(Double, Long)] = Nil

  override def reduce(b: List[(Double, Long)], a: (Double, Long)): List[(Double, Long)] =
    if (b.lengthCompare(k) >= 0 && !before(a, b.last)) b
    else {
      val (pre, post) = b.span(before(_, a))
      val merged = pre ::: a :: post
      if (merged.lengthCompare(k) > 0) merged.init else merged
    }

  override def merge(x: List[(Double, Long)], y: List[(Double, Long)]): List[(Double, Long)] = {
    @annotation.tailrec
    def go(a: List[(Double, Long)], b: List[(Double, Long)], n: Int,
        acc: List[(Double, Long)]): List[(Double, Long)] =
      if (n == 0) acc.reverse
      else (a, b) match {
        case (Nil, Nil) => acc.reverse
        case (ah :: at, _) if b.isEmpty || before(ah, b.head) => go(at, b, n - 1, ah :: acc)
        case (_, bh :: bt) => go(a, bt, n - 1, bh :: acc)
      }
    go(x, y, k, Nil)
  }

  override def finish(r: List[(Double, Long)]): Seq[(Double, Long)] = r

  // Product encoders, not Kryo: the buffer crosses the wire at every
  // map-side combine, and the columnar array<struct<double,bigint>>
  // layout is both smaller and spill-friendly.
  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
