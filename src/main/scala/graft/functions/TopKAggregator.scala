package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-state top-k per group: a typed Aggregator maintaining at most
  * k (score, id) pairs per group per partition, merged pairwise — the
  * scale form of "top-k per group".
  *
  * The window formulation (`row_number() over (partition by g order by
  * s)`) shuffles and SORTS every row of every group; this aggregator's
  * partial state is k pairs regardless of group size, combines map-side,
  * and the shuffle carries k·|groups| rows instead of the whole input —
  * the difference between sorting 100 TB and merging kilobyte heaps.
  *
  * Ordering: score DESC, id ASC tiebreak — total and deterministic, so
  * output is reproducible and oracle-checkable. The buffer is a sorted
  * List (k is small; insertion beats heap constant-factors at k ≤ ~100).
  */
case class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, "k must be positive")

  /** "better than", TOTAL over all doubles: java.lang.Double.compare
    * gives NaN and ±0.0 a defined order (NaN ranks highest, i.e. first) —
    * a bare `>` is not total under NaN (both a>b and b>a false), which
    * would silently break the sorted-buffer invariant and make results
    * partitioning-dependent. */
  private def lt(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  override def zero: List[(Double, Long)] = Nil

  override def reduce(buf: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] =
    insert(buf, x)

  private def insert(buf: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] = {
    if (buf.lengthCompare(k) >= 0 && !lt(x, buf.last)) buf
    else {
      val (better, worse) = buf.span(lt(_, x))
      (better ::: x :: worse).take(k)
    }
  }

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    b.foldLeft(a)(insert)

  override def finish(r: List[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    ExpressionEncoder[List[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
