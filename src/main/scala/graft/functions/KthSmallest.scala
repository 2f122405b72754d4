package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact k-th-smallest (key, id) pair as a typed [[Aggregator]] — the
  * sort-free per-group top-k THRESHOLD primitive (companion to
  * [[MisraGries]] on the custom-aggregation surface, SURVEY.md §2.8).
  *
  * Selecting "the K docs with the smallest hash per group" with a
  * row_number window sorts every row of every group; on a 100 TB corpus
  * with a billion-doc hot domain that is a full per-group spill sort for
  * a selection that only needs ONE cut point. This aggregate instead
  * carries a bounded buffer of the K smallest (key, id) pairs seen —
  * O(K) state per group, mergeable in any order under Spark's partial
  * aggregation — and emits the K-th smallest pair as the group's
  * threshold. Membership is then a broadcast-join + row-local pair
  * comparison against the threshold: shuffle = |groups| × K rows,
  * never a sort of the data.
  *
  * Returns the sentinel (Long.MaxValue, Long.MaxValue) when the group
  * holds fewer than K rows (no cut needed: everything is below it —
  * real keys are 60-bit md5 prefixes, strictly smaller).
  *
  * Determinism: the result is the K-th smallest element under the total
  * lexicographic (key, id) order — a pure function of the input SET,
  * independent of partitioning and merge order.
  */
final class KthSmallest(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], (Long, Long)]
    with Serializable {
  require(k >= 1, s"k must be >= 1, got $k")

  private val ord = Ordering.Tuple2[Long, Long]

  override def zero: Seq[(Long, Long)] = Vector.empty

  // sorted-ascending bounded buffer: insert only if it makes the top-k
  override def reduce(b: Seq[(Long, Long)], p: (Long, Long)): Seq[(Long, Long)] =
    if (b.length == k && ord.gteq(p, b.last)) b
    else {
      val (lo, hi) = b.span(ord.lt(_, p))
      ((lo :+ p) ++ hi).take(k)
    }

  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    // merge of two sorted runs, truncated at k
    val out = Vector.newBuilder[(Long, Long)]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.length || j < b.length)) {
      if (j >= b.length || (i < a.length && ord.lteq(a(i), b(j)))) { out += a(i); i += 1 }
      else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(b: Seq[(Long, Long)]): (Long, Long) =
    if (b.length < k) (Long.MaxValue, Long.MaxValue) else b.last

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[(Long, Long)] = ExpressionEncoder()
}

object KthSmallest {
  /** Untyped-column form: `udaf(k)(keyCol, idCol)` → struct(_1, _2). */
  def udaf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new KthSmallest(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
}
