package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a typed [[Aggregator]] — the
  * engine's custom-UDAF surface (SURVEY.md §2.8; the Expression path
  * covers scalar functions, this covers custom AGGREGATION state).
  *
  * Summary semantics: at most `width` (term, weight) counters. The
  * classic guarantee holds under Spark's partial-aggregation tree for
  * ANY partitioning and merge order: every term with true frequency
  * > N/(width+1) survives to the final summary, and each surviving
  * weight underestimates the true count by at most N/(width+1).
  * [Misra & Gries 1982; mergeability per Agarwal et al., PODS'12.]
  *
  * Scale: this is the first pass of the two-pass exact heavy-hitters
  * pattern (sketch → candidates → exact recount of candidates only).
  * Per-partition state is O(width); the shuffle moves width rows per
  * partition instead of one row per distinct term — the point when the
  * term domain is billions wide. The candidate WEIGHTS are partition-
  * dependent (the guarantee is on the surviving SET, not the values),
  * which is why the recount pass exists; only recounted counts are
  * deterministic engine output.
  */
final class MisraGries(width: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]]
    with Serializable {
  require(width >= 1, "Misra-Gries width must be >= 1")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], term: String): Map[String, Long] =
    b.get(term) match {
      case Some(w) => b.updated(term, w + 1)
      case None if b.size < width => b.updated(term, 1L)
      case None =>
        // full and unseen: decrement every counter (the arriving term's
        // implicit counter hits zero immediately and is not stored)
        b.flatMap { case (t, w) => if (w > 1) Some(t -> (w - 1)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (acc, (t, w)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + w)
    }
    if (sum.size <= width) sum
    else {
      // keep the top `width` weights: subtract the (width+1)-th largest
      // weight from everything, drop the non-positive (Agarwal et al.)
      val cut = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(width)
      sum.flatMap { case (t, w) => if (w > cut) Some(t -> (w - cut)) else None }
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}

object MisraGries {
  /** Untyped-column form, usable in `df.agg(...)`. */
  def udaf(width: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new MisraGries(width), Encoders.STRING)
}
