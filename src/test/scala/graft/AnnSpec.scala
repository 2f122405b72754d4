package graft

import org.scalatest.funsuite.AnyFunSuite

/** ANN-variant quality tests: the approximate paths (hyperplane-LSH
  * buckets, IVF probes) are judged against the exact brute-force top-k —
  * structure exactly, recall as a floor (approximation is the point;
  * zero overlap would mean a broken index, not an approximation). */
class AnnSpec extends AnyFunSuite {
  import TestSpark._

  private def topk(name: String): Map[Long, Seq[Long]] =
    SparkEntry.queries(name)(spark, Sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      .groupBy(_._1).map { case (q, rows) =>
        q -> rows.sortBy(_._3).map(_._2).toSeq
      }

  private lazy val exact = topk("q27_ann_topk")

  test("IVF probe returns well-formed per-query rankings") {
    val ivf = topk("q60_ann_ivf")
    assert(ivf.nonEmpty)
    ivf.values.foreach(ns => assert(ns.length <= 5 && ns.distinct.length == ns.length))
  }

  test("IVF recall@5 beats the random-candidate baseline") {
    val ivf = topk("q60_ann_ivf")
    val hits = exact.keys.toSeq.map { q =>
      ivf.getOrElse(q, Nil).toSet.intersect(exact(q).toSet).size
    }.sum
    val possible = exact.values.map(_.size).sum
    val recall = hits.toDouble / possible
    // probing 2/16 lists of a random candidate pool would land ~12.5%
    // of true neighbors by chance; a working coarse quantizer must beat
    // that clearly
    assert(recall >= 0.25, s"recall@5 = $recall")
  }

  test("IVF is deterministic for the fixed seed") {
    assert(topk("q60_ann_ivf") == topk("q60_ann_ivf"))
  }
}
