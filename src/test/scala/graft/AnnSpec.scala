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

  test("semDedup drops planted duplicates, keeps the lowest id, spares the rest") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // two well-separated groups; ids 1/2/3 identical, 4 a near-dup of
    // them (cos ~0.9999 after normalization), 10/11 far apart from all
    val a = Seq(1.0, 0.0, 0.0, 0.0)
    val aEps = Seq(1.0, 0.001, 0.0, 0.0)
    val b = Seq(0.0, 1.0, 0.0, 0.0)
    val c = Seq(0.0, 0.0, 1.0, 0.0)
    val docs = Seq(
      (1L, a), (2L, a), (3L, a), (4L, aEps), (10L, b), (11L, c)
    ).toDF("vec_id", "v")
    val out = Graft.semDedup(docs, k = 2, tau = 0.999).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    assert(out.size == 6)
    assert(out(1L)._2, "lowest id of the duplicate ball survives")
    assert(!out(2L)._2 && !out(3L)._2 && !out(4L)._2, "later near-identicals dropped")
    assert(out(10L)._2 && out(11L)._2, "distinct vectors untouched")
    // duplicates necessarily share a cluster for the within-cluster scan
    assert(Seq(2L, 3L, 4L).forall(i => out(i)._1 == out(1L)._1))
    intercept[IllegalArgumentException](Graft.semDedup(docs, 0, 0.9))
    intercept[IllegalArgumentException](Graft.semDedup(docs, 2, 1.5))
  }
}
