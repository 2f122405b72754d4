package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.KthSmallest

/** Unit contract of the bounded k-th-smallest aggregator, independent of
  * any query: reduce/merge against a sorted reference on random-ish
  * (deterministic) inputs, merge associativity across arbitrary splits,
  * the under-k sentinel, and the bounded-buffer invariant. */
class KthSmallestSpec extends AnyFunSuite {

  private def ref(xs: Seq[(Long, Long)], k: Int): (Long, Long) =
    if (xs.size < k) (Long.MaxValue, Long.MaxValue) else xs.sorted.apply(k - 1)

  // deterministic pseudo-random pairs (no Random: reproducible)
  private val pairs: Seq[(Long, Long)] =
    (1 to 200).map(i => ((i * 2654435761L) % 997, i.toLong))

  test("reduce-only fold equals the sorted reference for several k") {
    for (k <- Seq(1, 3, 17, 199, 200)) {
      val agg = new KthSmallest(k)
      val buf = pairs.foldLeft(agg.zero)(agg.reduce)
      assert(buf.length == math.min(k, pairs.length), "buffer stays bounded at k")
      assert(agg.finish(buf) == ref(pairs, k))
    }
  }

  test("merge of arbitrary splits equals the global answer (partial-agg soundness)") {
    val k = 13
    val agg = new KthSmallest(k)
    for (splits <- Seq(Seq(50, 100, 150), Seq(1, 199), Seq(200), Seq(7, 8, 9, 176))) {
      val bounds = (0 +: splits.scanLeft(0)(_ + _).tail).distinct :+ pairs.length
      val parts = bounds.zip(bounds.tail).map { case (a, b) => pairs.slice(a, b) }
      val merged = parts.map(_.foldLeft(agg.zero)(agg.reduce)).reduce(agg.merge)
      assert(agg.finish(merged) == ref(pairs, k))
      // merge order independence: reversed part order, same answer
      val mergedRev = parts.reverse.map(_.foldLeft(agg.zero)(agg.reduce)).reduce(agg.merge)
      assert(agg.finish(mergedRev) == ref(pairs, k))
    }
  }

  test("under-k group emits the MaxValue sentinel (everything passes the cut)") {
    val agg = new KthSmallest(5)
    val buf = pairs.take(4).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf) == ((Long.MaxValue, Long.MaxValue)))
    assert(agg.finish(agg.zero) == ((Long.MaxValue, Long.MaxValue)), "empty group too")
  }

  test("ties on the key are broken by id (total lexicographic order)") {
    val agg = new KthSmallest(2)
    val tied = Seq((7L, 30L), (7L, 10L), (7L, 20L))
    val buf = tied.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf) == ((7L, 20L)))
  }

  test("k must be positive") {
    intercept[IllegalArgumentException](new KthSmallest(0))
  }
}
