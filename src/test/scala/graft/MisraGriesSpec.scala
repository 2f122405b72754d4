package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MisraGries

/** Contract tests for the Misra-Gries heavy-hitters Aggregator: the
  * capture guarantee and weight-error bound on streams that FORCE
  * decrements and merges (the registry fixture's 31-word vocabulary
  * never fills the sketch), plus partitioning-independence of the
  * two-pass exact top-k.
  */
class MisraGriesSpec extends AnyFunSuite {
  import TestSpark._

  /** width 7 over a domain of 100: every reduce past the 7th distinct
    * term decrements, every partition merge truncates. */
  private val Width = 7

  // Skewed synthetic stream: 3 planted heavy terms + uniform noise.
  // N = 600 + 700 + 900 + 2000 = 4200; bound N/(width+1) = 525.
  // All three heavies exceed the bound, so MG must capture them under
  // any partitioning — which is precisely the validity condition for
  // exact top-3 via sketch-then-recount. Each noise term (20) can never
  // be reported above the error bound.
  private def stream: Seq[String] =
    Seq.fill(600)("heavy1") ++ Seq.fill(700)("heavy2") ++ Seq.fill(900)("heavy3") ++
      (0 until 100).flatMap(i => Seq.fill(20)(s"noise$i"))

  private def sketchOf(data: Seq[String], parts: Int): Map[String, Long] = {
    import spark.implicits._
    data.toDF("term").repartition(parts)
      .agg(MisraGries.udaf(Width)($"term").as("mg"))
      .head.getMap[String, Long](0).toMap
  }

  test("capture guarantee holds under any partitioning; weights under-count by <= N/(w+1)") {
    val n = stream.size.toLong
    val bound = n / (Width + 1)
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 3, 32)) {
      val mg = sketchOf(scala.util.Random.shuffle(stream), parts)
      assert(mg.size <= Width, s"parts=$parts: summary wider than $Width")
      exact.foreach { case (t, c) =>
        if (c > bound) assert(mg.contains(t), s"parts=$parts: $t (count $c > $bound) evicted")
      }
      mg.foreach { case (t, w) =>
        assert(w <= exact(t), s"parts=$parts: $t over-counted")
        assert(exact(t) - w <= bound, s"parts=$parts: $t under-counted past the bound")
      }
    }
  }

  test("two-pass exact top-k is partitioning-independent and equals the full GROUP BY") {
    import spark.implicits._
    val exactTop = stream.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(3)
    for (parts <- Seq(2, 17)) {
      val got = ops.HeavyHitters
        .topTerms(stream.toDF("term").repartition(parts), k = 3, width = Width)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == exactTop, s"parts=$parts")
    }
  }

  test("merge truncation keeps the summary within width and never invents terms") {
    val agg = new MisraGries(Width)
    val a = Map("a" -> 10L, "b" -> 8L, "c" -> 6L, "d" -> 4L)
    val b = Map("e" -> 9L, "f" -> 7L, "g" -> 5L, "h" -> 3L)
    val m = agg.merge(a, b)
    assert(m.size <= Width)
    assert(m.keySet.subsetOf(a.keySet ++ b.keySet))
    // the cut subtracts the (width+1)-th weight (3) from everything
    assert(m("a") == 7L && !m.contains("h"))
  }
}
