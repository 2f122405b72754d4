package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixtures for the Gopher char-weighted repetition
  * battery (q220). The DuckDB oracle checks full-corpus values at
  * sf0.01; these fixtures pin the SEMANTICS the oracle replays —
  * deterministic tie-breaking for the top n-gram, and the
  * union-of-spans character coverage that keeps dup fractions ≤ 1
  * where a count-sum would overshoot. */
class GopherSpec extends AnyFunSuite {
  import TestSpark._

  private def rowOf(text: String): Map[String, Double] = {
    import TestSpark.spark.implicits._
    val df = ops.TextAnalysis.gopherRepetitionOf(
      Seq((1L, text)).toDF("doc_id", "text"))
    val r = df.collect().head
    df.columns.zipWithIndex.drop(1).map { case (c, i) => c -> r.getDouble(i) }.toMap
  }

  test("top n-gram char fractions: counts, char mass, and lexicographic tie-break") {
    // w = [aa bb aa bb aa bb cc dd ee ff], total word chars = 20
    val m = rowOf("aa bb aa bb aa bb cc dd ee ff")
    // top 2-gram "aa bb" ×3, 4 word chars → 12/20
    assert(m("top2_char_frac") == 0.6)
    // 3-grams "aa bb aa" and "bb aa bb" both ×2 — tie must go to the
    // lexicographically smaller "aa bb aa" (6 word chars ×2 → 12/20)
    assert(m("top3_char_frac") == 0.6)
    // top 4-gram "aa bb aa bb" ×2, 8 word chars → 16/20
    assert(m("top4_char_frac") == 0.8)
  }

  test("top fraction is capped at 1 when overlapping occurrences overshoot") {
    // "a a ... a" ×12: top 2-gram "a a" ×11, 2 chars → 22/12 > 1 → cap
    val m = rowOf(Seq.fill(12)("a").mkString(" "))
    assert(m("top2_char_frac") == 1.0)
  }

  test("dup n-gram char fractions use union-of-spans coverage, not count sums") {
    // w = [a b c d e a b c d e a g h i j] (15 words, 1 char each)
    // duplicated 5-grams: "a b c d e" at {0,5} and "b c d e a" at {1,6}
    // → covered positions 0..10 = 11 chars of 15; a count-sum would
    // claim 4×5 = 20 > 15
    val m = rowOf("a b c d e a b c d e a g h i j")
    assert(m("dup5_char_frac") == 0.733333)
    // "a b c d e a" repeats at {0, 5} (the trailing 'a' extends the
    // cycle) → same 0..10 coverage; 7-word spans no longer repeat
    assert(m("dup6_char_frac") == 0.733333)
    assert(m("dup7_char_frac") == 0.0)
  }

  test("clean text scores zero everywhere it should") {
    val m = rowOf("q w e r t y u i o p")
    for (n <- 5 to 10) assert(m(s"dup${n}_char_frac") == 0.0, s"n=$n")
    // every 2-gram unique → top count 1: 2 word chars / 10 = 0.2
    assert(m("top2_char_frac") == 0.2)
  }

  test("q220 registry entry runs at sf0.001, one row per >=10-word doc") {
    val out = SparkEntry.queries("q220_gopher_repetition")(spark, Sf0001)
    val n = out.count()
    val eligible = Tables.documents(spark, Sf0001)
      .filter(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(col("text"), " ")) >= 10).count()
    assert(n == eligible && n > 0)
    // fractions are fractions
    val bad = out.columns.drop(1).map(c =>
      out.filter(col(c) < 0 || col(c) > 1).count()).sum
    assert(bad == 0, "all fractions must lie in [0, 1]")
  }
}
