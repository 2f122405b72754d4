package graft

import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture semantics for contamination span splitting (q222):
  * window bounds, piece boundaries at removals, the minWords floor, and
  * total-contamination emptiness. The DuckDB oracle re-checks all of it
  * at sf0.01 over the % 20 convention; these fixtures make each failure
  * mode individually attributable. */
class DecontamSpansSpec extends AnyFunSuite {
  import TestSpark._

  private def run(corpus: Seq[(Long, String)], eval: Seq[(Long, String)],
                  pad: Int = 2, minWords: Int = 3): Map[(Long, Long), (Long, String)] = {
    import TestSpark.spark.implicits._
    ops.Decontam.decontamSpans(
      corpus.toDF("doc_id", "text"), eval.toDF("doc_id", "text"), pad, minWords)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getString(3))))
      .toMap
  }

  test("a collision removes ±pad words around the 5-gram and splits the doc") {
    val evalDoc = Seq(100L -> "e1 e2 e3 e4 e5")
    // collision at word 6; pad=2 → words 4..12 removed
    val corpus = Seq(1L ->
      "p1 p2 p3 p4 p5 p6 e1 e2 e3 e4 e5 s1 s2 s3 s4 s5 s6")
    val out = run(corpus, evalDoc)
    assert(out == Map(
      (1L, 1L) -> ((4L, "p1 p2 p3 p4")),
      (1L, 2L) -> ((4L, "s3 s4 s5 s6"))))
  }

  test("pieces below minWords are dropped; piece ids stay dense over survivors") {
    val evalDoc = Seq(100L -> "e1 e2 e3 e4 e5")
    // left fragment has 2 words (< 3) → dropped; right fragment survives
    // and must be piece 1, not 2
    val corpus = Seq(2L -> "p1 p2 e1 e2 e3 e4 e5 s1 s2 s3 s4 s5 s6 s7")
    val out = run(corpus, evalDoc)
    assert(out == Map((2L, 1L) -> ((5L, "s3 s4 s5 s6 s7"))))
  }

  test("a fully contaminated doc emits nothing; a clean doc is its own single piece") {
    val evalDoc = Seq(100L -> "e1 e2 e3 e4 e5")
    val corpus = Seq(
      3L -> "e1 e2 e3 e4 e5 x",          // window covers everything
      4L -> "c1 c2 c3 c4 c5 c6")         // no collision
    val out = run(corpus, evalDoc)
    assert(out == Map((4L, 1L) -> ((6L, "c1 c2 c3 c4 c5 c6"))))
  }

  test("corpus words containing control characters are data, not piece boundaries") {
    // ADVICE r11: an earlier revision split pieces on a chr(1) sentinel,
    // so a corpus word containing U+0001 was silently cut even with zero
    // collisions. The run-slicing cut must keep such a word intact — in
    // a clean doc AND in a surviving piece of a contaminated one.
    val evalDoc = Seq(100L -> "e1 e2 e3 e4 e5")
    val weird = "x\u0001y" // one word containing the old sentinel char
    val clean = Seq(6L -> s"c1 $weird c3 c4")
    assert(run(clean, evalDoc) == Map((6L, 1L) -> ((4L, s"c1 $weird c3 c4"))))
    // collision at word 5 (e1), pad=2 → words 3..11 covered; the
    // surviving left piece carries the control-char word verbatim
    val dirty = Seq(7L -> s"$weird p2 p3 p4 p5 e1 e2 e3 e4 e5 s1 s2 s3")
    assert(run(dirty, evalDoc) == Map((7L, 1L) -> ((3L, s"$weird p2 p3"))))
  }

  test("adjacent collisions merge into one removal; distant ones split twice") {
    val evalDoc = Seq(100L -> "e1 e2 e3 e4 e5 f1 f2 f3 f4 f5")
    // eval doc contributes 5-grams sliding across e*..f*; corpus doc
    // contains e-run and f-run far apart → two removals, three pieces
    val corpus = Seq(5L ->
      ("a1 a2 a3 a4 e1 e2 e3 e4 e5 b1 b2 b3 b4 b5 b6 b7 b8 " +
        "f1 f2 f3 f4 f5 c1 c2 c3 c4 c5"))
    val out = run(corpus, evalDoc, pad = 1, minWords = 3)
    // e-run: gram at 4 → remove 3..9; f-run: gram at 17 → remove 16..22
    assert(out == Map(
      (5L, 1L) -> ((3L, "a1 a2 a3")),
      (5L, 2L) -> ((6L, "b2 b3 b4 b5 b6 b7")),
      (5L, 3L) -> ((4L, "c2 c3 c4 c5"))))
  }
}
