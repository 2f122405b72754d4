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

  // ------------------------------------------ eval-delta refresh (q232)

  private def refreshVsRebuild(corpus: Seq[(Long, String)],
                               eval1: Seq[(Long, String)],
                               delta: Seq[(Long, String)]) = {
    import TestSpark.spark.implicits._
    import org.apache.spark.sql.functions.col
    val corpusDf = corpus.toDF("doc_id", "text")
    val evalH1 = ops.Decontam.evalShingleHashes(eval1.toDF("doc_id", "text"))
    val pieces1 = ops.Decontam.decontamSpansHashed(corpusDf, evalH1)
    val refreshed = ops.Decontam.refreshDecontamSpans(
      corpusDf, pieces1, evalH1, delta.toDF("doc_id", "text"))
    val rebuilt = ops.Decontam.decontamSpans(
      corpusDf, (eval1 ++ delta).toDF("doc_id", "text"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("doc_id"), col("piece_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    (rows(refreshed), rows(rebuilt), pieces1)
  }

  test("refresh == full rebuild: delta-hit, eval1-hit, both-hit and clean docs") {
    val eval1 = Seq(100L -> "e1 e2 e3 e4 e5")
    val delta = Seq(200L -> "d1 d2 d3 d4 d5")
    val corpus = Seq(
      1L -> "a1 a2 a3 a4 a5 d1 d2 d3 d4 d5 a6 a7 a8 a9 a10 a11",   // Δ only
      2L -> "b1 b2 b3 b4 b5 e1 e2 e3 e4 e5 b6 b7 b8 b9 b10 b11",   // E₁ only
      3L -> ("c1 c2 c3 c4 c5 e1 e2 e3 e4 e5 c6 c7 c8 c9 c10 c11 " +
        "d1 d2 d3 d4 d5 c12 c13 c14 c15 c16"),                      // both
      4L -> "f1 f2 f3 f4 f5 f6")                                     // clean
    val (refreshed, rebuilt, _) = refreshVsRebuild(corpus, eval1, delta)
    assert(refreshed == rebuilt, "refresh diverged from the from-scratch rebuild")
    assert(refreshed.exists(_._1 == 1L) && refreshed.exists(_._1 == 4L))
  }

  test("refresh re-cuts from ORIGINAL text: a delta 5-gram straddling an eval1 cut") {
    // The Δ gram "e4 e5 d1 d2 d3" exists only in the ORIGINAL doc — the
    // E₁ cut removed e1..e5 (+pad), so a refresh that re-scanned the
    // stored PIECES instead of the corpus would never see it and would
    // keep d1..d3 contaminated. Refresh must equal the rebuild anyway.
    val eval1 = Seq(100L -> "e1 e2 e3 e4 e5")
    val delta = Seq(200L -> "e4 e5 d1 d2 d3")
    val corpus = Seq(
      9L -> "a1 a2 a3 a4 a5 a6 e1 e2 e3 e4 e5 d1 d2 d3 s1 s2 s3 s4 s5 s6 s7")
    val (refreshed, rebuilt, _) = refreshVsRebuild(corpus, eval1, delta)
    assert(refreshed == rebuilt, "piece-grain rescan semantics detected")
    // and the straddling gram really widened the cut vs the E₁-only state
    assert(rebuilt.exists { case (_, _, _, txt) => !txt.contains("d3") })
  }

  test("refresh is actually incremental: stored rows of unaffected docs pass through") {
    import TestSpark.spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, concat}
    val eval1 = Seq(100L -> "e1 e2 e3 e4 e5")
    val delta = Seq(200L -> "d1 d2 d3 d4 d5")
    val corpus = Seq(
      1L -> "a1 a2 a3 a4 a5 d1 d2 d3 d4 d5 a6 a7 a8 a9 a10 a11",   // affected
      2L -> "b1 b2 b3 b4 b5 e1 e2 e3 e4 e5 b6 b7 b8 b9 b10 b11")   // unaffected
    val corpusDf = corpus.toDF("doc_id", "text")
    val evalH1 = ops.Decontam.evalShingleHashes(eval1.toDF("doc_id", "text"))
    // plant a MARKER in the stored rows of the unaffected doc: if the
    // refresh recomputed it, the marker would vanish
    val pieces1 = ops.Decontam.decontamSpansHashed(corpusDf, evalH1)
      .withColumn("piece_text",
        org.apache.spark.sql.functions.when(col("doc_id") === 2L,
          concat(lit("MARK "), col("piece_text"))).otherwise(col("piece_text")))
    val out = ops.Decontam.refreshDecontamSpans(
      corpusDf, pieces1, evalH1, delta.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getString(3))).toSeq
    assert(out.filter(_._1 == 2L).forall(_._2.startsWith("MARK ")),
      "unaffected doc was recomputed instead of carried from the stored table")
    assert(out.filter(_._1 == 1L).forall(!_._2.startsWith("MARK ")))
  }
}
