package graft

import org.scalatest.funsuite.AnyFunSuite

/** Content-defined chunking (q223) semantics: boundary rule, the
  * shift-robustness that motivates CDC over a fixed grid, and
  * corpus-wide occurrence counting. The DuckDB oracle re-checks exact
  * values at sf0.01; these fixtures pin the property the oracle can't
  * express — that an EDIT only perturbs its own chunk. */
class CdcSpec extends AnyFunSuite {
  import TestSpark._

  private def h60(s: String): Long =
    java.lang.Long.parseLong(ops.Hashes.md5Hex(s).substring(0, 15), 16)

  // deterministic boundary/plain word pools, derived the same way the
  // engine and oracle hash (md5 60-bit prefix)
  private val words = (1 to 400).map(i => s"w$i")
  private val cutWords = words.filter(h60(_) % 8 == 0)
  private val plainWords = words.filterNot(h60(_) % 8 == 0)

  private def chunksOf(docs: Seq[(Long, String)]): Map[Long, Seq[(Long, Long, Long, Long)]] = {
    import TestSpark.spark.implicits._
    ops.Dedup.cdcChunks(docs.toDF("doc_id", "text"), 8)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
  }

  test("boundaries cut exactly before mod-8-zero words; chunks tile the doc") {
    assert(cutWords.size >= 2 && plainWords.size >= 8, "fixture pools must be populated")
    // p p C p p C p  → chunks [0,2), [2,5), [5,7)
    val ws = Seq(plainWords(0), plainWords(1), cutWords(0), plainWords(2),
      plainWords(3), cutWords(1), plainWords(4))
    val out = chunksOf(Seq(1L -> ws.mkString(" ")))(1L)
    assert(out.map(t => (t._1, t._2, t._3)) == Seq((0L, 0L, 2L), (1L, 2L, 3L), (2L, 5L, 2L)))
  }

  test("a leading cut word yields no empty chunk (cut at position 0 is the existing bound)") {
    val ws = Seq(cutWords(0), plainWords(0), plainWords(1))
    val out = chunksOf(Seq(2L -> ws.mkString(" ")))(2L)
    assert(out.map(t => (t._1, t._2, t._3)) == Seq((0L, 0L, 3L)),
      "position-0 cut coincides with the leading bound — one chunk, no empties")
  }

  test("shift-robustness: prepending a word preserves every chunk after the first") {
    val body = Seq(plainWords(0), plainWords(1), cutWords(0), plainWords(2),
      plainWords(3), plainWords(4), cutWords(1), plainWords(5), plainWords(6))
    val a = body.mkString(" ")
    val b = (plainWords(7) +: body).mkString(" ")
    val out = chunksOf(Seq(1L -> a, 2L -> b))
    val aChunks = out(1L)
    // doc 2's chunks after its first must include EVERY doc-1 chunk
    // after doc 1's first — same contents, same lengths, starts +1
    val aTail = aChunks.drop(1).map(t => (t._2 + 1, t._3))
    val bTail = out(2L).drop(1).map(t => (t._2, t._3))
    assert(aTail == bTail,
      s"shifted tail chunks must align: $aTail vs $bTail")
    // and those shared chunks are recognized as duplicates (n_occ = 2)
    assert(out(1L).drop(1).forall(_._4 == 2L),
      "tail chunks occur in both docs — n_occ must see through the shift")
    // the fixed 8-word grid, by contrast, aligns NOTHING after a
    // 1-word shift (doc lengths 9/10 → one grid segment each, different)
    import TestSpark.spark.implicits._
    val grid = ops.Dedup.segmentDedup(Seq(1L -> a, 2L -> b).toDF("doc_id", "text"), 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(grid.values.sum == 0, "grid segments all unique under shift — the CDC contrast")
  }

  test("cdcDedup deduplicates a shared passage across DIFFERENT word offsets") {
    import TestSpark.spark.implicits._
    val body = Seq(plainWords(0), plainWords(1), cutWords(0), plainWords(2),
      plainWords(3), plainWords(4), cutWords(1), plainWords(5), plainWords(6))
    val a = body.mkString(" ")                       // chunks [0,2) [2,6) [6,9)
    val b = (plainWords(7) +: body).mkString(" ")    // same tail chunks, +1 offset
    val out = ops.Dedup.cdcDedup(Seq((1L, a), (2L, b)).toDF("doc_id", "text"), 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // doc 1 owns every keeper → intact; doc 2 keeps only its first chunk
    assert(out(1L) == ((3L, 0L, a)))
    assert(out(2L) == ((3L, 2L, (plainWords(7) +: body.take(2)).mkString(" "))))
    // the grid rewrite misses this: both docs pass through untouched
    val grid = ops.Dedup.segmentDedup(Seq((1L, a), (2L, b)).toDF("doc_id", "text"), 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(grid == Map(1L -> 0L, 2L -> 0L), "fixed grid aligns nothing under shift")
  }

  test("q223 registry entry: chunks tile every doc and n_occ >= 1") {
    val rows = SparkEntry.queries("q223_cdc_chunks")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty && rows.forall(_._5 >= 1))
    val docLens = Tables.documents(spark, Sf0001)
      .selectExpr("doc_id", "size(split(text, ' ')) AS m")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.groupBy(_._1).foreach { case (d, ch) =>
      val sorted = ch.sortBy(_._2).toSeq
      assert(sorted.map(_._2) == (0L until sorted.length).toSeq, s"doc $d: dense k")
      assert(sorted.map(_._4).sum == docLens(d).toLong, s"doc $d: chunks must tile")
      // starts are the running sum of lengths
      assert(sorted.map(_._3) == sorted.map(_._4).scanLeft(0L)(_ + _).init.toSeq, s"doc $d: starts")
    }
  }
}
