package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE merge training: the exact hand-derivable merge sequence on a
  * fixture, and corpus-level invariants (chosen-pair counts are
  * non-increasing; the table is a pure function of the corpus). */
class BpeSpec extends AnyFunSuite {
  import TestSpark._

  test("learns the hand-computed merge sequence, ties broken lexicographically") {
    import spark.implicits._
    // word types: aab x3, ab x2. Round 1 pair counts: (a,a)=3,
    // (a,b)=5, (b,</w>)=5 -> tie at 5, lexicographic left wins: (a,b).
    // Round 2: (ab,</w>)=5. Round 3: (a,ab</w>)=3. Then every word is a
    // single symbol -> training exhausts at 3 merges even though 10
    // were requested.
    val docs = Seq((1L, "aab aab aab ab ab")).toDF("doc_id", "text")
    val merges = Graft.bpeMerges(docs, n = 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq == Seq(
      (1, "a", "b", 5L),
      (2, "ab", "</w>", 5L),
      (3, "a", "ab</w>", 3L)))
    intercept[IllegalArgumentException](Graft.bpeMerges(docs, 0))
  }

  test("merge application is left-to-right non-overlapping") {
    import spark.implicits._
    // "aaaa": round-1 top pair is (a,a)=3 per word (overlapping), but
    // application must merge non-overlapping -> [aa, aa, </w>], never
    // [aa, a, a...] double-consumption
    val docs = Seq((1L, "aaaa aaaa")).toDF("doc_id", "text")
    val merges = Graft.bpeMerges(docs, n = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // (a,a) appears 3 times per word BEFORE merging (adjacent slots),
    // 2 word tokens -> count 6; after merging: [aa, aa, </w>] gives
    // (aa,aa)=2 and (aa,</w>)=2 -> tie on right: "</w>" < "aa" ('<' is
    // 0x3C), so (aa,</w>) wins the lexicographic tie-break
    assert(merges(0) == ((1, "a", "a", 6L)))
    assert(merges(1) == ((2, "aa", "</w>", 2L)))
  }

  test("q191 on the corpus: counts non-increasing, rerun identical") {
    val m1 = SparkEntry.queries("q191_bpe_merges")(spark, Sf0001)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m1.length == 10)
    assert(m1.map(_._1).toSeq == (1 to 10))
    // merging never raises the achievable top pair count
    val counts = m1.map(_._4)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"counts not non-increasing: ${counts.mkString(",")}")
    val m2 = SparkEntry.queries("q191_bpe_merges")(spark, Sf0001)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m1.toSeq == m2.toSeq)
  }
}
