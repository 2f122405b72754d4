package graft

import org.scalatest.funsuite.AnyFunSuite

/** The public facade must work on ARBITRARY user DataFrames, not just
  * the registry's test tables — exercised here on a synthetic corpus
  * built in the test, end to end through dedup. */
class GraftApiSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val corpus = {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    Seq(
      (1L, "en", base + "one"),
      (2L, "en", base + "two"),            // near-dup of 1 (1-word diff)
      (3L, "de", base + "one"),            // exact text of 1 under a new id
      (4L, "fr", "tiny doc with seven distinct words here"),
      (5L, "es", "completely different content about query engines and shuffles okay " * 4)
    ).toDF("doc_id", "lang", "text")
  }

  test("nearDupPairs finds the planted near-dups on a user-supplied frame") {
    val pairs = Graft.nearDupPairs(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("dedup keeps the min doc_id of the near-dup cluster plus all singletons") {
    val kept = Graft.dedup(corpus).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L, 5L))
  }

  test("textQuality computes stats for frames with or without a lang column") {
    val q1 = Graft.textQuality(corpus)
    assert(q1.count() == 5 && q1.columns.contains("quality"))
    val q2 = Graft.textQuality(corpus.drop("lang"))
    assert(q2.select("lang").distinct().collect().map(_.getString(0)).toSeq == Seq("und"))
  }

  test("packTokens covers every doc exactly once at any budget") {
    val bins = Graft.packTokens(corpus, budget = 40)
      .collect().map(r => r.getLong(2))
    assert(bins.sum == corpus.count())
  }

  test("jaccardNearDupPairs on the same frame agrees with the minhash path") {
    val jac = Graft.jaccardNearDupPairs(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = Graft.nearDupPairs(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.subsetOf(jac)) // LSH recall ⊆ exact inverted-index recall
    assert(jac == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }
}
