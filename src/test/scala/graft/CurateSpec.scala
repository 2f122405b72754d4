package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cross-query consistency: the curated-corpus rollup must equal the
  * same computation assembled from q30 (stats), q72 (components), and
  * the raw lang column — all independently oracle-checked. */
class CurateSpec extends AnyFunSuite {
  import TestSpark._

  test("q75 equals the composition of q30 stats, q72 components, and lang") {
    val stats = SparkEntry.queries("q30_text_stats")(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> (r.getInt(2), r.getDouble(7))).toMap // n_words, quality
    val lang = Tables.documents(spark, Sf0001).select("doc_id", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val dropped = SparkEntry.queries("q72_dedup_components")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (id, c) => id != c }.map(_._1).toSet
    val curated = stats.toSeq
      .filter { case (id, (w, q)) => q >= 0.40 && w >= 20 && !dropped(id) }
    val expected = curated.groupBy { case (id, _) => lang(id) }
      .map { case (l, docs) =>
        val qs = docs.map(_._2._2)
        (l, docs.size.toLong, docs.map(_._2._1.toLong).sum, qs.min, qs.max)
      }.toSet
    val got = SparkEntry.queries("q75_curated_corpus")(spark, Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(got == expected)
    assert(got.nonEmpty && curated.size < stats.size,
      "curation must actually filter something on the fixture")
  }
}
