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

  test("q227 span-curation rollups equal JVM-side aggregation of its stage outputs") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, Sf0001)
    val corpus = docs.filter(col("doc_id") % 20 =!= 0)
    val evalSet = docs.filter(col("doc_id") % 20 === 0)
    val srcOf = corpus.select(col("doc_id"), col("source"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val wordsIn = corpus.select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" ", -1).length.toLong).toMap
    val cleaned = Graft.cdcDedup(corpus.select(col("doc_id"), col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val pieces = Graft.decontamSpans(
        Graft.cdcDedup(corpus.select(col("doc_id"), col("text")))
          .select(col("doc_id"), col("clean_text").as("text")), evalSet)
      .collect().map(r => (r.getLong(0), r.getString(3)))
    // third implementation of the piece-quality battery, in plain Scala
    def keep(txt: String): Boolean = {
      val w = txt.split(" ", -1)
      val n = w.length
      val meanw = w.map(_.length.toLong).sum.toDouble / n
      val stopf = w.count(x => x == "the" || x == "a").toDouble / n
      val topf = w.distinct.map(d => w.count(_ == d)).max.toDouble / n
      val dr = w.distinct.length.toDouble / n
      n >= 10 && meanw >= 3.0 && meanw <= 8.0 && stopf <= 0.12 &&
        topf <= 0.15 && dr >= 0.35
    }
    val expected = srcOf.values.toSeq.distinct.sorted.map { src =>
      val ids = srcOf.collect { case (id, s) if s == src => id }.toSet
      val ps = pieces.filter(p => ids(p._1))
      val kept = ps.filter(p => keep(p._2))
      (src, ids.size.toLong, ids.toSeq.map(wordsIn).sum,
        ids.toSeq.map(id => if (cleaned(id).isEmpty) 0L
          else cleaned(id).split(" ", -1).length.toLong).sum,
        ps.size.toLong, ps.map(_._2.split(" ", -1).length.toLong).sum,
        kept.size.toLong, kept.map(_._2.split(" ", -1).length.toLong).sum)
    }
    val got = SparkEntry.queries("q227_span_curation")(spark, Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == expected)
    // the funnel must actually cut at every stage on the fixture
    val (win, wded, wspan, wfin) =
      (got.map(_._3).sum, got.map(_._4).sum, got.map(_._6).sum, got.map(_._8).sum)
    assert(win > wded && wded >= wspan && wspan > wfin,
      s"vacuous funnel: $win -> $wded -> $wspan -> $wfin")
  }
}
