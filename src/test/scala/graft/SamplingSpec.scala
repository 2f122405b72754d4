package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant tests for the non-oracle sampling/split entries
  * (SURVEY.md §2.5 rows 32-35): seeded determinism across runs,
  * split disjointness + exact coverage, count windows. */
class SamplingSpec extends AnyFunSuite {
  import TestSpark._

  private def ids(name: String): Seq[Long] =
    SparkEntry.queries(name)(spark, Sf0001)
      .collect().map(_.getLong(1)).toSeq

  private lazy val total =
    Tables.documents(spark, Sf0001).count()

  test("hash-stratified sample hits per-language rates and is partition-independent") {
    val rows = SparkEntry.queries("q71_stratified_sample")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byLang = Tables.documents(spark, Sf0001).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rate = Map("en" -> 0.25, "zh" -> 0.5).withDefaultValue(0.75)
    rows.groupBy(_._2).foreach { case (lang, sampled) =>
      val expected = byLang(lang) * rate(lang)
      // 4σ binomial window — deterministic data, so this never flakes
      val sigma = math.sqrt(byLang(lang) * rate(lang) * (1 - rate(lang)))
      assert(math.abs(sampled.size - expected) <= 4 * sigma + 1,
        s"$lang: got ${sampled.size}, expected ~$expected")
    }
    // membership is a pure function of doc_id — replicate it exactly in
    // plain Scala (partition layout, engine, and run order can't matter)
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): Long = {
      val d = md.digest(s"strat:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(8).map(b => f"${b & 0xFF}%02x").mkString.take(15), 16) % 10000
    }
    val thresh = Map("en" -> 2500L, "zh" -> 5000L).withDefaultValue(7500L)
    val expectedRows = Tables.documents(spark, Sf0001).select("doc_id", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .filter { case (id, lang) => bucket(id) < thresh(lang) }
    assert(rows.sortBy(_._1).toSeq == expectedRows.sortBy(_._1).toSeq)
  }

  test("sample(fraction, seed) is deterministic and lands near the expected size") {
    val a = SparkEntry.queries("q40_sample_fraction")(spark, Sf0001)
      .collect().map(_.getLong(0)).toSeq
    val b = SparkEntry.queries("q40_sample_fraction")(spark, Sf0001)
      .collect().map(_.getLong(0)).toSeq
    assert(a == b, "same seed+partitioning must select identical rows")
    val expected = total * 0.2
    assert(a.size > expected * 0.5 && a.size < expected * 1.7,
      s"sampled ${a.size} of $total at fraction 0.2")
  }

  test("randomSplit partitions are disjoint and cover every row exactly once") {
    val Array(train, test) =
      Tables.documents(spark, Sf0001).randomSplit(Array(0.8, 0.2), seed = 42)
    val trainIds = train.select("doc_id").collect().map(_.getLong(0)).toSet
    val testIds = test.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(trainIds.intersect(testIds).isEmpty)
    assert((trainIds.size + testIds.size).toLong == total)
  }

  test("randomSplit is deterministic for a fixed seed") {
    def counts = SparkEntry.queries("q41_random_split")(spark, Sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = counts
    assert(a == counts)
    assert(a.values.sum == total)
  }

  test("orderBy(rand(seed)).limit returns exactly n deterministic rows") {
    val a = SparkEntry.queries("q42_rand_limit")(spark, Sf0001)
      .collect().map(_.getLong(0)).toSeq
    val b = SparkEntry.queries("q42_rand_limit")(spark, Sf0001)
      .collect().map(_.getLong(0)).toSeq
    assert(a.size == 50)
    assert(a == b)
  }

  test("two-stage split covers every row exactly once across train/val/test") {
    val counts = SparkEntry.queries("q43_two_stage_split")(spark, Sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("1_train", "2_val", "3_test"))
    assert(counts.values.sum == total)
    assert(counts("1_train") > counts("3_test"))
  }
}
