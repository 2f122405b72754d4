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

  test("priority sample: without replacement, estimator = max(w, tau), exact when k >= N") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, Sf0001)
    val k = 37
    val rows = Graft.prioritySample(docs, col("n_chars"), k = k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // fixed size, no replacement
    assert(rows.length == k)
    assert(rows.map(_._1).distinct.length == k, "a doc_id was sampled twice")
    // the DLT estimator never shrinks a kept weight, and tau is the
    // SAME threshold for every kept row: each w_est is either w itself
    // (w >= tau) or tau (one shared value)
    assert(rows.forall { case (_, w, est) => est >= w.toDouble })
    val lifted = rows.collect { case (_, w, est) if est > w.toDouble => est }.distinct
    assert(lifted.length <= 1, s"more than one distinct tau: ${lifted.toSeq}")
    // k >= N: no (k+1)-th priority exists, tau = 0, every estimate is
    // exactly its weight and every doc is kept
    val n = total.toInt
    val all = Graft.prioritySample(docs, col("n_chars"), k = n + 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(all.length == n)
    assert(all.forall { case (_, w, est) => est == w.toDouble })
    // membership is a pure function of (doc_id, w): a different salt
    // draws a genuinely different sample (not a degenerate top-k by w)
    val other = Graft.prioritySample(docs, col("n_chars"), k = k, salt = "prio2")
      .collect().map(_.getLong(0)).toSet
    assert(other != rows.map(_._1).toSet, "salt does not change the draw")
  }

  test("stratified priority sample: per-stratum k, per-stratum tau, exact small strata") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // stratum A has FEWER rows than k (all kept, tau = 0, est exact);
    // B has more (exactly k kept, one shared tau per stratum)
    val docs = (Seq((1L, "A", 100L), (2L, "A", 300L)) ++
      (10L to 19L).map(i => (i, "B", 50L + i))).toDF("doc_id", "lang", "n_chars")
    val rows = Graft.stratPrioritySample(docs, "lang", col("n_chars"), k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byLang = rows.groupBy(_._1)
    assert(byLang("A").length == 2 && byLang("B").length == 3)
    assert(rows.map(_._2).distinct.length == rows.length, "a doc sampled twice")
    // A is exhaustive: tau = 0, estimates are the raw weights
    assert(byLang("A").forall { case (_, _, w, est) => est == w.toDouble })
    // B: est = max(w, tau) with ONE tau for the stratum
    assert(byLang("B").forall { case (_, _, w, est) => est >= w.toDouble })
    val bTaus = byLang("B").collect { case (_, _, w, est) if est > w.toDouble => est }.distinct
    assert(bTaus.length <= 1, s"more than one tau inside stratum B: ${bTaus.toSeq}")
    // strata draw independently: B's kept set must not depend on A's
    // presence (a global-k implementation would couple them)
    val bOnly = Graft.stratPrioritySample(docs.filter(col("lang") === "B"),
      "lang", col("n_chars"), k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(bOnly.toSet == byLang("B").toSet, "stratum draw depends on other strata")
  }
}
