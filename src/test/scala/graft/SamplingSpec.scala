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
