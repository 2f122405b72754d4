package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The §2.5 skew contract, pinned (r15, VERDICT r14 item 6 — measured
  * census in plans/R15_SKEW.md):
  *
  *  - partition-grain skew mitigation is ACTIVE for every shuffle join
  *    in every entry point: AQE + skew-join handling are Spark 4
  *    defaults, but a conf regression (an entry point pinning
  *    `spark.sql.adaptive.enabled=false` "for determinism") would
  *    silently disable the only mitigation the sort-merge paths have
  *    for oversized partitions — so the session contract is asserted;
  *  - key-grain mitigation for the hyperplane-bucket family is
  *    [[ops.Similarity.lshGuardBuckets]]: a planted hot bucket whose
  *    members SPREAD around their centroid (the organic dense-region
  *    shape) must split into sub-buckets bounded near the cap, so no
  *    reduce task owns the quadratic blob. Exact clones deliberately do
  *    NOT split (geometry cannot separate identical points — that is
  *    exact dedup's job upstream, q24/q216); the probe measures both.
  */
class SkewGuardSpec extends AnyFunSuite {
  import TestSpark._

  test("Sessions.local sessions keep AQE and skew-join handling enabled") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true",
      "AQE off: partition coalescing AND skew-join splitting are both dead")
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true",
      "AQE skew-join handling off: an oversized sort-merge partition " +
        "runs as one straggler task")
  }

  test("a planted spread hot bucket splits to near the cap; clones stay whole by design") {
    import ops.Similarity.{bucketized, lshGuardBuckets}
    // 800 vectors in ONE hyperplane bucket: all share the same signs
    // (coords of constant sign pattern), spread ±0.5 around the center
    // via a deterministic per-(row, coord) hash jitter
    val dim = 16
    val center = Array.tabulate(dim)(i => if (i % 2 == 0) 1.0 else -1.0)
    def jit(id: Long, i: Int, amp: Double): Double = {
      val h = scala.util.hashing.MurmurHash3.productHash((id, i))
      (h % 1001) / 1000.0 * amp
    }
    def cloud(amp: Double) = {
      import spark.implicits._
      (0L until 800L).map(id =>
        (id, center.zipWithIndex.map { case (c, i) => c + jit(id, i, amp) }.toSeq))
        .toDF("vec_id", "v")
    }
    val cap = 16
    def maxSubKey(amp: Double): Long =
      lshGuardBuckets(bucketized(cloud(amp)), cap)
        .groupBy(col("bucket"), col("band"), col("sig"))
        .agg(count(lit(1)).as("n"))
        .agg(max(col("n"))).head.getLong(0)
    // spread cloud: the sub-bucket signs split the 800-member bucket so
    // the hottest join key is bounded near the cap (≤ 4× allows sign-
    // correlation slack; the unguarded key would be 800)
    val spread = maxSubKey(0.5)
    assert(spread <= 4L * cap,
      s"spread hot bucket not split: hottest sub-key $spread (cap $cap)")
    // exact clones share every signature — the guard leaves them whole
    // (exact-dup recall is structural; bounding them is exact dedup's
    // job upstream, not geometry's)
    assert(maxSubKey(0.0) == 800L)
  }
}
