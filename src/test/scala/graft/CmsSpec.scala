package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-Min sketch contract (q215): one-sided error (est ≥ truth,
  * always — not just w.h.p.), bounded overshoot, byte-level
  * partition-invariance of the state (element-wise long sums), exact
  * deletion by subtraction (the property HLL's grow-only registers
  * lack), and JVM/Column position-twin agreement — the probe side must
  * read exactly the cells the aggregator wrote. */
class CmsSpec extends AnyFunSuite {
  import TestSpark._
  import graft.functions.CountMin

  test("q215: est sandwiches exact counts — cnt <= est <= cnt + e*N/width") {
    val terms = Tables.documents(spark, Sf0001)
      .select(explode(split(col("text"), " ")).as("term"))
    val n = terms.count()
    val rows = SparkEntry.queries("q215_cms_freq")(spark, Sf0001).collect()
    assert(rows.length == 10)
    val bound = math.ceil(math.E * n / ops.HeavyHitters.DefaultCmsWidth).toLong
    rows.foreach { r =>
      val (cnt, est) = (r.getAs[Long]("cnt"), r.getAs[Long]("est_freq"))
      assert(est >= cnt, s"${r.getString(0)}: est $est under-counts exact $cnt")
      assert(est <= cnt + bound, s"${r.getString(0)}: est $est overshoots $cnt by > $bound")
    }
  }

  test("state is byte-identical under any partitioning; deletions subtract exactly") {
    import spark.implicits._
    val vals = (0 until 4000).map(i => s"k_${i % 700}")
    def state(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.agg(CountMin.udaf(256)(ops.Hashes.hexLong(col("v"))).as("cms"))
        .collect()(0).getAs[scala.collection.Seq[Long]]("cms").toSeq
    val a = state(vals.toDF("v").repartition(1))
    val b = state(vals.toDF("v").repartition(17, col("v")))
    val c = state(vals.reverse.toDF("v").repartition(5))
    assert(a == b && b == c, "partitioning or order changed the CMS state bytes")
    // exact deletion: state(A ++ B) - state(B) == state(A), element-wise
    val extra = (0 until 900).map(i => s"x_${i % 30}")
    val ab = state((vals ++ extra).toDF("v").repartition(7))
    val bOnly = state(extra.toDF("v").repartition(3))
    assert(ab.zip(bOnly).map { case (x, y) => x - y } == a,
      "subtracting the delta state must recover the base state exactly")
  }

  test("probe cells match aggregator cells: planted singletons estimate exactly 1") {
    import spark.implicits._
    // 500 distinct singletons in width 4096: any under-count would mean
    // the Column-side position twin diverged from the JVM side (an est
    // of 0 reads a never-written cell); small collisions may push some
    // estimates above 1 but never below
    val vals = (0 until 500).map(i => s"only_$i")
    val probes = vals.toDF("p")
    val est = ops.HeavyHitters.cmsFrequencies(
      vals.toDF("v").repartition(9), col("v"), probes, col("p"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("est_freq")).toMap
    assert(est.size == 500)
    assert(est.values.forall(_ >= 1L), "a singleton estimated at 0 — probe read a cell the update never wrote")
    // absent keys stay near zero: overshoot only from collisions
    val absent = ops.HeavyHitters.cmsFrequencies(
      vals.toDF("v"), col("v"), (0 until 100).map(i => s"never_$i").toDF("p"), col("p"))
      .collect().map(_.getAs[Long]("est_freq"))
    assert(absent.forall(_ <= 2L), "an absent key's estimate exceeded collision noise")
  }

  test("width guard rejects out-of-range state sizes") {
    intercept[IllegalArgumentException] { new graft.functions.CountMin(8) }
    intercept[IllegalArgumentException] { new graft.functions.CountMin(1 << 23) }
  }

  test("position twins agree in-range on ANY long, including negative misuse") {
    import spark.implicits._
    // the contract input is the non-negative md5 hash, but udaf(width)
    // accepts any long column — floorMod/pmod must keep the twins
    // identical and in-range rather than AIOOBE on one side and a null
    // element_at on the other
    val vals = Seq(Long.MinValue, -1L, -CountMin.Depth.toLong, -987654321L,
      0L, 1L, (1L << 60) - 1, Long.MaxValue)
    val w = 256
    val jvm = for (v <- vals; r <- 0 until CountMin.Depth)
      yield (v, r, CountMin.position(v, r, w))
    jvm.foreach { case (v, r, p) =>
      assert(p >= 0 && p < w, s"JVM position($v, $r) out of range: $p") }
    val colSide = vals.toDF("h")
      .select(col("h") +: (0 until CountMin.Depth)
        .map(r => CountMin.positionCol(col("h"), r, w).as(s"p$r")): _*)
      .collect().flatMap(row => (0 until CountMin.Depth)
        .map(r => (row.getLong(0), r, row.getLong(r + 1).toInt))).toSet
    assert(colSide == jvm.toSet, "Column-side positions diverge from the JVM twin")
  }

  test("rows are decorrelated: keys congruent mod p do not collide in every row") {
    // without the per-row xor seed, h and h + p landed in the SAME cell
    // of all 4 rows (the shared mod-p reduction), collapsing the
    // min-over-4 guarantee to a single row's for such pairs
    val p = (1L << 31) - 1
    val w = 1 << 16
    val pairs = (1L to 50L).map(i => (i * 12345L + 7L, i * 12345L + 7L + p))
    val allRowsCollide = pairs.count { case (h1, h2) =>
      (0 until CountMin.Depth).forall(r =>
        CountMin.position(h1, r, w) == CountMin.position(h2, r, w))
    }
    assert(allRowsCollide == 0,
      s"$allRowsCollide of ${pairs.size} mod-p-congruent pairs collide in all rows")
  }
}
