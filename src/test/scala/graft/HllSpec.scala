package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HyperLogLog sketch contract: accuracy vs exact distinct, linear-
  * counting exactness at tiny cardinalities, and — the scale property
  * the aggregate exists for — partitioning-independence of the estimate
  * (register-max merge is commutative/associative, so 1 thread and 1000
  * executors must produce the identical sketch). */
class HllSpec extends AnyFunSuite {
  import TestSpark._

  test("q182 estimates per-lang distinct tokens within 5% of exact") {
    // numeric accuracy pinned against the PRODUCTION facade (the gate
    // query q182 publishes (exact, approx_ok) — its 10% envelope is the
    // oracle's job; this spec keeps the tighter 5% bound on the sketch)
    val toks = graft.Tables.documents(spark, Sf001)
      .select(col("lang"), explode(split(col("text"), " ")).as("term"))
    val est = Graft.approxDistinct(toks, col("lang"), col("term"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = toks
      .groupBy(col("lang")).agg(countDistinct(col("term")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (lang, d) =>
      val e = est(lang)
      assert(math.abs(e - d) <= math.max(1L, (0.05 * d).toLong),
        s"lang=$lang exact=$d est=$e")
    }
    // the registered gate row: exact column matches, envelope boolean true
    val gate = SparkEntry.queries("q182_hll_distinct")(spark, Sf001).collect()
    assert(gate.map(r => r.getString(0) -> r.getLong(1)).toMap == exact)
    assert(gate.forall(_.getBoolean(2)), "q182 approx_ok must hold")
  }

  test("estimate is a pure function of the input set — any partitioning, any order") {
    import spark.implicits._
    val vals = (0 until 5000).map(i => s"tok_$i")
    def run(df: org.apache.spark.sql.DataFrame): Long =
      Graft.approxDistinct(df, lit(1), col("v")).collect()(0).getLong(1)
    val base = vals.toDF("v")
    val a = run(base.repartition(1))
    val b = run(base.repartition(17, col("v")))
    val c = run(vals.reverse.toDF("v").repartition(5))
    val dup = run((vals ++ vals ++ vals.take(100)).toDF("v").repartition(3))
    assert(a == b && b == c, s"partitioning changed the estimate: $a / $b / $c")
    assert(a == dup, "duplicates must not move the estimate")
    assert(math.abs(a - 5000L) <= 250, s"5000 distinct estimated as $a")
    // null values are excluded, the COUNT(DISTINCT) convention
    val withNulls = (vals.map(Option(_)) ++ Seq(None, None)).toDF("v")
    assert(run(withNulls) == a, "nulls must not contribute to the estimate")
  }

  test("linear counting is exact at tiny cardinalities; disjoint sets merge additively") {
    import spark.implicits._
    val small = (1 to 10).map(i => s"v$i").toDF("v")
    val e10 = Graft.approxDistinct(small, lit(1), col("v")).collect()(0).getLong(1)
    assert(e10 == 10L, s"10 distinct estimated as $e10")
    // two disjoint 1000-value halves, counted per group and together
    val half1 = (0 until 1000).map(i => ("a", s"x_$i"))
    val half2 = (0 until 1000).map(i => ("b", s"y_$i"))
    val both = (half1 ++ half2).toDF("g", "v")
    val per = Graft.approxDistinct(both, col("g"), col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = Graft.approxDistinct(both, lit(1), col("v")).collect()(0).getLong(1)
    assert(math.abs(per("a") - 1000) <= 50 && math.abs(per("b") - 1000) <= 50)
    assert(math.abs(merged - 2000) <= 100, s"union of disjoint halves: $merged")
  }

  test("sketch-state merge estimates IDENTICALLY to the direct pass") {
    import spark.implicits._
    // q193 (per-(lang, source) stored sketches, unioned per lang) must
    // equal the direct one-pass estimate value-for-value: register-max
    // union is associative/commutative/idempotent, so the merged sketch
    // is the same bytes. The registered q193 asserts this itself as its
    // merge_exact_ok boolean — verify it holds, with the envelope too.
    val gate = SparkEntry.queries("q193_hll_state_merge")(spark, Sf001).collect()
    assert(gate.nonEmpty)
    assert(gate.forall(_.getBoolean(2)), "q193 merge_exact_ok must hold")
    assert(gate.forall(_.getBoolean(3)), "q193 approx_ok must hold")
    // facade round-trip on a user frame, overlapping partitions included
    // (idempotence: the same value observed in two stored states must
    // not double-count)
    val part1 = (0 until 800).map(i => ("p1", s"u_$i")).toDF("part", "v")
    val part2 = (400 until 1200).map(i => ("p2", s"u_$i")).toDF("part", "v")
    val state = Graft.distinctSketch(part1.union(part2), col("part"), col("v"))
    assert(state.collect().forall(_.getAs[Array[Byte]]("sketch").length == 4096))
    val est = Graft.mergeDistinctSketches(state, lit(1), col("sketch"))
      .collect()(0).getLong(1)
    val directAll = Graft.approxDistinct(part1.union(part2), lit(1), col("v"))
      .collect()(0).getLong(1)
    assert(est == directAll, s"state merge $est != direct $directAll")
    assert(math.abs(est - 1200L) <= 60, s"1200 distinct estimated as $est")
    // wrong-size blobs are rejected loudly, not mis-indexed
    val bad = Seq((1, Array[Byte](1, 2, 3))).toDF("g", "sketch")
    val ex = intercept[org.apache.spark.SparkException] {
      Graft.mergeDistinctSketches(bad, col("g"), col("sketch")).collect()
    }
    assert(ex.getMessage.contains("not a graft HLL sketch") ||
      Option(ex.getCause).exists(_.getMessage.contains("not a graft HLL sketch")))
  }

  test("refreshDistinctSketch: delta refresh is byte-identical to a from-scratch rebuild") {
    import spark.implicits._
    val base = (0 until 900).map(i => (s"g${i % 3}", s"v_$i")).toDF("g", "v")
    // delta overlaps base (idempotence must hold), adds new values to
    // standing groups, AND introduces a brand-new group
    val delta = ((800 until 1100).map(i => (s"g${i % 3}", s"v_$i")) ++
      (0 until 50).map(i => ("g_new", s"w_$i"))).toDF("g", "v")
    val standing = Graft.distinctSketch(base, col("g"), col("v"))
    val refreshed = Graft.refreshDistinctSketch(standing, delta, col("g"), col("v"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("sketch").toSeq).toMap
    val rebuilt = Graft.distinctSketch(base.union(delta), col("g").as("g"), col("v"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("sketch").toSeq).toMap
    assert(refreshed.keySet == rebuilt.keySet)
    refreshed.foreach { case (g, sk) =>
      assert(sk == rebuilt(g), s"group $g: refreshed state != rebuilt state")
    }
    // estimates agree too (same bytes ⇒ same estimate, spot-check the API)
    val estRefreshed = Graft.mergeDistinctSketches(
      Graft.refreshDistinctSketch(standing, delta, col("g"), col("v")),
      col("g"), col("sketch"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val estDirect = Graft.approxDistinct(base.union(delta), col("g"), col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(estRefreshed == estDirect)
  }

  test("q214 sketch-overlap matrix: error bound vs exact intersections, union dominance") {
    val docs = graft.Tables.documents(spark, Sf0001)
    val shingles = ops.Dedup.hashedShinglesOf(docs)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .select(col("source"), explode(col("hs")).as("h")).distinct()
    // exact per-pair |A|, |B|, |A∩B|, |A∪B| via a self-join on h
    val exact = shingles.select(col("source").as("sa"), col("h"))
      .join(shingles.select(col("source").as("sb"), col("h")), Seq("h"))
      .filter(col("sa") < col("sb"))
      .groupBy(col("sa"), col("sb")).agg(count(lit(1)).as("inter"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val sizes = shingles.groupBy(col("source"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // numeric error bounds against the PRODUCTION facade (the gate
    // query q214 publishes exact integers + envelope booleans; the
    // oracle owns those — this spec keeps the tighter numeric bounds
    // on the raw sketch matrix)
    val est = Graft.sketchOverlap(shingles, col("source"), col("h"))
      .collect()
    assert(est.length == sizes.size * (sizes.size - 1) / 2,
      s"expected all ${sizes.size * (sizes.size - 1) / 2} unordered pairs, got ${est.length}")
    est.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (estA, estB, estU, estI) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      // register-max union is monotone: the union estimate can never
      // fall below either side's own estimate
      assert(estU >= math.max(estA, estB), s"($a,$b): union $estU < max($estA,$estB)")
      val exactI = exact.getOrElse((a, b), 0L)
      val exactU = sizes(a) + sizes(b) - exactI
      // inclusion–exclusion sums three ±1.6% terms, each ≤ the union:
      // the intersection error is bounded by a few percent OF THE UNION
      assert(math.abs(estI - exactI) <= math.max(3L, (0.08 * exactU).toLong),
        s"($a,$b): est_inter=$estI exact=$exactI union=$exactU")
    }
    // the registered gate rows: exact integers match the independent
    // self-join here, and every envelope/structure boolean holds
    val gate = SparkEntry.queries("q214_sketch_overlap")(spark, Sf0001).collect()
    assert(gate.length == est.length)
    gate.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val exactI = exact.getOrElse((a, b), 0L)
      assert(r.getLong(2) == sizes(a) && r.getLong(3) == sizes(b))
      assert(r.getLong(5) == exactI, s"($a,$b) exact_inter")
      assert(r.getLong(4) == sizes(a) + sizes(b) - exactI, s"($a,$b) exact_union")
      assert(r.getBoolean(6) && r.getBoolean(7) && r.getBoolean(8),
        s"($a,$b): a q214 gate boolean flipped")
    }
  }
}
