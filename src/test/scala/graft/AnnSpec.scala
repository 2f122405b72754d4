package graft

import org.scalatest.funsuite.AnyFunSuite

/** ANN-variant quality tests: the approximate paths (hyperplane-LSH
  * buckets, IVF probes) are judged against the exact brute-force top-k —
  * structure exactly, recall as a floor (approximation is the point;
  * zero overlap would mean a broken index, not an approximation). */
class AnnSpec extends AnyFunSuite {
  import TestSpark._

  private def topk(name: String): Map[Long, Seq[Long]] =
    SparkEntry.queries(name)(spark, Sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      .groupBy(_._1).map { case (q, rows) =>
        q -> rows.sortBy(_._3).map(_._2).toSeq
      }

  private lazy val exact = topk("q27_ann_topk")

  test("IVF probe returns well-formed per-query rankings") {
    val ivf = topk("q60_ann_ivf")
    assert(ivf.nonEmpty)
    ivf.values.foreach(ns => assert(ns.length <= 5 && ns.distinct.length == ns.length))
  }

  test("IVF recall@5 beats the random-candidate baseline") {
    val ivf = topk("q60_ann_ivf")
    val hits = exact.keys.toSeq.map { q =>
      ivf.getOrElse(q, Nil).toSet.intersect(exact(q).toSet).size
    }.sum
    val possible = exact.values.map(_.size).sum
    val recall = hits.toDouble / possible
    // probing 2/16 lists of a random candidate pool would land ~12.5%
    // of true neighbors by chance; a working coarse quantizer must beat
    // that clearly
    assert(recall >= 0.25, s"recall@5 = $recall")
  }

  test("IVF is deterministic for the fixed seed") {
    assert(topk("q60_ann_ivf") == topk("q60_ann_ivf"))
  }

  test("PQ-ADC is exact on on-centroid vectors: twins retrieved at distance zero") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 4 groups × 10 EXACT duplicates, each group built from one 8-dim
    // prototype repeated across the 8 subspaces. Every subvector sits ON
    // a k-means centroid (k=16 ≥ 4 distinct points per subspace), so the
    // quantization error is zero and ADC == true squared L2: in-group
    // twins score 0.0, cross-group pairs score the true positive gap.
    val protos = Seq.tabulate(4, 8)((g, d) => if (d == g * 2) 10.0 * (g + 1) else 1.0)
    val vectors = (0 until 40).map { id =>
      val g = id / 10
      (id.toLong, Seq.fill(8)(protos(g)).flatten)
    }.toDF("vec_id", "v")
    val out = graft.ops.Quantize.pqTopK(vectors, probeMax = 40L, topK = 9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val byQuery = out.groupBy(_._1)
    assert(byQuery.size == 40)
    byQuery.foreach { case (q, rows) =>
      val group = q / 10
      val twins = rows.sortBy(_._4).map(_._2)
      assert(twins.toSet == (group * 10 until (group + 1) * 10).map(_.toLong).toSet - q,
        s"probe $q must retrieve exactly its 9 twins, got ${twins.mkString(",")}")
      assert(rows.forall(_._3 == 0.0),
        s"on-centroid twins must score ADC 0.0, got ${rows.map(_._3).mkString(",")}")
    }
    // encoding is consistent: twins share the same code word
    val cbs = graft.ops.Quantize.pqCodebooks(vectors)
    val codes = graft.ops.Quantize.pqEncode(vectors, cbs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](2)).toMap
    (0 until 40).foreach { id =>
      assert(codes(id.toLong) == codes((id / 10 * 10).toLong))
    }
    assert(codes.values.toSet.size == 4, "the 4 groups must map to 4 distinct code words")
  }

  test("PQ recall@5 on the real embeddings beats the random baseline") {
    // q27 ranks by cosine, PQ-ADC by quantized L2 — different metrics on
    // unnormalized vectors, so exact agreement is not expected; but a
    // working 8×16 quantizer must land far above the ~0.25% a random
    // 5-of-2000 pick would score. Deterministic: seeded codebooks.
    val pq = SparkEntry.queries("q173_pq_ann")(spark, Sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, rows) => q -> rows.map(_._2).toSet }
    val hits = exact.keys.toSeq.map { q =>
      pq.getOrElse(q, Set.empty[Long]).intersect(exact(q).toSet).size
    }.sum
    val recall = hits.toDouble / exact.values.map(_.size).sum
    assert(recall >= 0.2, s"PQ recall@5 = $recall")
  }

  test("PQ registry query returns well-formed deterministic rankings") {
    val pq = SparkEntry.queries("q173_pq_ann")(spark, Sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val byQ = pq.groupBy(_._1)
    assert(byQ.nonEmpty)
    byQ.values.foreach { rows =>
      val ns = rows.sortBy(_._3).map(_._2)
      assert(ns.length <= 5 && ns.distinct.length == ns.length)
    }
  }

  test("semanticDecontam flags the planted paraphrase, spares orthogonal vectors") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // eval vector e along axis 0; corpus vector 1 is a scaled near-copy
    // (cosine 1.0 → same LSH bucket by construction), corpus vector 2 is
    // orthogonal (cosine 0), corpus vector 3 is a mild rotation with
    // cosine ~0.71 — below a 0.9 bar but in a nearby bucket either way
    def vec(axis: Int, axis2: Int = -1): Seq[Double] =
      Seq.tabulate(64)(d => (if (d == axis) 1.0 else 0.0) + (if (d == axis2) 1.0 else 0.0))
    val evalSet = Seq((100L, vec(0))).toDF("vec_id", "v")
    val corpus = Seq(
      (1L, vec(0).map(_ * 3.0)),  // exact direction, different norm
      (2L, vec(7)),               // orthogonal
      (3L, vec(0, 7))             // cos = 1/√2 ≈ 0.707
    ).toDF("vec_id", "v")
    val got = Graft.semanticDecontam(corpus, evalSet, minSim = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 100L, 1.0)),
      s"only the scaled copy may be flagged, got ${got.mkString(",")}")
    // lowering the bar admits the rotation only if it shares a bucket —
    // never the orthogonal vector
    val loose = Graft.semanticDecontam(corpus, evalSet, minSim = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(loose.contains(1L) && !loose.contains(2L))
  }

  test("semDedup drops planted duplicates, keeps the lowest id, spares the rest") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // two well-separated groups; ids 1/2/3 identical, 4 a near-dup of
    // them (cos ~0.9999 after normalization), 10/11 far apart from all
    val a = Seq(1.0, 0.0, 0.0, 0.0)
    val aEps = Seq(1.0, 0.001, 0.0, 0.0)
    val b = Seq(0.0, 1.0, 0.0, 0.0)
    val c = Seq(0.0, 0.0, 1.0, 0.0)
    val docs = Seq(
      (1L, a), (2L, a), (3L, a), (4L, aEps), (10L, b), (11L, c)
    ).toDF("vec_id", "v")
    val out = Graft.semDedup(docs, k = 2, tau = 0.999).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    assert(out.size == 6)
    assert(out(1L)._2, "lowest id of the duplicate ball survives")
    assert(!out(2L)._2 && !out(3L)._2 && !out(4L)._2, "later near-identicals dropped")
    assert(out(10L)._2 && out(11L)._2, "distinct vectors untouched")
    // duplicates necessarily share a cluster for the within-cluster scan
    assert(Seq(2L, 3L, 4L).forall(i => out(i)._1 == out(1L)._1))
    intercept[IllegalArgumentException](Graft.semDedup(docs, 0, 0.9))
    intercept[IllegalArgumentException](Graft.semDedup(docs, 2, 1.5))
    intercept[IllegalArgumentException](Graft.semDedup(docs, 2, 0.9, 0))
  }

  test("knnGraph ranks planted co-directional neighbors first, excludes self and zero-norm") {
    import spark.implicits._
    // 64-dim so the md5 hyperplane bucketing is exercised for real.
    // x/y/z share a dominant direction (and, for the fixed planes, a
    // bucket — positive scaling never flips a sign, and the ±e1 nudge is
    // 10× below the dominant coordinate); id 7 is an orthogonal axis,
    // id 99 zero-norm.
    // dominant coordinate 1: every md5 hyperplane weighs it >= 0.337 in
    // magnitude while no plane weighs coordinate 0 above 0.827, so a
    // 10:1 mix can never flip a bucket sign -- co-bucketing is
    // deterministic, not probabilistic
    def axis(i: Int, s: Double): Seq[Double] = Seq.tabulate(64)(d => if (d == i) s else 0.0)
    def mix(sDom: Double, sNudge: Double): Seq[Double] =
      Seq.tabulate(64)(d => if (d == 1) sDom else if (d == 0) sNudge else 0.0)
    val docs = Seq(
      (1L, axis(1, 5.0)), (2L, mix(10.0, 1.0)), (3L, mix(10.0, -1.0)),
      (7L, axis(7, 1.0)), (99L, Seq.fill(64)(0.0))
    ).toDF("vec_id", "v")
    val rows = Graft.knnGraph(docs, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val byQ = rows.groupBy(_._1)
    // zero-norm: absent as query AND as neighbor
    assert(!byQ.contains(99L) && rows.forall(_._2 != 99L))
    // no self-neighbors, ranks well-formed and dense from 1
    rows.foreach { case (q, n, _, _) => assert(q != n) }
    byQ.values.foreach { rs =>
      assert(rs.length <= 2 && rs.map(_._4).sorted.toSeq == (1 to rs.length))
    }
    // the co-directional trio retrieves each other with the right order:
    // 1's neighbors are 2 and 3 (cos 0.995 each, tie -> lower id first)
    assert(byQ(1L).sortBy(_._4).map(_._2).toSeq == Seq(2L, 3L))
    // 2's best is 1 (0.995) before 3 (0.980); symmetric for 3
    assert(byQ(2L).sortBy(_._4).map(_._2).toSeq == Seq(1L, 3L))
    assert(byQ(3L).sortBy(_._4).map(_._2).toSeq == Seq(1L, 2L))
    intercept[IllegalArgumentException](Graft.knnGraph(docs, 0))
  }

  test("embedClusters labels the transitive chain, keeps sub-threshold and zero-norm singletons") {
    import spark.implicits._
    // y (10e0+e1) and z (10e0-e1) have cos 0.980 — BELOW the 0.99 bar —
    // but both reach x (cos 0.995): the cluster {1,2,3} exists only
    // through transitive closure, which is exactly what separates this
    // from a pair-threshold dedup. Axis-7 (cos 0 to all) and the
    // zero-norm vector stay singletons whatever bucket they land in.
    // dominant coordinate 1: every md5 hyperplane weighs it >= 0.337 in
    // magnitude while no plane weighs coordinate 0 above 0.827, so a
    // 10:1 mix can never flip a bucket sign -- co-bucketing is
    // deterministic, not probabilistic
    def axis(i: Int, s: Double): Seq[Double] = Seq.tabulate(64)(d => if (d == i) s else 0.0)
    def mix(sDom: Double, sNudge: Double): Seq[Double] =
      Seq.tabulate(64)(d => if (d == 1) sDom else if (d == 0) sNudge else 0.0)
    val docs = Seq(
      (1L, axis(1, 5.0)), (2L, mix(10.0, 1.0)), (3L, mix(10.0, -1.0)),
      (7L, axis(7, 1.0)), (99L, Seq.fill(64)(0.0))
    ).toDF("vec_id", "v")
    val out = Graft.embedClusters(docs, minSim = 0.99)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 99L -> 99L),
      s"unexpected clustering: $out")
    // sanity: at a bar above every planted similarity nothing clusters
    val strict = Graft.embedClusters(docs, minSim = 0.9999)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(strict.forall { case (id, c) => id == c })
  }

  test("semDedup bounds the pair join in a giant skewed cluster, keeps exact-dup recall") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // one giant cluster (k = 1): 600 DISTINCT vectors in a tight ball.
    // Coordinates 0-4 encode the low 5 bits of the id as ±eps (what the
    // centroid-relative sign sub-bucketing reads), coordinate 5 is the
    // dominant direction, coordinate 6 a per-id tiny unique value so no
    // two are byte-identical. Every pair has cosine ~1-1e-7 >= tau, so
    // unguarded SemDeDup would keep only id 0 via C(600,2) pairs.
    val eps = 0.001
    def vec(i: Long): Seq[Double] =
      (0 until 5).map(j => if (((i >> j) & 1L) == 1L) eps else -eps) ++
        Seq(10.0, 1e-6 * i, 0.0)
    val ball = (0L until 600L).map(i => (i, vec(i)))
    val exactDups = Seq((1000L, vec(5L)), (1001L, vec(5L)))
    val zero = Seq((2000L, Seq.fill(8)(0.0)))
    val docs = (ball ++ exactDups ++ zero).toDF("vec_id", "v")

    val maxClusterSize = 32
    val (_, bucketed, _) = ops.Similarity.semDedupPrep(docs, 1, maxClusterSize)
    val pairs = ops.Similarity.semDedupPairJoin(bucketed)
      .select(col("a.rep_id"), col("b.rep_id")).distinct().count()
    // 600 reps (the two exact dups collapse into rep 5, zero-norm is
    // excluded) split into 32 sign-buckets of ~19 -> ~5.5k candidate
    // pairs; the unguarded join would be C(600,2) = 179,700
    assert(pairs > 0 && pairs <= 12000L, s"pair join not bounded: $pairs")

    val out = Graft.semDedup(docs, k = 1, tau = 0.999, maxClusterSize = maxClusterSize)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out.size == 603)
    // exact-duplicate recall is structural (collapse happens before any
    // bucketing): the copies of id 5's vector are dropped, 5 survives
    assert(out(5L) && !out(1000L) && !out(1001L))
    // within each sign-bucket the lowest id wins -> survivors are
    // exactly ids 0..31 (one per 5-bit pattern); near-dups that
    // straddle a bucket boundary are the documented recall price
    val kept = out.filter { case (id, k) => id < 1000L && k }.keySet
    assert(kept == (0L until 32L).toSet, s"unexpected survivor set: $kept")
    // zero-norm vector has no cosine: kept as its own singleton
    assert(out(2000L))
  }

  test("knnGraph/embedClusters bound the pair join in a giant skewed LSH bucket, keep exact-dup recall") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 600 DISTINCT 64-dim vectors forced into ONE hyperplane bucket:
    // dominant coordinate 1 (every md5 plane weighs it >= 0.337 while
    // the +/-eps noise contributes <= ~0.021 — co-bucketing is
    // deterministic, not probabilistic). The low 5 id bits are planted
    // as +/-eps at the coordinates each sub-bucket band reads
    // (r = ceil(log2(602/32)) = 5, bands read 0-based coords {0..4},
    // {16..20}, {32..36}, {48..52}; coord 1 is dominant-constant so
    // band 0 is effectively 4-bit). Coordinate 9 (read by no band)
    // carries a per-id unique value so no two ball vectors are
    // byte-identical. Ids 1000/1001 are byte-identical copies of
    // vec(5); id 2000 is zero-norm.
    val eps = 0.001
    def vec(i: Long): Seq[Double] = Seq.tabulate(64) { d =>
      val j = d % 16
      if (d == 1) 10.0
      else if (d == 9) 1e-6 * i
      else if (j < 5 && (d < 5 || d >= 16)) (if (((i >> j) & 1L) == 1L) eps else -eps)
      else 0.0
    }
    val ball = (0L until 600L).map(i => (i, vec(i)))
    val docs = (ball ++ Seq((1000L, vec(5L)), (1001L, vec(5L)),
      (2000L, Seq.fill(64)(0.0)))).toDF("vec_id", "v")

    // precondition: the planted ball really is one LSH bucket
    val nb = ops.Similarity.bucketized(docs.filter(col("vec_id") < 2000L))
      .select(col("bucket")).distinct().count()
    assert(nb == 1L, s"fixture drifted: expected 1 bucket, got $nb")

    val pairs = ops.Similarity.lshPairCandidates(docs, 8, 32)
    val n = pairs.count()
    // the unguarded bucket join would be C(602,2) = 180,901 pairs;
    // the banded sign split bounds it (band 0: 16 groups of ~38 ->
    // ~11.2k pairs; bands 1-3 produce subsets of those)
    assert(n > 0 && n <= 20000L, s"pair join not bounded: $n")
    // exact-duplicate recall is structural: identical vectors share
    // every band signature, so all three copies pair up at sim 1.0
    val dupPairs = pairs.filter(col("i").isin(5L, 1000L) && col("j").isin(1000L, 1001L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(dupPairs == Set((5L, 1000L, 1.0), (5L, 1001L, 1.0), (1000L, 1001L, 1.0)),
      s"exact-dup pairs lost under the guard: $dupPairs")

    // end-to-end through the facades with the same guard engaged
    val knn = Graft.knnGraph(docs, k = 1, nPlanes = 8, maxBucketSize = 32)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // (query 5's own top-1 is id 37 — same low-5 bits, so its cosine
    // also rounds to 1.0 at 9 dp and the lower id wins the tie)
    assert(knn(1000L) == 5L && knn(1001L) == 5L && knn(5L) == 37L)
    assert(!knn.contains(2000L) && !knn.values.exists(_ == 2000L))
    val clusters = Graft.embedClusters(docs, minSim = 0.999, nPlanes = 8,
      maxBucketSize = 32).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the three identical vectors always cluster together...
    assert(clusters(1000L) == clusters(5L) && clusters(1001L) == clusters(5L))
    // ...while the guard splits the ball into >= 16 sign-groups (the
    // documented near-dup recall price of bounding the bucket)
    assert(clusters.filter(_._1 < 1000L).values.toSet.size >= 16)
    assert(clusters(2000L) == 2000L)
  }

  test("q206 provably ENGAGES the bucket guard on the real embeddings (r > 0 path, oracle-gated)") {
    import org.apache.spark.sql.functions.{col, count, lit, max}
    // engagement precondition on the real table: several 8-plane buckets
    // exceed q206's cap of 4 at sf0.001 (max bucket = 7, 23 oversized) —
    // so the adaptive pre-count in guardedBucketJoin takes the GUARDED
    // branch and the oracle hash-gates the banded centroid-sign
    // arithmetic, not the plain join (VERDICT r9 demand 3: before q206,
    // every oracle row ran with the guard structurally inert)
    val n = ops.Similarity.bucketized(
      Tables.embeddings(spark, Sf0001)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v")))
    val sizes = n.groupBy(col("bucket")).agg(count(lit(1)).as("c"))
    assert(sizes.agg(max(col("c"))).head.getLong(0) > 4L,
      "fixture drifted: no sf0.001 bucket exceeds q206's cap of 4")
    // the guard's effect is visible in the output SET: 544 guarded pairs
    // vs 579 unguarded same-bucket pairs (deterministic data → exact
    // pins), and every guarded pair is one of the unguarded ones
    val guarded = SparkEntry.queries("q206_guarded_pairs")(spark, Sf0001)
      .select(col("i"), col("j")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val unguarded = n.as("a").join(n.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unguarded.size == 579 && guarded.size == 544,
      s"guard engagement drifted: ${guarded.size} guarded of ${unguarded.size} unguarded")
    assert(guarded.subsetOf(unguarded), "guard emitted a pair outside its bucket")
  }

  test("refreshIvfAssignments: every delta case on a planted quantizer == full rebuild") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // frozen 2-list quantizer on a 2-d plane: list 0 at the origin,
    // list 1 at (10, 0)
    val cents = Seq((0, Seq(0.0, 0.0)), (1, Seq(10.0, 0.0))).toDF("list_id", "centroid")
    def assign(vs: Seq[(Long, Seq[Double])]) =
      ops.Similarity.ivfAssign(vs.toDF("vec_id", "v"), cents)
    // gen 1: 1 near list 0; 2 near list 1; 3 nearer 0; 4 EQUIDISTANT
    // (must tie-break to the lowest list_id in build AND rebuild)
    val gen1 = Seq(1L -> Seq(1.0, 0.0), 2L -> Seq(9.0, 0.0),
      3L -> Seq(4.0, 0.0), 4L -> Seq(5.0, 0.0))
    val assign1 = assign(gen1)
    assert(assign1.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap ==
      Map(1L -> 0, 2L -> 1, 3L -> 0, 4L -> 0))
    // delta: 2 removed; 3 changed and MOVES lists (4,0) → (9,0);
    // 5 added near list 1; 1 and 4 untouched
    val delta = Seq((3L, "changed", Seq(9.0, 0.0)), (2L, "removed", Seq(9.0, 0.0)),
      (5L, "added", Seq(10.0, 1.0))).toDF("vec_id", "status", "v")
    val gen2 = Seq(1L -> Seq(1.0, 0.0), 3L -> Seq(9.0, 0.0),
      4L -> Seq(5.0, 0.0), 5L -> Seq(10.0, 1.0))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1), r.getInt(2))).toSet
    val refreshed = Graft.refreshIvfAssignments(assign1, delta, cents)
    assert(rows(refreshed) == rows(assign(gen2)),
      "incrementally refreshed assignments differ from the full rebuild")
    assert(refreshed.filter(col("vec_id") === 3L).head.getInt(2) == 1,
      "changed vector kept its stale posting list")
  }

  test("refreshCentroidState: all statuses, label birth and death, == full rebuild") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // rounding-sensitive components (1/3, 1/7) so a float-subtraction
    // shortcut — instead of subtracting the QUANTIZED old contribution —
    // would miss the rebuild by a few micro-units
    val third = 1.0 / 3.0
    val seventh = 1.0 / 7.0
    val gen1 = Seq(("A", Seq(1.0, third)), ("A", Seq(3.0, -1.0)), ("B", Seq(0.5, seventh)))
      .toDF("label", "v")
    // v2 changed in place; B's only vector removed (label dies);
    // one add to A; one add to a label unseen in gen 1 (label born)
    val delta = Seq(
      (2L, "changed", "A", Seq(3.0, -1.0), Seq(2.0, 2.0)),
      (3L, "removed", "B", Seq(0.5, seventh), Seq(0.5, seventh)),
      (4L, "added", "A", Seq(0.0, 0.0), Seq(-1.0, 0.25)),
      (5L, "added", "C", Seq(0.0, 0.0), Seq(7.0, third)))
      .toDF("vec_id", "status", "label", "v_old", "v_new")
    val gen2 = Seq(("A", Seq(1.0, third)), ("A", Seq(2.0, 2.0)),
      ("A", Seq(-1.0, 0.25)), ("C", Seq(7.0, third))).toDF("label", "v")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val refreshed = Graft.refreshCentroidState(Graft.centroidState(gen1), delta)
      .select(col("label"), col("pos"), col("s_micro"), col("n"))
    assert(rows(refreshed) == rows(Graft.centroidState(gen2)
      .select(col("label"), col("pos"), col("s_micro"), col("n"))),
      "refreshed centroid state differs from the from-scratch rebuild")
    assert(refreshed.filter(col("label") === "B").isEmpty, "emptied label survived")
    assert(!refreshed.filter(col("label") === "C").isEmpty, "born label missing")
    // finalize: mu is the exact fixed-point mean
    val muA1 = Graft.centroidsFromState(refreshed)
      .filter(col("label") === "A" && col("pos") === 1).head.getDouble(3)
    assert(muA1 == (math.round(1.0 * 1048576) + math.round(2.0 * 1048576) +
      math.round(-1.0 * 1048576)) / (3 * 1048576.0))
  }

  test("frozen PQ: on-centroid twins code identically and rank first at ADC zero") {
    import spark.implicits._
    // 32 vectors, two per hash bucket (vec_id % 16): ids b and b+16 both
    // equal prototype_b, whose values are integers (exactly on the 2⁻²⁰
    // fixed-point grid) — so every bucket mean IS the prototype, every
    // vector sits ON its own bucket centroid, its codes are all b, and
    // ADC(query, twin) is exactly 0.0 while every cross-bucket pair
    // scores the true positive L2.
    def proto(b: Int): Seq[Double] =
      Seq.fill(8)(Seq.tabulate(8)(d => if (d == b % 8) (b + 1).toDouble else 0.0)).flatten
    val vectors = (0 until 32).map(id => (id.toLong, proto(id % 16))).toDF("vec_id", "v")
    val out = ops.Quantize.pqAdcFrozen(vectors, probeMax = 32L, topK = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 32)
    out.foreach { case (q, n, adc) =>
      assert(n == (q + 16) % 32, s"probe $q must rank its twin first, got $n")
      assert(adc == 0.0, s"on-centroid twin of $q must score ADC 0.0, got $adc")
    }
  }

  test("frozen PQ is invariant under input partitioning and row order") {
    import org.apache.spark.sql.functions.col
    val vectors = TestSpark.spark.read
      .parquet(s"$Sf001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    val base = rows(ops.Quantize.pqAdcFrozen(vectors, 10L, 5).orderBy(col("query_id"), col("rk")))
    val shuffled = rows(ops.Quantize.pqAdcFrozen(
      vectors.orderBy(col("vec_id").desc).repartition(7), 10L, 5)
      .orderBy(col("query_id"), col("rk")))
    assert(base == shuffled, "frozen-PQ result depends on partitioning/order")
  }

  test("frozen PQ codebook raise_errors on an incomplete bucket set") {
    import spark.implicits._
    // 8 vectors → buckets 8..15 empty; a silently short bucket list
    // would shift every later code's positional meaning
    val vectors = (0 until 8).map(id => (id.toLong, Seq.fill(64)(id.toDouble))).toDF("vec_id", "v")
    val e = intercept[Exception] {
      ops.Quantize.pqAdcFrozen(vectors, 2L, 1).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("buckets"),
      s"expected the bucket-completeness guard, got: ${e.getMessage}")
  }

  test("refreshIvfPqCodes: every delta case == full re-encode; unchanged rows pass through") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    // 32 gen-1 vectors (all 16 PQ buckets present), 2 labels. The feed:
    // vec 40 added, vec 2 removed, vec 3 changed (negated → moves list).
    def v(id: Int): Seq[Double] = {
      val label = id % 2
      val m = id % 16
      Seq.tabulate(64)(d =>
        (if (d == label) 10.0 * (label + 1) else 0.0) +
          (if (d == 10 + m / 2) (m + 1).toDouble else 0.0))
    }
    val g1 = (0 until 32).map(id => (id.toLong, v(id), id % 2)).toDF("vec_id", "v", "label")
    val cents = Graft.coarseLists(g1)
    val res1 = ops.Quantize.ivfResiduals(g1.select(col("vec_id"), col("v")), cents)
      .select(col("vec_id"), col("v"))
    val cbRow = Graft.frozenPqCodebook(res1)
    val codes1 = Graft.ivfPqEncodeStream(g1.select(col("vec_id"), col("v")), cents, cbRow)
    val delta = Seq(
      (40L, "added", v(8)),
      (2L, "removed", v(2)),
      (3L, "changed", v(3).map(-_))).toDF("vec_id", "status", "v")
    // plant a MARKER code list on an unchanged vector: recomputation
    // would erase it; pass-through keeps it
    val planted = codes1.withColumn("codes",
      org.apache.spark.sql.functions.when(col("vec_id") === 5L,
        lit(Array.fill(8)(99L))).otherwise(col("codes")))
    val got = Graft.refreshIvfPqCodes(planted, delta, cents, cbRow)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getSeq[Long](2)))).toMap
    // full re-encode of the gen-2 population under the SAME quantizers
    val g2 = (0 until 32).filter(id => id != 2 && id != 3)
      .map(id => (id.toLong, v(id))) ++ Seq(40L -> v(8), 3L -> v(3).map(-_))
    val want = Graft.ivfPqEncodeStream(g2.toDF("vec_id", "v"), cents, cbRow)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getSeq[Long](2)))).toMap
    assert(!got.contains(2L), "removed vector leaked")
    assert(got(5L)._2 == Seq.fill(8)(99L), "unchanged row was recomputed, not carried")
    assert(got.keySet == want.keySet)
    assert((got - 5L) == (want - 5L), "refresh diverged from the full re-encode")
    // the negated vector really moved coarse lists (the case that bites)
    val before = codes1.filter(col("vec_id") === 3L).head.getInt(1)
    assert(got(3L)._1 != before, "changed vector stayed on its old list")
  }

  test("IVF-PQ recall@5 beats the random baseline; rankings well-formed") {
    val ivfpq = SparkEntry.queries("q231_ivfpq_search")(spark, Sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val byQ = ivfpq.groupBy(_._1)
    assert(byQ.size == 10)
    byQ.values.foreach { rs =>
      val ns = rs.sortBy(_._3).map(_._2)
      assert(ns.length <= 5 && ns.distinct.length == ns.length)
    }
    // residual-PQ L2 vs exact cosine on unnormalized vectors, probing
    // 2/10 lists: far above the ~1% random 5-of-500 floor
    val got = byQ.map { case (q, rs) => q -> rs.map(_._2).toSet }
    val hits = exact.keys.toSeq.map(q => got.getOrElse(q, Set.empty[Long]).intersect(exact(q).toSet).size).sum
    val recall = hits.toDouble / exact.values.map(_.size).sum
    assert(recall >= 0.15, s"IVF-PQ recall@5 = $recall")
  }

}
