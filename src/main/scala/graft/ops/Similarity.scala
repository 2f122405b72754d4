package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Similarity search over the `embeddings` table (64-dim float vectors) —
  * the LLM-data-pipeline ANN family (builder prompt north star; the
  * reference has no vector search — its nearest idiom is the per-row
  * horizontal score at category_model.ipynb:152).
  *
  * Scale design (100 TB):
  *  - q27 is the exact brute-force baseline: every query × every vector.
  *    It is the CORRECTNESS reference, deliberately kept for a small,
  *    bounded query set (the probe side is tiny, so Spark broadcasts it
  *    and the candidate scan streams — no shuffle of the big side).
  *  - q28/q29 are the scale path: random-hyperplane LSH. Each vector gets
  *    an 8-bit bucket from the signs of 8 fixed hyperplane projections,
  *    turning the O(N·Q) scan into an equi-join on bucket — at 1000
  *    executors that is one hash shuffle on a key with 256 values ×
  *    whatever banding multiplicity is configured. Recall is tuned by
  *    bucket bits / multi-probe; candidates within a bucket are scored
  *    exactly.
  *  - All arithmetic is double with a left-fold accumulation order that
  *    DuckDB's list_reduce reproduces exactly; hyperplanes are md5-derived
  *    ([[Hashes.pseudoUniform]]) so the oracle rebuilds the same planes
  *    from SQL. Similarities are rounded to 9 dp on both sides before
  *    compare/output (double noise lives at ~1e-16, data distinctions at
  *    ~1e-3).
  */
object Similarity {

  import Hashes.pseudoUniform

  private val Dim = 64
  private val NPlanes = 8

  /** Default per-bucket population cap for the FULL-CORPUS pair
    * generators ([[lshPairCandidates]] → q29/q178/q179 and the
    * [[graft.Graft.knnGraph]]/[[graft.Graft.embedClusters]] facades).
    * A bucket above this size is sub-bucketed by centroid-relative
    * sign bits before any pair join (see [[lshGuardBuckets]]), so the
    * worst-case pair volume per original bucket is
    * ~bands · 2^r · (size/2^r)² instead of size². */
  private[graft] val DefaultMaxBucketSize = 4096

  /** Default within-k-means-cluster population cap for [[semDedupOf]]
    * (same guard family: above it, [[semDedupBuckets]] sub-buckets by
    * centroid-relative sign bits before the pair join). */
  private[graft] val DefaultMaxClusterSize = 4096

  /** md5-derived hyperplane `p`, deterministic and cached: planes
    * 0..nPlanes-1 are the bucketing planes the DuckDB oracle replays
    * from SQL; the number of planes is a parameter (bits must grow
    * ∝ log₂N — at 10⁹ vectors, 8 bits leave ~4M vectors per bucket,
    * which is why the facades expose `nPlanes` AND the guard exists
    * for whatever skew remains). */
  private val planeCache = scala.collection.concurrent.TrieMap.empty[Int, Array[Double]]
  private def plane(p: Int): Array[Double] =
    planeCache.getOrElseUpdate(p, Array.tabulate(Dim)(d => pseudoUniform(s"hp$p", d)))


  /** Left-fold dot product of two array<double> columns — the native
    * codegen'd [[graft.expressions.DotF64]]; bit-identical to DuckDB's
    * `list_reduce(list_transform(list_zip(a,b), p -> p[1]*p[2]), (x,y) -> x+y)`
    * and to the composed zip_with+aggregate HOF form it replaced
    * (DotF64Spec asserts both; same fold order, 0.0+x == x exactly). */
  private def dot(a: Column, b: Column): Column =
    call_function("graft_dot_f64", a, b)

  private def norm(v: Column): Column = sqrt(dot(v, v))

  /** Generic exact cosine top-k over user frames: `vectors` and
    * `queries` both carry (vec_id, v: array<double>). The query side is
    * broadcast (bounded probe sets are the exact-ANN contract — an
    * unbounded query side belongs on the LSH/IVF paths); candidates
    * stream through the scan unshuffled, then a per-query window picks
    * the top k with a deterministic (sim desc, neighbor) order. */
  private[graft] def annTopKOf(vectors: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val n = vectors.withColumn("nrm", norm(col("v")))
    val q = queries
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
      .withColumn("qn", norm(col("qv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    broadcast(q).join(n, col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"), col("vec_id").as("neighbor_id"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 9).as("sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** Exact cosine top-k for EXTERNAL queries — query ids live in their
    * own id space (a user query set, not corpus members), so there is NO
    * self-exclusion, unlike [[annTopKOf]]. `vectors` carry (vec_id, v),
    * `queries` (query_id, qv), both array<double>. Same scale discipline
    * as the q27 exact baseline: the bounded probe set broadcasts,
    * candidates stream through the scan unshuffled, and a per-query
    * window ranks by (round(sim, 9) desc, neighbor_id) — deterministic
    * across engines and partitionings. The exact leg of
    * [[graft.ops.Retrieval.hybridTopK]]. */
  private[graft] def cosineTopKExternal(vectors: DataFrame, queries: DataFrame,
                                        k: Int): DataFrame = {
    val n = vectors.withColumn("nrm", norm(col("v")))
    val q = queries.withColumn("qn", norm(col("qv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    broadcast(q).crossJoin(n)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 9).as("sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("rk").cast("long").as("rk"), col("sim"))
  }

  /** vec_id, v (array<double>), nrm. Float→double widening is exact. */
  private def vecs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))

  /** 8-bit LSH bucket: concatenated signs of the hyperplane projections. */
  private def bucket(v: Column, nPlanes: Int = NPlanes): Column =
    concat((0 until nPlanes).map(p =>
      when(dot(v, lit(plane(p))) > 0, "1").otherwise("0")): _*)

  // Lambda var deliberately NOT 'p' — it would capture the planes CTE's
  // p column in DuckDB's binder instead of the lambda argument.
  private[graft] val oracleDot =
    "list_reduce(list_transform(list_zip(%s, %s), zz -> zz[1]*zz[2]), (a,b) -> a+b)"

  /** Brute-force exact cosine top-k (k=5) for a fixed probe set
    * (vec_id < 10). The exact baseline every ANN variant is judged
    * against. Probe side is constant-size → broadcast; candidates stream. */
  val q27AnnTopk: Q = Q.sql(
    "q27_ann_topk",
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |norms AS (
       |  SELECT vec_id, v,
       |    sqrt(list_reduce(list_transform(v, x -> x*x), (a,b) -> a+b)) AS nrm
       |  FROM e),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    round(${oracleDot.format("q.v", "c.v")} / (q.nrm * c.nrm), 9) AS sim
       |  FROM norms q JOIN norms c ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id < 10),
       |ranked AS (
       |  SELECT query_id, neighbor_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rk
       |  FROM scored)
       |SELECT query_id, neighbor_id, sim, rk FROM ranked WHERE rk <= 5
       |ORDER BY query_id, rk""".stripMargin
  ) { (s, dir) =>
    val n = vecs(s, dir)
    val q = n.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    q.join(n, col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"), col("vec_id").as("neighbor_id"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 9).as("sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .orderBy(col("query_id"), col("rk"))
  }

  private def oracleBuckets: String =
    s"""planes AS (
       |  SELECT p, list(val ORDER BY d) AS pv FROM (
       |    SELECT p, d,
       |      (CAST(concat('0x', substr(md5(concat('hp', p, ':', d)), 1, 15)) AS BIGINT)
       |       % 2001 - 1000) / 1000.0 AS val
       |    FROM (SELECT unnest(range(0, $NPlanes)) AS p),
       |         (SELECT unnest(range(0, $Dim)) AS d))
       |  GROUP BY p),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |norms AS (
       |  SELECT vec_id, v,
       |    sqrt(list_reduce(list_transform(v, x -> x*x), (a,b) -> a+b)) AS nrm,
       |    (SELECT string_agg(
       |       CASE WHEN ${oracleDot.format("e.v", "pl.pv")} > 0 THEN '1' ELSE '0' END,
       |       '' ORDER BY pl.p) FROM planes pl) AS bucket
       |  FROM e)""".stripMargin

  /** LSH-bucketed ANN: top-3 within the query's hyperplane bucket. The
    * 100 TB plan shape — equi-join on the bucket key instead of a full
    * cross product; exact scoring inside the bucket. */
  val q28AnnLsh: Q = Q.sql(
    "q28_ann_lsh",
    s"""WITH $oracleBuckets,
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    round(${oracleDot.format("q.v", "c.v")} / (q.nrm * c.nrm), 9) AS sim
       |  FROM norms q JOIN norms c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
       |  WHERE q.vec_id < 10),
       |ranked AS (
       |  SELECT query_id, neighbor_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rk
       |  FROM scored)
       |SELECT query_id, neighbor_id, sim, rk FROM ranked WHERE rk <= 3
       |ORDER BY query_id, rk""".stripMargin
  ) { (s, dir) =>
    val n = vecs(s, dir).withColumn("bucket", bucket(col("v")))
    val q = n.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("bucket").as("qb"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    q.join(n, col("qb") === col("bucket") && col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"), col("vec_id").as("neighbor_id"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 9).as("sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .orderBy(col("query_id"), col("rk"))
  }

  /** Embedding-cosine near-dup: all same-bucket pairs with cosine ≥ 0.1.
    * Same LSH equi-join shape as q28 but symmetric (i<j) — the dedup
    * variant of similarity search. Exact all-pairs would be O(N²) and is
    * exactly what the bucketing avoids at scale; the threshold is low
    * because the synthetic embeddings have no true near-dups (max pair
    * cosine ≈ 0.51 across buckets). */
  val q29EmbNeardup: Q = Q.sql(
    "q29_emb_neardup",
    s"""WITH $oracleBuckets,
       |scored AS (
       |  SELECT a.vec_id AS i, c.vec_id AS j,
       |    round(${oracleDot.format("a.v", "c.v")} / (a.nrm * c.nrm), 9) AS sim
       |  FROM norms a JOIN norms c ON a.bucket = c.bucket AND a.vec_id < c.vec_id)
       |SELECT i, j, sim FROM scored WHERE sim >= 0.1
       |ORDER BY i, j""".stripMargin
  ) { (s, dir) =>
    lshPairCandidates(vecs(s, dir).select(col("vec_id"), col("v")))
      .filter(col("sim") >= 0.1)
      .orderBy(col("i"), col("j"))
  }

  /** Semantic-decontamination flag threshold. The synthetic embeddings
    * are near-orthogonal (q29's near-dup bar is 0.1; measured max
    * corpus×eval cosine at sf0.01 is 0.33), so 0.2 exercises the full
    * flag-and-rank path; production corpora run ~0.9+. */
  private[graft] val SemDecontamMinSim = 0.2

  /** Semantic decontamination (q174): the embedding-space third of the
    * decontamination family — q101/q163 catch verbatim n-gram overlap,
    * this catches PARAPHRASED eval leakage those can't see. Every
    * corpus vector sharing an LSH bucket with an eval vector is scored
    * by exact cosine; vectors with a match ≥ threshold are flagged with
    * their best-matching eval id (ties → lowest id).
    *
    * Scale: eval benchmarks are thousands of vectors — the eval side
    * (with buckets) BROADCASTS, so the corpus streams through a
    * broadcast equi-join on the bucket key and never shuffles; the only
    * exchanges are the flagged-matches window (|matches|, tiny) and the
    * final ORDER BY. The same md5-derived hyperplanes as q28/q29 keep
    * the oracle replaying the exact bucketing from SQL. */
  val q174SemanticDecontam: Q = Q.sql(
    "q174_semantic_decontam",
    s"""WITH $oracleBuckets,
       |ev AS (SELECT vec_id AS eval_id, v AS evv, nrm AS en, bucket
       |       FROM norms WHERE vec_id % 20 = 0),
       |co AS (SELECT * FROM norms WHERE vec_id % 20 <> 0),
       |scored AS (
       |  SELECT co.vec_id, ev.eval_id,
       |    round(${oracleDot.format("co.v", "ev.evv")} / (co.nrm * ev.en), 9) AS sim
       |  FROM co JOIN ev USING (bucket)),
       |ranked AS (
       |  SELECT vec_id, eval_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, eval_id) AS rk
       |  FROM scored WHERE sim >= $SemDecontamMinSim)
       |SELECT vec_id, eval_id, sim FROM ranked WHERE rk = 1
       |ORDER BY vec_id""".stripMargin
  ) { (s, dir) =>
    val n = vecs(s, dir).withColumn("bucket", bucket(col("v")))
    semanticDecontamOf(
      n.filter(col("vec_id") % 20 =!= 0),
      n.filter(col("vec_id") % 20 === 0), SemDecontamMinSim)
      .orderBy(col("vec_id"))
  }

  /** Factored form over pre-bucketed (vec_id, v, nrm, bucket) frames —
    * the facade bucketizes arbitrary corpora/eval sets itself. */
  private[graft] def semanticDecontamOf(corpus: DataFrame, evalSet: DataFrame,
                                        minSim: Double): DataFrame = {
    val ev = evalSet.select(col("vec_id").as("eval_id"), col("v").as("evv"),
      col("nrm").as("en"), col("bucket"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("eval_id"))
    corpus.join(broadcast(ev), Seq("bucket"))
      .select(col("vec_id"), col("eval_id"),
        round(dot(col("v"), col("evv")) / (col("nrm") * col("en")), 9).as("sim"))
      .filter(col("sim") >= minSim)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("eval_id"), col("sim"))
  }

  /** Bucketize an arbitrary (vec_id, v: array<double>) frame for
    * [[semanticDecontamOf]] — norms + the md5-derived hyperplane
    * bucket. */
  private[graft] def bucketized(vectors: DataFrame,
                                nPlanes: Int = NPlanes): DataFrame = {
    // same bound as guardedBucketJoin — callers reaching bucketized()
    // directly (semanticDecontam) must not slip an nPlanes <= 0 through:
    // zero planes would give every vector the empty-string bucket and
    // turn the candidate join into a full cross join instead of erroring
    require(nPlanes >= 1 && nPlanes <= 24,
      s"nPlanes must be in [1, 24], got $nPlanes")
    vectors.select(col("vec_id"), col("v"))
      .withColumn("nrm", norm(col("v")))
      .withColumn("bucket", bucket(col("v"), nPlanes))
  }

  /** Bucket-size guard for the FULL-CORPUS pair generators — the same
    * oversized-group machinery as [[semDedupBuckets]], applied to the
    * hyperplane buckets: any bucket above `maxBucketSize` is split by
    * the signs of its vectors' coordinates relative to the BUCKET
    * centroid — r = ceil(log2(size/maxBucketSize)) bits (≤
    * [[SubBucketBits]]), replicated over [[SubBucketBands]] bands
    * reading different coordinate offsets, OR-combined by the
    * downstream FIRST-AGREEING-BAND filter (each pair is emitted only
    * at the lowest band whose sigs match — the `nearDupStream`
    * exactly-once trick, so no pair-set dedup shuffle exists).
    * Identical vectors share every sig in
    * every band (exact-dup recall is structural); near-identical pairs
    * can straddle a sign boundary in all bands — the documented recall
    * price of bounding a bucket the caller's `nPlanes` failed to
    * bound. Buckets at or under the cap keep one band with sig 0 (the
    * plain q28-shaped equi-join, byte-identical results — the oracle
    * never sees the guard at verify scale).
    *
    * Scale: bucket sizes come from `groupBy("bucket").count()` — a
    * map-side-combined aggregate of ≤ 2^nPlanes rows joined back as a
    * PLAIN equi-join (AQE broadcasts it) — NOT a window over the bucket
    * key, which would funnel each bucket's full population, including
    * the giant skewed bucket the guard exists for, through a single
    * window task (and cost a full-corpus exchange: measured +1.7s on
    * q29 at sf0.1 with zero oversized buckets, VERDICT r9 #2). The
    * centroid subtree sits BEHIND a semi-join on the oversized-bucket
    * list, so with no oversized bucket the corpus streams through a
    * hash probe and the 64× posexplode never runs. Centroid sign
    * comparisons are in q79's fixed-point discipline (micro-unit int64
    * sums — exactly associative, so sub-bucket membership is
    * partition-order-deterministic; a double avg() could flip a sign
    * bit within FP noise across runs).
    * Input/output: (vec_id, v, nrm, bucket) → + (band, sig,
    * sigs: array of every band's sig for the first-band filter). */
  private[graft] def lshGuardBuckets(n: DataFrame, maxBucketSize: Int): DataFrame = {
    val sizes = n.groupBy(col("bucket")).agg(count(lit(1)).as("__graft_bsz"))
      .withColumn("__graft_r", subBucketBits(col("__graft_bsz"), maxBucketSize))
    // per-oversized-bucket centroid, dimension-agnostic (posexplode →
    // per-coordinate fixed-point mean → re-assembled in coordinate
    // order); the semi-join keeps the explode off the common path, and
    // micro-unit quantization (round(x·2²⁰) as int64 — q79's recipe)
    // makes the mean independent of partition/accumulation order
    val mus = n.join(sizes.filter(col("__graft_r") > 0).select(col("bucket")),
        Seq("bucket"), "left_semi")
      .select(col("bucket"), posexplode(col("v")))
      .groupBy(col("bucket"), col("pos"))
      .agg((sum(round(col("col") * 1048576).cast("long")) /
        count(lit(1))).as("__graft_mx"))
      .groupBy(col("bucket"))
      .agg(collect_list(struct(col("pos"), col("__graft_mx"))).as("__graft_dm"))
      .select(col("bucket"),
        transform(array_sort(col("__graft_dm")), s => s.getField("__graft_mx")).as("mu"))
    // all band sigs at once (before the band explode) so every row can
    // carry the full array for the downstream first-agreeing-band
    // filter; bit terms short-circuit on j >= r and never touch `mu`
    // when r = 0 (mu is null there — the left join found no centroid)
    def sigFor(band: Int): Column = (0 until SubBucketBits).map { j =>
      val idx = (pmod(lit(band * SubBucketBits + j), size(col("v"))) + 1).cast("int")
      when(lit(j) < col("__graft_r") &&
        round(element_at(col("v"), idx) * 1048576).cast("long").cast("double") >
          element_at(col("mu"), idx),
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    n.join(sizes, Seq("bucket"))
      .join(mus, Seq("bucket"), "left")
      .withColumn("sigs",
        when(col("__graft_r") > 0, array((0 until SubBucketBands).map(sigFor): _*))
          .otherwise(array(lit(0L))))
      .withColumn("band",
        explode(when(col("__graft_r") > 0,
          lit((0 until SubBucketBands).toArray)).otherwise(array(lit(0)))))
      .select(col("vec_id"), col("v"), col("nrm"), col("bucket"),
        col("band"), element_at(col("sigs"), col("band") + 1).as("sig"),
        col("sigs"))
  }

  /** The guarded bucket self-join every full-corpus generator shares —
    * ADAPTIVE at plan-construction time (VERDICT/ADVICE r9): one cheap
    * driver-side pre-count (a map-side-combined `groupBy("bucket")
    * .count()`, ≤ 2^nPlanes rows, `.isEmpty` after the cap filter)
    * decides whether ANY bucket exceeds `maxBucketSize`.
    *
    *  - Common case (no oversized bucket — every oracle run at verify
    *    scale): the PLAIN q28 equi-join on the bucket key. No sizes
    *    join, no centroid subtree, no band machinery riding the big
    *    shuffle — r8's plan shape, plus one aggregate-only pre-pass.
    *  - Skewed case: [[lshGuardBuckets]] sub-buckets the oversized
    *    buckets; pairs join on (bucket, band, sig) and bands are
    *    OR-combined WITHOUT a distinct — a pair agreeing in several
    *    bands is emitted only at its lowest agreeing band (no earlier
    *    band's sigs match, checked against the carried `sigs` arrays —
    *    the `nearDupStream` exactly-once trick), so the pair set needs
    *    no dedup shuffle.
    *
    * In both branches the two join sides are aliases of ONE frame, so
    * the canonically-equal shuffle children collapse to a single
    * exchange (ReuseExchange) — one corpus pass feeds both sides.
    * The pre-count is an eager job (the one hand-rolled adaptive step
    * in this file — the same move AQE makes at runtime, taken at the
    * driver because the choice changes the PLAN, not a partition
    * strategy); at 100 TB it is one aggregate-only corpus pass, paid
    * to keep band/sig columns out of the pair shuffle the other 99%
    * of runs. Zero-norm vectors carry no cosine, excluded up front.
    *
    * BLOCK-LIFETIME CONTRACT (ADVICE r14, shared by every API that
    * returns a LAZY frame over a localCheckpoint — ivfPqSearch,
    * refreshComponents, refreshDecontamSpans): the returned frame reads
    * the bucketed-norm frame's checkpoint blocks, so they cannot be
    * released here. They stay pinned until the caller drops every
    * derived frame and unpersists (the Bench sweeps
    * `getPersistentRDDs.values.foreach(_.unpersist())` between
    * bursts). A long-lived session calling these APIs in a loop must
    * sweep between calls or blocks accumulate for the session's life —
    * the r10 leak mode documented at [[Components.releaseBlocks]]. */
  private def guardedBucketJoin(vectors: DataFrame, nPlanes: Int, maxBucketSize: Int)
                               (keep: (Column, Column) => Column): DataFrame = {
    require(nPlanes >= 1 && nPlanes <= 24,
      s"nPlanes must be in [1, 24], got $nPlanes")
    require(maxBucketSize >= 1, s"maxBucketSize must be >= 1, got $maxBucketSize")
    // checkpoint the bucketed-norm frame ONCE (r14): the pre-count is an
    // eager pass over it anyway, and downstream it fans into the size
    // aggregate, the centroid aggregate (skewed branch), and both join
    // sides — each re-deriving the scan + projections otherwise (the
    // self-join's exchange dedups, but everything below the first
    // exchange re-ran per reference)
    val rel = Components.sessionReliable(vectors)
    if (rel) Components.requireCheckpointDir(vectors)
    val n = Components.materialize(vectors.select(col("vec_id"), col("v"))
      .withColumn("nrm", norm(col("v")))
      .filter(col("nrm") > 0)
      .withColumn("bucket", bucket(col("v"), nPlanes)), rel)
    val anyOversized = !n.groupBy(col("bucket")).agg(count(lit(1)).as("__graft_bsz"))
      .filter(col("__graft_bsz") > maxBucketSize).isEmpty
    val pairCols = (extra: Column) => Seq(
      col("l.bucket") === col("r.bucket"),
      keep(col("l.vec_id"), col("r.vec_id")), extra).reduce(_ && _)
    val scored = (j: DataFrame) => j.select(
      col("l.vec_id").as("i"), col("r.vec_id").as("j"),
      round(dot(col("l.v"), col("r.v")) / (col("l.nrm") * col("r.nrm")), 9).as("sim"))
    if (!anyOversized) {
      scored(n.as("l").join(n.as("r"), pairCols(lit(true))))
    } else {
      val g = lshGuardBuckets(n, maxBucketSize)
      val firstAgreeingBand = not(exists(
        zip_with(slice(col("l.sigs"), lit(1), col("l.band")),
          slice(col("r.sigs"), lit(1), col("r.band")), (x, y) => x === y),
        b => b))
      scored(g.as("l").join(g.as("r"),
          pairCols(col("l.band") === col("r.band") && col("l.sig") === col("r.sig")))
        .filter(firstAgreeingBand))
    }
  }

  /** Unordered candidate pairs (i < j, sim) from the guarded bucket
    * join — the generator q29, q179 and [[graft.Graft.embedClusters]]
    * share. With no oversized bucket this is exactly the q29 8-plane
    * equi-join (band 0 / sig 0, the first-band filter vacuous). */
  private[graft] def lshPairCandidates(vectors: DataFrame, nPlanes: Int = NPlanes,
                                       maxBucketSize: Int = DefaultMaxBucketSize): DataFrame =
    guardedBucketJoin(vectors, nPlanes, maxBucketSize)(_ < _)

  /** IVF-style ANN (the other classic scale path beside q28's LSH):
    * a KMeans(16, seed 30) coarse quantizer assigns every vector to an
    * inverted list; each query probes its 2 nearest centroids and ranks
    * exact cosine only within those lists. At 100 TB this is the
    * FAISS-IVF plan shape on a cluster: centroids are tiny and
    * broadcast, the probe turns the scan into an equi-join on list_id,
    * and recall/cost is tuned by nlist/nprobe. ML-dependent (KMeans) →
    * non-oracle; AnnSpec measures recall@5 against the exact q27. */
  val q60AnnIvf: Q = Q.heavy("q60_ann_ivf") { (s, dir) =>
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    val e = vecs(s, dir).withColumn("mlVec", array_to_vector(col("v")))
    val km = new KMeans().setK(16).setSeed(30)
      .setFeaturesCol("mlVec").setPredictionCol("list_id").fit(e)
    val indexed = km.transform(e)
    val centroids = km.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray)
    }.toSeq
    val centroidDf = s.createDataFrame(centroids).toDF("list_id", "centroid")
    // each query probes its 2 nearest centroids (L2 to centroid)
    val qSide = indexed.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val l2 = aggregate(
      zip_with(col("qv"), col("centroid"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, d) => acc + d)
    val probeW = Window.partitionBy(col("query_id")).orderBy(col("dist"), col("list_id"))
    val probes = qSide.crossJoin(broadcast(centroidDf)) // 16 rows — constant
      .withColumn("dist", l2)
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= 2)
      .select(col("query_id"), col("qv"), col("qn"), col("list_id"))
    val rankW = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    probes
      .join(indexed, Seq("list_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 9).as("sim"))
      .withColumn("rk", row_number().over(rankW))
      .filter(col("rk") <= 5)
      .orderBy(col("query_id"), col("rk"))
  }

  /** Per-label centroids (mean pooling) — the vector-average primitive
    * behind IVF coarse-quantizer training and cluster profiling. Float
    * summation is evaluation-order-dependent, so a raw SUM(float) would
    * violate the determinism contract on a 1000-executor shuffle; each
    * component is instead quantized to fixed-point (round(x·2²⁰) — the
    * float→double widening and the product are exact, HALF_UP matches
    * DuckDB's round-half-away-from-zero) and summed as int64, making the
    * aggregate partition-order-independent and the oracle bit-exact. The
    * mean divides two exact integers in double — deterministic. Shuffle
    * volume: one 4-long row per label after map-side combine. */
  val q79LabelCentroids: Q = Q.sql(
    "q79_label_centroids",
    """SELECT label, COUNT(*) AS n,
      |  CAST(SUM(CAST(round(CAST(embedding[1] AS DOUBLE) * 1048576) AS BIGINT)) AS BIGINT) / (COUNT(*) * 1048576.0) AS c1,
      |  CAST(SUM(CAST(round(CAST(embedding[2] AS DOUBLE) * 1048576) AS BIGINT)) AS BIGINT) / (COUNT(*) * 1048576.0) AS c2,
      |  CAST(SUM(CAST(round(CAST(embedding[3] AS DOUBLE) * 1048576) AS BIGINT)) AS BIGINT) / (COUNT(*) * 1048576.0) AS c3,
      |  CAST(SUM(CAST(round(CAST(embedding[4] AS DOUBLE) * 1048576) AS BIGINT)) AS BIGINT) / (COUNT(*) * 1048576.0) AS c4
      |FROM embeddings
      |GROUP BY label
      |ORDER BY label""".stripMargin
  ) { (s, dir) =>
    def fx(k: Int): Column =
      sum(round(element_at(col("embedding"), k).cast("double") * 1048576).cast("long"))
    Tables.embeddings(s, dir)
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n"),
        (fx(1) / (count(lit(1)) * 1048576.0)).as("c1"),
        (fx(2) / (count(lit(1)) * 1048576.0)).as("c2"),
        (fx(3) / (count(lit(1)) * 1048576.0)).as("c3"),
        (fx(4) / (count(lit(1)) * 1048576.0)).as("c4"))
      .orderBy(col("label"))
  }

  /** ±1 signs for the 8×64 Johnson–Lindenstrauss projection matrix,
    * md5-derived (parity of the 60-bit digest prefix) so both engines
    * rebuild the identical matrix. */
  private val jlSigns: Seq[Array[Long]] = (0 until NPlanes).map { j =>
    Array.tabulate(Dim) { i =>
      if (java.lang.Long.parseLong(
        Hashes.md5Hex(s"jl:$j:$i").substring(0, 15), 16) % 2 == 0) 1L else -1L
    }
  }

  /** Johnson–Lindenstrauss random projection: 64-dim float embeddings →
    * 8-dim int64 sketches via a fixed ±1 sign matrix (Achlioptas'
    * database-friendly variant — signs instead of Gaussians, so the
    * projection is exact integer arithmetic after quantization).
    * Components are quantized to milli-units first (`floor(x·1000)` —
    * float→double is exact, ×1000 is one correctly-rounded IEEE op, so
    * the quantization is bit-identical on any engine), then each output
    * dim is an int64 dot product — exact, order-independent, overflow-
    * safe (|q_i| ≤ 10⁶ ⇒ |p_j| ≤ 6.4·10⁷ ≪ 2⁶³).
    *
    * Scale: row-local map over the scan — no shuffle, no UDF (all
    * higher-order built-ins, codegen-friendly); the 8-long sketch is
    * 64 B/row vs 256 B for the float vector, the standard first stage
    * before a Hamming/L1 filter or a cheaper ANN index. */
  /** JL ±1 projection of any (vec_id, embedding: array<float>) frame to
    * 8 int64 sketch dims — see [[q131JlProjection]] for the contract. */
  private[graft] def jlProjectOf(vectors: DataFrame): DataFrame =
    vectors
      .select(col("vec_id"),
        transform(col("embedding"), x => floor(x.cast("double") * 1000)).as("q"))
      .select(col("vec_id") +: (0 until NPlanes).map { j =>
        aggregate(
          zip_with(col("q"), typedLit(jlSigns(j).toSeq), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as(s"p$j")
      }: _*)

  val q131JlProjection: Q = {
    val sqlDims = (0 until NPlanes).map { j =>
      val lst = jlSigns(j).mkString("[", ",", "]")
      s"  CAST(list_sum(list_transform(range(1, ${Dim + 1}), i -> q[i] * ($lst)[i])) AS BIGINT) AS p$j"
    }.mkString(",\n")
    Q.sql(
      "q131_jl_projection",
      s"""WITH qv AS (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
         |  FROM embeddings)
         |SELECT vec_id,
         |$sqlDims
         |FROM qv ORDER BY vec_id""".stripMargin
    ) { (s, dir) =>
      jlProjectOf(Tables.embeddings(s, dir)).orderBy(col("vec_id"))
    }
  }

  /** Hard-negative mining — for each probe, the MOST SIMILAR vector
    * with a DIFFERENT label: the contrastive-training data op (hard
    * negatives are what make embedding models discriminate; random
    * negatives are too easy). Same exact-cosine machinery as q27 with
    * the label-inequality condition and k = 1.
    *
    * Scale: bounded probe set broadcast, candidates stream unshuffled
    * through the scan, per-probe top-1 via the deterministic window.
    * For unbounded probe sets this composes with the LSH/IVF candidate
    * generators exactly like q28/q60. */
  val q153HardNegatives: Q = Q.sql(
    "q153_hard_negatives",
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |norms AS (
       |  SELECT vec_id, label, v,
       |    sqrt(list_reduce(list_transform(v, x -> x*x), (a,b) -> a+b)) AS nrm
       |  FROM e),
       |scored AS (
       |  SELECT q.vec_id AS query_id, q.label AS query_label,
       |    c.vec_id AS neighbor_id, c.label AS neg_label,
       |    round(${oracleDot.format("q.v", "c.v")} / (q.nrm * c.nrm), 9) AS sim
       |  FROM norms q JOIN norms c ON c.label <> q.label
       |  WHERE q.vec_id < 10),
       |ranked AS (
       |  SELECT query_id, query_label, neighbor_id, neg_label, sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rk
       |  FROM scored)
       |SELECT query_id, query_label, neighbor_id, neg_label, sim
       |FROM ranked WHERE rk = 1
       |ORDER BY query_id""".stripMargin
  ) { (s, dir) =>
    val n = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))
    val q = n.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("label").as("query_label"),
        col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    broadcast(q).join(n, col("label") =!= col("query_label"))
      .select(col("query_id"), col("query_label"),
        col("vec_id").as("neighbor_id"), col("label").as("neg_label"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 9).as("sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("query_id"), col("query_label"), col("neighbor_id"),
        col("neg_label"), col("sim"))
      .orderBy(col("query_id"))
  }

  /** SemDeDup — semantic deduplication in embedding space (Abbas et
    * al. 2023: k-means-cluster the embeddings, then drop near-identical
    * neighbors WITHIN each cluster). Complements the lexical family:
    * q24 catches byte dups, q25/q26 word-overlap dups; this catches
    * paraphrases and re-encodings that share no tokens.
    *
    * Policy (deterministic given the fitted model): a vector is dropped
    * iff some LOWER-id vector in its cluster has cosine ≥ τ — the
    * paper's keep-one-per-ε-ball greedy sweep with id order as the scan
    * order. Emits every vector with (cluster, kept). Zero-norm vectors
    * have no cosine and are kept as singletons.
    *
    * Scale: k-means clusters only bound the pair search if k grows with
    * the corpus — SemDeDup in practice runs k ≈ N/⟨target cluster
    * size⟩ (the paper uses 50k clusters for ~100M embeddings). The
    * caller owns k; `maxClusterSize` is the in-engine guard for the
    * clusters that end up oversized anyway (skew, or a lazily chosen
    * k): exact-duplicate vectors are first collapsed to one
    * representative (so an all-identical giant cluster costs one
    * group-by, not |c|² pairs), and any cluster still above the bound
    * is sub-bucketed by banded centroid-relative sign bits before the
    * pair join (see [[semDedupBuckets]]). ML-dependent (seeded KMeans)
    * → non-oracle; AnnSpec plants exact duplicates plus a giant skewed
    * cluster and asserts survivor policy + bounded candidate pairs. */
  val q167SemDedup: Q = Q.heavy("q167_semdedup") { (s, dir) =>
    semDedupOf(vecs(s, dir).select(col("vec_id"), col("v")), 16, 0.999)
      .orderBy(col("vec_id"))
  }

  /** q226: the SemDeDup SWEEP oracle-gated under a FROZEN quantizer —
    * q167's 11-round spec-only gap closed with the q209/q219 move.
    * q167 itself stays the fitted-KMeans path (AnnSpec's planted
    * duplicates keep gating it); here the quantizer is deterministic —
    * per-label fixed-point centroids (exact int64 micro-unit sums /
    * count, q79's discipline) — so DuckDB derives it bit-identically
    * and replays the ENTIRE downstream semantics: nearest-centroid
    * assignment (c·c − 2·v·c left folds, ties to lowest list),
    * exact-duplicate collapse (min vec_id per (cluster, v)), the
    * within-cluster cosine ≥ τ pair probe, the lower-id-survives
    * sweep, and zero-norm singleton passthrough.
    *
    * The corpus plants each failure mode: every vec_id % 10 = 3 vector
    * recurs as an EXACT copy at vec_id + 100000 (must collapse onto
    * its rep — same v ⇒ same argmin ⇒ same cluster, structurally), one
    * all-zeros vector (999999) exercises the no-cosine branch, and
    * τ = 0.3 sits inside the real within-cluster cosine range at both
    * sf0.01 and sf0.1 (measured: max within-label cosine 0.34 / 0.45),
    * so genuine non-identical pairs drive kept = false through the τ
    * path too. maxClusterSize is lifted to 2^20 so the oversized-
    * cluster sub-bucket guard — separately gated by q206 + AnnSpec —
    * never engages and the oracle's plain within-cluster join is
    * exactly the engine's candidate set. */
  val q226SemDedupFrozen: Q = Q.sql(
    "q226_semdedup_frozen",
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
       |corpus AS (
       |  SELECT vec_id, v FROM e
       |  UNION ALL SELECT vec_id + 100000, v FROM e WHERE vec_id % 10 = 3
       |  UNION ALL SELECT 999999, list_transform(range(1, ${Dim + 1}), x -> 0.0)),
       |cents AS (
       |  SELECT label, pos.pos AS pos,
       |    CAST(SUM(CAST(round(v[pos.pos] * 1048576) AS BIGINT)) AS BIGINT)
       |      / (COUNT(*) * 1048576.0) AS mu
       |  FROM e, (SELECT unnest(range(1, ${Dim + 1})) AS pos) pos
       |  GROUP BY label, pos.pos),
       |clists AS (
       |  SELECT label AS list_id, list(mu ORDER BY pos) AS centroid
       |  FROM cents GROUP BY label),
       |scored AS (
       |  SELECT corpus.vec_id, c.list_id,
       |    ${oracleDot.format("c.centroid", "c.centroid")}
       |      - 2.0 * ${oracleDot.format("corpus.v", "c.centroid")} AS d
       |  FROM corpus, clists c),
       |best AS (
       |  SELECT vec_id, list_id,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, list_id) AS rn
       |  FROM scored),
       |asg AS (
       |  SELECT corpus.vec_id, corpus.v, b.list_id AS cluster,
       |    sqrt(${oracleDot.format("corpus.v", "corpus.v")}) AS nrm
       |  FROM corpus JOIN best b ON b.vec_id = corpus.vec_id AND b.rn = 1),
       |m AS (
       |  SELECT vec_id, v, nrm, cluster,
       |    MIN(vec_id) OVER (PARTITION BY cluster, v) AS rep_id
       |  FROM asg WHERE nrm > 0),
       |r AS (SELECT rep_id, v, nrm, cluster FROM m WHERE vec_id = rep_id),
       |dropped AS (
       |  SELECT DISTINCT b.rep_id
       |  FROM r a JOIN r b ON a.cluster = b.cluster AND a.rep_id < b.rep_id
       |  WHERE round(${oracleDot.format("a.v", "b.v")} / (a.nrm * b.nrm), 9) >= 0.3)
       |SELECT vec_id, cluster, kept FROM (
       |  SELECT m.vec_id, m.cluster,
       |    (m.vec_id = m.rep_id AND d.rep_id IS NULL) AS kept
       |  FROM m LEFT JOIN dropped d ON d.rep_id = m.rep_id
       |  UNION ALL
       |  SELECT vec_id, cluster, TRUE AS kept FROM asg WHERE nrm = 0)
       |ORDER BY vec_id""".stripMargin
  ) { (s, dir) =>
    val emb = Tables.embeddings(s, dir).select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"), col("label"))
    // frozen quantizer: per-label fixed-point centroids (q209's recipe);
    // materialized below (k-row grain) so the assignment and the
    // sub-bucket centers read one evaluation of the posexplode pass
    val cents0 = emb.select(col("label"), posexplode(col("v")))
      .groupBy(col("label"), col("pos"))
      .agg((sum(round(col("col") * 1048576).cast("long")) /
        (count(lit(1)) * lit(1048576.0))).as("mu"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("mu")))),
        s2 => s2.getField("mu")).as("centroid"))
      .select(col("label").cast("int").as("list_id"), col("centroid"))
    val corpus = emb.select(col("vec_id"), col("v"))
      .unionByName(emb.filter(col("vec_id") % 10 === 3)
        .select((col("vec_id") + 100000L).as("vec_id"), col("v")))
      .unionByName(s.range(1).select(lit(999999L).as("vec_id"),
        array_repeat(lit(0.0), Dim).as("v")))
    // checkpoint the assignment frame ONCE (r14): it fans into the
    // zero-norm branch, the rep window, and (through reps) the bucket
    // machinery and the sweep's member join — each re-ran the
    // per-label centroid aggregation + argmin assignment over the
    // corpus otherwise (32 static scans). cents rides inside the one
    // materialized evaluation; centers reads it back at k-row grain.
    val __rel = Components.sessionReliable(emb)
    if (__rel) Components.requireCheckpointDir(emb)
    val cents = Components.materialize(cents0, __rel)
    val indexed = Components.materialize(ivfAssign(corpus, cents)
      .withColumn("nrm", norm(col("v")))
      .select(col("vec_id"), col("v"), col("nrm"), col("list_id").as("cluster")), __rel)
    val centers = cents.select(col("list_id").as("cluster"), col("centroid").as("mu"))
    val (members, bucketed, zeroNorm) = semDedupPrepAssigned(indexed, centers, 1 << 20)
    semDedupSweep(members, bucketed, zeroNorm, tau = 0.3)
      .orderBy(col("vec_id"))
  }

  /** Bits per band / bands for the oversized-cluster sub-bucketing. */
  private val SubBucketBits = 16

  /** r = ceil(log2(size / maxSize)) in PURE int64 arithmetic — the
    * first k with size ≤ maxSize · 2^k, capped at [[SubBucketBits]].
    * Deliberately not a float log: at a power-of-2 boundary (size =
    * 2·maxSize) an ln-ratio in one engine and a libm log2 in the other
    * can land on either side of the integer and ceil() apart, changing
    * the sub-bucketing — integer comparisons replay bit-exactly in the
    * DuckDB oracle (q206). */
  private def subBucketBits(groupSize: Column, maxSize: Int): Column =
    (0 until SubBucketBits).foldRight(lit(SubBucketBits): Column) { (k, acc) =>
      when(groupSize <= lit(maxSize.toLong << k), lit(k)).otherwise(acc)
    }.cast("int")

  /** The DuckDB replay of [[subBucketBits]] — same integer CASE chain. */
  private def oracleSubBits(sizeExpr: String, maxSize: Int): String =
    (0 until SubBucketBits).foldRight(s"$SubBucketBits") { (k, acc) =>
      s"CASE WHEN $sizeExpr <= ${maxSize.toLong << k} THEN $k ELSE $acc END"
    }
  private val SubBucketBands = 4

  /** Sub-bucket representatives for the within-cluster pair join:
    * (rep_id, v, nrm, cluster, band, sig). Clusters with ≤
    * `maxClusterSize` reps keep one band with sig 0 (the plain
    * within-cluster join). An oversized cluster is split by the signs
    * of its vectors' coordinates relative to the cluster centroid —
    * r = ceil(log2(size/maxClusterSize)) bits (≤ [[SubBucketBits]]),
    * replicated over [[SubBucketBands]] bands reading different
    * coordinate offsets, OR-combined by the downstream distinct. Two
    * IDENTICAL vectors always share every sig (exact-dup recall is
    * structural); near-identical pairs can straddle a sign boundary in
    * all bands — that recall loss is the documented price of bounding
    * a cluster the caller's k failed to bound. Sizes and centroids are
    * ≤ k rows → broadcast; reps never shuffle here. */
  private[graft] def semDedupBuckets(reps: DataFrame, centers: DataFrame,
                                     maxClusterSize: Int): DataFrame = {
    val sizes = reps.groupBy(col("cluster"))
      .agg(count(lit(1)).as("__graft_csz"))
      .withColumn("__graft_r", subBucketBits(col("__graft_csz"), maxClusterSize))
    val sized = reps.join(broadcast(sizes), Seq("cluster"))
    val small = sized.filter(col("__graft_csz") <= maxClusterSize)
      .select(col("rep_id"), col("v"), col("nrm"), col("cluster"),
        lit(0).as("band"), lit(0L).as("sig"))
    val dimIdx = (j: Int) =>
      (pmod(col("band") * lit(SubBucketBits) + lit(j), size(col("v"))) + 1).cast("int")
    val sig = (0 until SubBucketBits).map { j =>
      when(lit(j) < col("__graft_r") &&
        element_at(col("v"), dimIdx(j)) > element_at(col("mu"), dimIdx(j)),
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val big = sized.filter(col("__graft_csz") > maxClusterSize)
      .join(broadcast(centers), Seq("cluster"))
      .withColumn("band", explode(lit((0 until SubBucketBands).toArray)))
      .select(col("rep_id"), col("v"), col("nrm"), col("cluster"),
        col("band"), sig.as("sig"))
    small.unionByName(big)
  }

  /** The candidate pair frame the cosine filter runs over: bucketed
    * reps self-joined on (cluster, band, sig) with a.rep_id < b.rep_id.
    * Exposed at pair grain so AnnSpec can assert the oversized-cluster
    * guard actually bounds the volume. */
  private[graft] def semDedupPairJoin(bucketed: DataFrame): DataFrame =
    bucketed.as("a").join(bucketed.as("b"),
      col("a.cluster") === col("b.cluster") && col("a.band") === col("b.band") &&
        col("a.sig") === col("b.sig") && col("a.rep_id") < col("b.rep_id"))

  /** The post-assignment half of SemDeDup prep, shared by the fitted
    * ([[semDedupPrep]]) and frozen ([[q226SemDedupFrozen]]) paths:
    * `indexed` carries (vec_id, v, nrm, cluster), `centers` (cluster,
    * mu) for the oversized-cluster sub-bucketing. Returns (member rows
    * with rep_id, bucketed reps, zero-norm output rows). */
  private[graft] def semDedupPrepAssigned(indexed: DataFrame, centers: DataFrame,
                                          maxClusterSize: Int): (DataFrame, DataFrame, DataFrame) = {
    val zeroNorm = indexed.filter(col("nrm") === 0)
      .select(col("vec_id"), col("cluster"), lit(true).as("kept"))
    val members = indexed.filter(col("nrm") > 0)
      .withColumn("rep_id",
        min(col("vec_id")).over(Window.partitionBy(col("cluster"), col("v"))))
    val reps = members.filter(col("vec_id") === col("rep_id"))
      .select(col("rep_id"), col("v"), col("nrm"), col("cluster"))
    (members, semDedupBuckets(reps, centers, maxClusterSize), zeroNorm)
  }

  /** The SemDeDup sweep over prepped frames: a representative is
    * dropped iff some lower-id rep in its (cluster, band, sig) bucket
    * has cosine ≥ τ; members collapse onto their rep; zero-norm rows
    * ride through as kept singletons. Output: (vec_id, cluster, kept). */
  private[graft] def semDedupSweep(members: DataFrame, bucketed: DataFrame,
                                   zeroNorm: DataFrame, tau: Double): DataFrame = {
    val dropped = semDedupPairJoin(bucketed)
      .filter(round(dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")), 9)
        >= tau)
      .select(col("b.rep_id").as("rep_id")).distinct()
    members
      .join(dropped.withColumn("hit", lit(true)), Seq("rep_id"), "left")
      .select(col("vec_id"), col("cluster"),
        (col("vec_id") === col("rep_id") && coalesce(!col("hit"), lit(true)))
          .as("kept"))
      .unionByName(zeroNorm)
  }

  /** (member rows with rep_id, bucketed reps, zero-norm output rows) —
    * the shared prep for [[semDedupOf]] and the AnnSpec volume guard. */
  private[graft] def semDedupPrep(vectors: DataFrame, k: Int,
                                  maxClusterSize: Int): (DataFrame, DataFrame, DataFrame) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.ml.stat.Summarizer
    val e = vectors.withColumn("nrm", norm(col("v")))
      .withColumn("mlVec", array_to_vector(col("v")))
    // Spark ML KMeans requires k > 1; k == 1 is the degenerate
    // single-cluster fit (centroid = global mean), done without ML
    val (indexed, centerRows) = if (k == 1) {
      val mu = e.select(Summarizer.mean(col("mlVec")).as("mu")).first()
        .getAs[org.apache.spark.ml.linalg.Vector](0)
      (e.select(col("vec_id"), col("v"), col("nrm"), lit(0).as("cluster")),
        Seq((0, mu.toArray.toSeq)))
    } else {
      val km = new KMeans().setK(k).setSeed(30)
        .setFeaturesCol("mlVec").setPredictionCol("cluster").fit(e)
      (km.transform(e).select(col("vec_id"), col("v"), col("nrm"), col("cluster")),
        km.clusterCenters.toIndexedSeq.zipWithIndex
          .map { case (c, i) => (i, c.toArray.toSeq) })
    }
    val centers = vectors.sparkSession.createDataFrame(centerRows)
      .toDF("cluster", "mu")
    semDedupPrepAssigned(indexed, centers, maxClusterSize)
  }

  /** Generic form over (vec_id, v: array<double>): (vec_id, cluster,
    * kept) with at most one member kept per ε-ball per cluster (recall
    * caveats for oversized clusters: see [[semDedupBuckets]]). */
  private[graft] def semDedupOf(vectors: DataFrame, k: Int, tau: Double,
                                maxClusterSize: Int = DefaultMaxClusterSize): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(tau > 0 && tau <= 1, s"tau must be in (0, 1], got $tau")
    require(maxClusterSize >= 1, s"maxClusterSize must be >= 1, got $maxClusterSize")
    val (members, bucketed, zeroNorm) = semDedupPrep(vectors, k, maxClusterSize)
    semDedupSweep(members, bucketed, zeroNorm, tau)
  }

  /** k-NN graph over an arbitrary (vec_id, v: array<double>) frame:
    * for EVERY vector, its top-`k` same-LSH-bucket neighbors by exact
    * cosine — (query_id, neighbor_id, sim, rk). The all-vectors twin of
    * [[annTopKOf]] (whose probe side must stay bounded/broadcastable):
    * here BOTH sides are the full corpus, so the candidate generator is
    * the q28 equi-join on the hyperplane bucket — one hash shuffle per
    * side on the bucket key — and the per-query top-k is a window over
    * same-bucket candidates only. Vectors whose bucket holds no other
    * vector have no neighbors and are absent (an LSH recall property,
    * not a bug — multi-probe or fewer bits densifies).
    *
    * Scale: bucket population ≈ N/2^bits must stay bounded, so bits
    * (planes) must grow ∝ log₂N exactly like SemDeDup's k ∝ N — the
    * caller owns `nPlanes`; `maxBucketSize` is the IN-ENGINE guard for
    * the buckets that end up oversized anyway (skew, or a lazily
    * chosen plane count): [[lshGuardBuckets]] sub-buckets them by
    * banded centroid-relative sign bits before the pair join, bounding
    * the per-bucket join at ~bands · 2^r · (size/2^r)² pairs. Zero-norm
    * vectors carry no cosine and are excluded from both sides. */
  private[graft] def knnGraphOf(vectors: DataFrame, k: Int, nPlanes: Int = NPlanes,
                                maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    guardedBucketJoin(vectors, nPlanes, maxBucketSize)(_ =!= _)
      .select(col("i").as("query_id"), col("j").as("neighbor_id"), col("sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** q178: the k-NN graph on the embeddings table (k = 3). Unlike
    * q27/q28 (bounded probe set < 10), every vector is a query — the
    * construction that feeds graph-based near-dup clustering (q179),
    * kNN-graph visualization, and agglomerative semantic clustering. */
  val q178KnnGraph: Q = Q.sql(
    "q178_knn_graph",
    s"""WITH $oracleBuckets,
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    round(${oracleDot.format("q.v", "c.v")} / (q.nrm * c.nrm), 9) AS sim
       |  FROM norms q JOIN norms c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rk
       |  FROM scored)
       |SELECT query_id, neighbor_id, sim, rk FROM ranked WHERE rk <= 3
       |ORDER BY query_id, rk""".stripMargin
  ) { (s, dir) =>
    knnGraphOf(vecs(s, dir).select(col("vec_id"), col("v")), 3)
      .orderBy(col("query_id"), col("rk"))
  }

  /** Embedding near-dup clusters: same-LSH-bucket pairs at cosine ≥
    * `minSim` (q29's pair generator) become an undirected graph whose
    * connected components are the semantic clusters — every vector gets
    * (vec_id, cluster) with cluster = min member id; unpaired vectors
    * are their own singletons. The graph-transitive twin of [[semDedupOf]]:
    * SemDeDup drops within-k-means-cluster neighbors greedily, this
    * labels the full transitive closure (A≈B≈C cluster together even
    * when cos(A,C) < τ) with no ML dependency — so it oracle-checks.
    *
    * Scale: candidates come from [[lshPairCandidates]] — the caller
    * owns `nPlanes` (bits ∝ log₂N) and `maxBucketSize` bounds whatever
    * bucket skew remains (see [[lshGuardBuckets]]); the CC loop is
    * [[Components.connectedComponents]] — O(log diameter) rounds with
    * path doubling, checkpointed; components exist only for paired
    * vectors, so the (id, label) map is duplication-bounded — but NOT
    * bounded by construction (a 50%-dup corpus makes it corpus-scale),
    * so the map-back is a PLAIN left equi-join and AQE picks broadcast
    * when the map is actually small. */
  private[graft] def embedClustersOf(vectors: DataFrame, minSim: Double,
                                     nPlanes: Int = NPlanes,
                                     maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    val pairs = lshPairCandidates(vectors, nPlanes, maxBucketSize)
      .filter(col("sim") >= minSim)
      .select(col("i"), col("j"))
    val comps = Components.connectedComponents(pairs)
      .select(col("id").as("__graft_cc_id"), col("label").as("__graft_cc_label"))
    vectors.select(col("vec_id"))
      .join(comps, col("vec_id") === col("__graft_cc_id"), "left")
      .select(col("vec_id"),
        coalesce(col("__graft_cc_label"), col("vec_id")).as("cluster"))
  }

  /** q179: embedding clusters on the embeddings table at the q29
    * near-dup bar (0.1 — the synthetic vectors are near-orthogonal).
    * The oracle replays bucketing → pairs → transitive closure via the
    * same recursive CTE as the lexical q72. */
  val q179EmbedClusters: Q = Q.sql(
    "q179_embed_clusters",
    s"""WITH RECURSIVE $oracleBuckets,
       |scored AS (
       |  SELECT a.vec_id AS i, c.vec_id AS j,
       |    round(${oracleDot.format("a.v", "c.v")} / (a.nrm * c.nrm), 9) AS sim
       |  FROM norms a JOIN norms c ON a.bucket = c.bucket AND a.vec_id < c.vec_id),
       |np AS (SELECT i, j FROM scored WHERE sim >= 0.1),
       |edges AS (SELECT i AS src, j AS dst FROM np UNION SELECT j, i FROM np),
       |reach AS (
       |  SELECT src AS id, src AS r FROM edges
       |  UNION
       |  SELECT e2.dst, reach.r FROM reach JOIN edges e2 ON e2.src = reach.id),
       |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
       |SELECT e.vec_id, coalesce(c.component, e.vec_id) AS cluster
       |FROM e LEFT JOIN comp c ON c.id = e.vec_id
       |ORDER BY e.vec_id""".stripMargin
  ) { (s, dir) =>
    embedClustersOf(vecs(s, dir).select(col("vec_id"), col("v")), 0.1)
      .orderBy(col("vec_id"))
  }

  /** q206: the LSH bucket-size guard with the guard ENGAGED — q29's
    * pair generator at a deliberately tiny `maxBucketSize` = 4 (the
    * sf0.01 embeddings put up to 9 vectors in one 8-plane bucket, so
    * several buckets sub-bucket at r ∈ {1, 2}). Emits EVERY candidate
    * pair (no sim floor), so each keep/drop decision the banded
    * centroid-sign machinery makes is visible in the output set and
    * hash-gated by the oracle — which replays the whole path in SQL:
    * integer-chain r ([[oracleSubBits]]), fixed-point micro-unit
    * centroids, the 4×16 band sigs, and the agree-in-some-band pair
    * filter (EXISTS replaces the engine's first-agreeing-band
    * multiplicity trick — same SET either way). VERDICT r9 demand 3:
    * before this row, the r > 0 branch was spec-gated only; the 186
    * oracle rows all ran with the guard structurally inert. */
  val q206GuardedPairs: Q = Q.sql(
    "q206_guarded_pairs",
    s"""WITH $oracleBuckets,
       |sizes AS (SELECT bucket, count(*) AS bsz FROM norms GROUP BY bucket),
       |rs AS (SELECT bucket, bsz, ${oracleSubBits("bsz", 4)} AS r FROM sizes),
       |mus AS (
       |  SELECT n.bucket, pos.pos,
       |    SUM(CAST(round(n.v[pos.pos] * 1048576) AS BIGINT)) / COUNT(*) AS mu
       |  FROM norms n JOIN rs ON rs.bucket = n.bucket AND rs.r > 0,
       |       (SELECT unnest(range(1, ${Dim + 1})) AS pos) pos
       |  GROUP BY n.bucket, pos.pos),
       |sigs AS (
       |  SELECT n.vec_id, n.bucket, bj.band,
       |    SUM(CASE WHEN bj.jj < rs.r AND
       |        CAST(CAST(round(n.v[bj.band * $SubBucketBits + bj.jj + 1] * 1048576)
       |          AS BIGINT) AS DOUBLE) > m.mu
       |      THEN CAST(pow(2.0, bj.jj) AS BIGINT) ELSE 0 END) AS sig
       |  FROM norms n
       |  JOIN rs ON rs.bucket = n.bucket AND rs.r > 0,
       |       (SELECT b.band, j.jj
       |        FROM (SELECT unnest(range(0, $SubBucketBands)) AS band) b,
       |             (SELECT unnest(range(0, $SubBucketBits)) AS jj) j) bj
       |  JOIN mus m ON m.bucket = n.bucket
       |    AND m.pos = bj.band * $SubBucketBits + bj.jj + 1
       |  GROUP BY n.vec_id, n.bucket, bj.band),
       |cands AS (
       |  SELECT a.vec_id AS i, c.vec_id AS j
       |  FROM norms a JOIN norms c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
       |  JOIN rs ON rs.bucket = a.bucket WHERE rs.r = 0
       |  UNION ALL
       |  SELECT DISTINCT sa.vec_id AS i, sc.vec_id AS j
       |  FROM sigs sa JOIN sigs sc ON sa.bucket = sc.bucket
       |    AND sa.band = sc.band AND sa.sig = sc.sig AND sa.vec_id < sc.vec_id)
       |SELECT p.i, p.j,
       |  round(${oracleDot.format("a.v", "c.v")} / (a.nrm * c.nrm), 9) AS sim
       |FROM cands p JOIN norms a ON a.vec_id = p.i JOIN norms c ON c.vec_id = p.j
       |WHERE a.nrm > 0 AND c.nrm > 0
       |ORDER BY i, j""".stripMargin
  ) { (s, dir) =>
    lshPairCandidates(vecs(s, dir).select(col("vec_id"), col("v")), 8, 4)
      .orderBy(col("i"), col("j"))
  }

  /** Nearest-centroid (coarse-quantizer) assignment of vectors to IVF
    * posting lists — the shared step of index BUILD and index REFRESH.
    * `centroids` is (list_id, centroid: array<double>), k rows (a coarse
    * quantizer is small by design — k ∝ √N even at 100 TB). Scalable
    * shape: the centroids collapse to ONE row (struct array sorted by
    * list_id, broadcast via the 1-row cross-join idiom) and the argmin
    * is a row-local fold over that array — the corpus is NEVER shuffled;
    * assignment is a map-only pass. Distance uses the c·c − 2·v·c
    * expansion (the v·v term is constant per vector and cannot change
    * the argmin), each dot the codegen'd left fold
    * [[graft.expressions.DotF64]], so DuckDB replays the floats
    * bit-identically (q209); ties break to the lowest list_id (the fold
    * replaces only on strictly smaller d over the sorted array). */
  private[graft] def ivfAssign(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val cs = centroids
      .select(struct(
        col("list_id").cast("int").as("list_id"),
        col("centroid"),
        call_function("graft_dot_f64", col("centroid"), col("centroid")).as("cc")).as("c"))
      .agg(sort_array(collect_list(col("c"))).as("cs"))
    val scored = transform(col("cs"), c => struct(
      (c.getField("cc") -
        lit(2.0) * call_function("graft_dot_f64", col("v"), c.getField("centroid"))).as("d"),
      c.getField("list_id").as("list_id")))
    val best = aggregate(scored,
      struct(lit(Double.MaxValue).as("d"), lit(Int.MaxValue).as("list_id")),
      (acc, sc) => when(sc.getField("d") < acc.getField("d"), sc).otherwise(acc))
    vectors.crossJoin(broadcast(cs))
      .select(col("vec_id"), col("v"), best.getField("list_id").as("list_id"))
  }

  /** Incremental IVF posting-list maintenance — the ANN-family member of
    * the incremental-ingest set (q205 delta → q207 band index → q208
    * closure → THIS): `assignments` is the stored (vec_id, v, list_id)
    * table, `delta` a (vec_id, status, v) change feed, `centroids` the
    * FROZEN coarse quantizer (production IVF adds/removes under a fixed
    * quantizer and retrains it offline when drift warrants). Removed and
    * changed rows anti-join out; added and changed vectors are assigned
    * by [[ivfAssign]] from their NEW embedding only — work ∝ |delta|,
    * and the delta assignment is the same shuffle-free map-only pass as
    * a full build. q209 proves refreshed == a from-scratch gen-2
    * assignment against the DuckDB replay. */
  def refreshIvfAssignments(assignments: DataFrame, delta: DataFrame,
                            centroids: DataFrame): DataFrame = {
    val drop = delta.filter(col("status").isin("removed", "changed"))
      .select(col("vec_id"))
    val fresh = delta.filter(col("status").isin("added", "changed"))
      .select(col("vec_id"), col("v"))
    assignments.join(drop, Seq("vec_id"), "left_anti")
      .unionByName(ivfAssign(fresh, centroids))
  }

  /** q209: [[refreshIvfAssignments]] oracle-gated — the ENGINE refreshes
    * a gen-1 IVF assignment table incrementally (drop removed/changed,
    * [[ivfAssign]] the delta under the frozen quantizer), while the
    * ORACLE assigns the whole gen-2 corpus from scratch: a stale row, a
    * leaked removed vector, or a changed vector left on its old list all
    * break the hash. The quantizer is deterministic so both engines
    * derive it bit-identically: per-label gen-1 centroids in q79's
    * fixed-point discipline (exact int64 micro-unit sums / count).
    * Generations: gen 1 lacks every 7th vector (→ added), gen 2 drops
    * every 6th (→ removed) and NEGATES every 5th's embedding
    * (→ changed — negation is exact in IEEE, so both engines see the
    * same moved vector; it lands on a different list than its original).
    * Distances replay the engine's c·c − 2·v·c left folds via
    * list_reduce; ties go to the lowest list_id in both. */
  val q209IvfRefresh: Q = Q.sql(
    "q209_ivf_refresh",
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
       |g1 AS (SELECT vec_id, v, label FROM e WHERE vec_id % 7 <> 0),
       |g2 AS (SELECT vec_id,
       |         CASE WHEN vec_id % 5 = 0 THEN list_transform(v, x -> -x) ELSE v END AS v
       |       FROM e WHERE vec_id % 6 <> 0),
       |cents AS (
       |  SELECT label, pos.pos AS pos,
       |    CAST(SUM(CAST(round(v[pos.pos] * 1048576) AS BIGINT)) AS BIGINT)
       |      / (COUNT(*) * 1048576.0) AS mu
       |  FROM g1, (SELECT unnest(range(1, ${Dim + 1})) AS pos) pos
       |  GROUP BY label, pos.pos),
       |clists AS (
       |  SELECT label AS list_id, list(mu ORDER BY pos) AS centroid
       |  FROM cents GROUP BY label),
       |scored AS (
       |  SELECT g2.vec_id, c.list_id,
       |    ${oracleDot.format("c.centroid", "c.centroid")}
       |      - 2.0 * ${oracleDot.format("g2.v", "c.centroid")} AS d
       |  FROM g2, clists c),
       |best AS (
       |  SELECT vec_id, list_id,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, list_id) AS rn
       |  FROM scored)
       |SELECT vec_id, list_id FROM best WHERE rn = 1
       |ORDER BY vec_id""".stripMargin
  ) { (s, dir) =>
    val emb = Tables.embeddings(s, dir).select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"), col("label"))
    val g1 = emb.filter(col("vec_id") % 7 =!= 0)
    // gen-1 per-label centroids, q79 fixed point → exact, oracle-equal
    val cents = g1.select(col("label"), posexplode(col("v")))
      .groupBy(col("label"), col("pos"))
      .agg((sum(round(col("col") * 1048576).cast("long")) /
        (count(lit(1)) * lit(1048576.0))).as("mu"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("mu")))),
        s2 => s2.getField("mu")).as("centroid"))
      .select(col("label").cast("int").as("list_id"), col("centroid"))
    val assign1 = ivfAssign(g1.select(col("vec_id"), col("v")), cents)
    // the change feed, by the same generation rules the oracle derives
    // g2 from; v carries the NEW (gen-2) embedding for added/changed
    val delta = emb
      .withColumn("status",
        when(col("vec_id") % 7 === 0 && col("vec_id") % 6 =!= 0, lit("added"))
          .when(col("vec_id") % 6 === 0 && col("vec_id") % 7 =!= 0, lit("removed"))
          .when(col("vec_id") % 6 =!= 0 && col("vec_id") % 5 === 0, lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("status") =!= "unchanged")
      .select(col("vec_id"), col("status"),
        when(col("vec_id") % 5 === 0, transform(col("v"), x => -x))
          .otherwise(col("v")).as("v"))
    refreshIvfAssignments(assign1, delta, cents)
      .select(col("vec_id"), col("list_id"))
      .orderBy(col("vec_id"))
  }

  /** Per-label centroid SUFFICIENT STATISTICS in q79's fixed-point
    * discipline: one (label, pos, s_micro, n) row per label×dimension,
    * where s_micro = Σ round(v[pos]·2²⁰) as int64 and n = the label's
    * vector count. Exact integer state — mergeable, refreshable, and
    * partition-order-independent by construction (the float-mean
    * problem q79 solves, carried into STORED state). `pos` is 1-based
    * to match SQL array indexing. Scale: one map-side-combined
    * aggregation, shuffle ∝ |labels|·dim rows (the state grain), never
    * the corpus. */
  private[graft] def centroidState(vectors: DataFrame): DataFrame =
    vectors
      .select(col("label"), posexplode(col("v")))
      .groupBy(col("label"), (col("pos") + 1).as("pos"))
      .agg(sum(round(col("col") * 1048576).cast("long")).as("s_micro"),
        count(lit(1)).as("n"))

  /** Incremental refresh of a stored [[centroidState]] from a CDC-style
    * change feed with before/after images: `delta` is (vec_id, status,
    * label, v_old, v_new). Removed/changed rows SUBTRACT their old
    * quantized contribution; added/changed rows ADD their new one —
    * because the state is exact int64 sums, subtraction removes exactly
    * what was added (floats can't promise that) and the refreshed state
    * is bit-equal to a from-scratch rebuild (q211's hash gate). Work ∝
    * |delta|·dim aggregated map-side, then one join at the state grain
    * (|labels|·dim rows) — the corpus is never touched. Labels whose
    * count reaches zero drop out, matching the rebuild. */
  def refreshCentroidState(state: DataFrame, delta: DataFrame): DataFrame = {
    val oldSide = delta.filter(col("status").isin("removed", "changed"))
      .select(col("label"), posexplode(col("v_old")))
      .select(col("label"), (col("pos") + 1).as("pos"),
        (-round(col("col") * 1048576).cast("long")).as("dq"), lit(-1L).as("dn"))
    val newSide = delta.filter(col("status").isin("added", "changed"))
      .select(col("label"), posexplode(col("v_new")))
      .select(col("label"), (col("pos") + 1).as("pos"),
        round(col("col") * 1048576).cast("long").as("dq"), lit(1L).as("dn"))
    val d = oldSide.unionByName(newSide)
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("dq")).as("ds"), sum(col("dn")).as("dnn"))
    state.join(d, Seq("label", "pos"), "full_outer")
      .select(col("label"), col("pos"),
        (coalesce(col("s_micro"), lit(0L)) + coalesce(col("ds"), lit(0L))).as("s_micro"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dnn"), lit(0L))).as("n"))
      .filter(col("n") > 0)
  }

  /** Finalize a [[centroidState]] to per-label centroids:
    * (label, pos, n, mu) with mu = s_micro / (n·2²⁰) — q79's exact-
    * operand division (s_micro stays ≤ 2⁵³ while n·|v|·2²⁰ does; at
    * larger corpora drop one scale factor, same caveat as q79/q132). */
  def centroidsFromState(state: DataFrame): DataFrame =
    state.select(col("label"), col("pos"), col("n"),
      (col("s_micro") / (col("n") * lit(1048576.0))).as("mu"))

  /** q211: [[refreshCentroidState]] oracle-gated — the ENGINE builds the
    * gen-1 centroid state, refreshes it through the q209 generation
    * rules' change feed (every 7th vector added, every 6th removed,
    * every 5th's embedding negated = changed, with before AND after
    * images), and finalizes; the ORACLE computes gen-2 centroids from
    * scratch. Both paths are exact int64 arithmetic plus one identical
    * division, so a stale contribution, a double-counted change, or a
    * leaked removed vector shifts s_micro and breaks the hash. */
  val q211CentroidRefresh: Q = Q.sql(
    "q211_centroid_refresh",
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
       |g2 AS (SELECT vec_id, label,
       |         CASE WHEN vec_id % 5 = 0 THEN list_transform(v, x -> -x) ELSE v END AS v
       |       FROM e WHERE vec_id % 6 <> 0)
       |SELECT label, pos.pos AS pos, COUNT(*) AS n,
       |  CAST(SUM(CAST(round(v[pos.pos] * 1048576) AS BIGINT)) AS BIGINT)
       |    / (COUNT(*) * 1048576.0) AS mu
       |FROM g2, (SELECT unnest(range(1, ${Dim + 1})) AS pos) pos
       |GROUP BY label, pos.pos
       |ORDER BY label, pos""".stripMargin
  ) { (s, dir) =>
    val emb = Tables.embeddings(s, dir).select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"), col("label"))
    val g1 = emb.filter(col("vec_id") % 7 =!= 0)
    val state1 = centroidState(g1.select(col("label"), col("v")))
    val delta = emb
      .withColumn("status",
        when(col("vec_id") % 7 === 0 && col("vec_id") % 6 =!= 0, lit("added"))
          .when(col("vec_id") % 6 === 0 && col("vec_id") % 7 =!= 0, lit("removed"))
          .when(col("vec_id") % 6 =!= 0 && col("vec_id") % 5 === 0, lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("status") =!= "unchanged")
      .select(col("vec_id"), col("status"), col("label"),
        col("v").as("v_old"),
        when(col("vec_id") % 5 === 0, transform(col("v"), x => -x))
          .otherwise(col("v")).as("v_new"))
    centroidsFromState(refreshCentroidState(state1, delta))
      .orderBy(col("label"), col("pos"))
  }

  /** q219: the IVF SEARCH path oracle-gated — q60's probe/rank shape
    * under a FROZEN deterministic quantizer so DuckDB can replay it
    * bit-exactly (the q209 move, applied to search: q60 itself stays
    * the KMeans-trained variant, recall-gated by AnnSpec). Quantizer =
    * the per-label fixed-point centroids (exact int64 micro-unit sums /
    * count — both engines derive them bit-identically); every vector is
    * assigned by [[ivfAssign]]'s c·c − 2·v·c left fold; each query
    * (vec_id < 10) probes its 2 nearest centroids by the same fold and
    * ranks exact cosine only within the probed posting lists, top-5
    * with the (sim desc, neighbor_id) tiebreak. The oracle replays
    * quantizer → assignment → probe → within-list cosine end to end:
    * a wrong posting list, a probe ranking drift, or a leaked
    * out-of-list candidate all break the hash.
    *
    * Scale shape (identical to q60): centroids broadcast (k rows),
    * assignment is map-only, the probe turns the corpus scan into an
    * equi-join on list_id — cost ∝ probed lists, not corpus. */
  val q219IvfSearch: Q = Q.sql(
    "q219_ivf_search",
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
       |cents AS (
       |  SELECT label, pos.pos AS pos,
       |    CAST(SUM(CAST(round(v[pos.pos] * 1048576) AS BIGINT)) AS BIGINT)
       |      / (COUNT(*) * 1048576.0) AS mu
       |  FROM e, (SELECT unnest(range(1, ${Dim + 1})) AS pos) pos
       |  GROUP BY label, pos.pos),
       |clists AS (
       |  SELECT label AS list_id, list(mu ORDER BY pos) AS centroid
       |  FROM cents GROUP BY label),
       |ascored AS (
       |  SELECT e.vec_id, c.list_id,
       |    ${oracleDot.format("c.centroid", "c.centroid")}
       |      - 2.0 * ${oracleDot.format("e.v", "c.centroid")} AS d
       |  FROM e, clists c),
       |assigned AS (
       |  SELECT vec_id, list_id FROM (
       |    SELECT vec_id, list_id,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, list_id) AS rn
       |    FROM ascored) WHERE rn = 1),
       |norms AS (
       |  SELECT vec_id, v,
       |    sqrt(list_reduce(list_transform(v, x -> x*x), (a,b) -> a+b)) AS nrm
       |  FROM e),
       |qs AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn
       |       FROM norms WHERE vec_id < 10),
       |probes AS (
       |  SELECT query_id, qv, qn, list_id FROM (
       |    SELECT q.query_id, q.qv, q.qn, c.list_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
       |        ${oracleDot.format("c.centroid", "c.centroid")}
       |          - 2.0 * ${oracleDot.format("q.qv", "c.centroid")}, c.list_id) AS pr
       |    FROM qs q, clists c) WHERE pr <= 2),
       |scored AS (
       |  SELECT p.query_id, n.vec_id AS neighbor_id,
       |    round(${oracleDot.format("p.qv", "n.v")} / (p.qn * n.nrm), 9) AS sim
       |  FROM probes p
       |  JOIN assigned a ON a.list_id = p.list_id
       |  JOIN norms n ON n.vec_id = a.vec_id
       |  WHERE n.vec_id <> p.query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rk
       |  FROM scored)
       |SELECT query_id, neighbor_id, sim, rk FROM ranked WHERE rk <= 5
       |ORDER BY query_id, rk""".stripMargin
  ) { (s, dir) =>
    val emb = Tables.embeddings(s, dir).select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"), col("label"))
    // frozen quantizer: per-label fixed-point centroids (q209's derivation)
    val cents = centroidsFromState(centroidState(emb.select(col("label"), col("v"))))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("mu")))),
        s2 => s2.getField("mu")).as("centroid"))
      .select(col("label").cast("int").as("list_id"), col("centroid"))
    val assigned = ivfAssign(emb.select(col("vec_id"), col("v")), cents)
      .withColumn("nrm", norm(col("v")))
    val qSide = assigned.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val cc = dot(col("centroid"), col("centroid"))
    val probeW = Window.partitionBy(col("query_id")).orderBy(col("d"), col("list_id"))
    val probes = qSide.crossJoin(broadcast(cents)) // k rows — constant
      .withColumn("d", cc - lit(2.0) * dot(col("qv"), col("centroid")))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= 2)
      .select(col("query_id"), col("qv"), col("qn"), col("list_id"))
    val rankW = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    probes
      .join(assigned, Seq("list_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 9).as("sim"))
      .withColumn("rk", row_number().over(rankW))
      .filter(col("rk") <= 5)
      .orderBy(col("query_id"), col("rk"))
  }

  val all: Seq[Q] = Seq(q27AnnTopk, q28AnnLsh, q29EmbNeardup, q60AnnIvf, q79LabelCentroids,
    q131JlProjection, q153HardNegatives, q167SemDedup, q174SemanticDecontam,
    q178KnnGraph, q179EmbedClusters, q206GuardedPairs, q209IvfRefresh, q211CentroidRefresh,
    q219IvfSearch, q226SemDedupFrozen)
}
