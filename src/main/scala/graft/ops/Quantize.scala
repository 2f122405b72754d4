package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Embedding compression for ANN serving — symmetric per-vector int8
  * scalar quantization, the storage layout vector stores ship embeddings
  * in (4 bytes/dim → 1, recall loss ≪1% for cosine search). Extends the
  * similarity family (q27-q29, q60) with the missing storage half (no
  * analog in the reference).
  *
  * Scale: pure row-local higher-order expressions — scale, codes, and
  * audit stats are computed per vector with no shuffle and no UDF, so
  * quantizing 100 TB of embeddings is a single scan-speed map stage
  * feeding the parquet sink. All arithmetic is exact-float64 (parquet
  * float32 widens losslessly; /, * and floor(x+0.5) are IEEE-identical
  * in both engines), and the published columns are integers plus the
  * raw max-abs scale (a comparison-selected input value, no arithmetic)
  * so the oracle hash is rounding-free.
  */
object Quantize {

  /** Quantize any (vec_id, embedding: array<float|double>) frame:
    * (vec_id, v: array<double>, scale, codes: array<int>) — the full
    * int8 code vector for storage/serving; the registry query derives
    * its audit report from this. */
  private[graft] def int8Of(emb: DataFrame): DataFrame = {
    val v = transform(col("embedding"), x => x.cast("double"))
    val codes = transform(col("v"), x =>
      when(col("scale") === 0, lit(0L))
        .otherwise(floor(x / col("scale") * 127.0 + 0.5)).cast("int"))
    emb
      .select(col("vec_id"), v.as("v"))
      .select(col("vec_id"), col("v"),
        array_max(transform(col("v"), x => abs(x))).as("scale"))
      .select(col("vec_id"), col("v"), col("scale"), codes.as("codes"))
  }

  /** Per-vector report over [[int8Of]]: dimension count, quantization
    * scale (max |x|), integer checksum of the int8 codes, and
    * saturation count (|code| = 127 — the clipping audit a quantization
    * rollout watches). Zero vectors quantize to all-zero codes (scale 0
    * guard). */
  val q102QuantizeEmb: Q = Q.sql(
    "q102_quantize_emb",
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |s AS (
      |  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS scale
      |  FROM e),
      |c AS (
      |  SELECT vec_id, v, scale,
      |    list_transform(v, x -> CAST(CASE WHEN scale = 0 THEN 0
      |      ELSE floor(x / scale * 127.0 + 0.5) END AS INT)) AS codes
      |  FROM s)
      |SELECT vec_id,
      |  CAST(len(v) AS BIGINT) AS n_dims,
      |  scale,
      |  CAST(list_sum(codes) AS BIGINT) AS sum_code,
      |  CAST(len(list_filter(codes, c2 -> abs(c2) = 127)) AS BIGINT) AS n_sat
      |FROM c
      |ORDER BY vec_id""".stripMargin
  ) { (s, dir) =>
    int8Of(Tables.embeddings(s, dir))
      .select(col("vec_id"),
        size(col("v")).cast("long").as("n_dims"),
        col("scale"),
        aggregate(col("codes"), lit(0L), (a, x) => a + x).as("sum_code"),
        size(filter(col("codes"), c => abs(c) === 127)).cast("long").as("n_sat"))
      .orderBy(col("vec_id"))
  }

  // --------------------------------------------------- product quantization

  /** PQ geometry: 64-dim vectors → 8 subspaces × 8 dims, 16 centroids
    * per subspace codebook → 8 nibble codes per vector (256 raw bytes →
    * 8, a 32× compression on top of which int8 [[int8Of]] is the 4×
    * path). Published method (Jégou, Douze, Schmid 2011, "Product
    * Quantization for Nearest Neighbor Search"). */
  private[graft] val PqM = 8
  private[graft] val PqSubDim = 8
  private[graft] val PqK = 16

  private def l2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, d) => acc + d)

  /** Train per-subspace codebooks (seeded KMeans, seed 30+s like q60's
    * coarse quantizer) on a (vec_id, v: array<double>) frame. The m
    * fits iterate over an m-column projection of the corpus — at 100 TB
    * codebooks train on a sample (they need ~1e5-1e6 vectors, not the
    * corpus); encoding below is the full-corpus pass. */
  private[graft] def pqCodebooks(vectors: DataFrame): Seq[Seq[Seq[Double]]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val subs = vectors.select(
      (0 until PqM).map(i =>
        slice(col("v"), i * PqSubDim + 1, PqSubDim).as(s"sub$i")): _*)
    (0 until PqM).map { i =>
      new KMeans().setK(PqK).setSeed(30 + i)
        .setFeaturesCol("f").setPredictionCol("c")
        .fit(subs.select(array_to_vector(col(s"sub$i")).as("f")))
        .clusterCenters.map(_.toArray.toSeq).toSeq
    }
  }

  /** Encode every vector against broadcast codebooks in ONE row-local
    * pass: per subspace, the argmin-L2 centroid index. The codebook is
    * a nested literal (m × k × subDim doubles ≈ 8 KB) baked into the
    * expression — no join, no shuffle, scan-speed at any corpus size. */
  private[graft] def pqEncode(vectors: DataFrame, cbs: Seq[Seq[Seq[Double]]]): DataFrame = {
    val cbLit = typedLit(cbs)
    val codes = transform(sequence(lit(0), lit(PqM - 1)), s => {
      val sub = slice(col("v"), s * PqSubDim + 1, lit(PqSubDim))
      val dists = transform(element_at(cbLit, s + 1), c => l2(sub, c))
      array_position(dists, array_min(dists)) - 1
    })
    vectors.select(col("vec_id"), col("v"), codes.as("codes"))
  }

  /** PQ-ANN via asymmetric distance computation (q173): probes carry a
    * per-subspace distance TABLE to every centroid (m × k doubles,
    * computed once per probe); each stored vector's approximate L2 is
    * then m table lookups summed through its codes — the stored vector
    * itself is never touched. Plan shape at 100 TB: the bounded probe
    * set (with tables) broadcasts, the code table streams through a
    * deliberate broadcast nested-loop join (the q27 discipline, but
    * over 8-byte codes instead of 256-byte vectors), and IVF-style list
    * pruning (q60) composes in front when even the code scan is too
    * much. ML-dependent (seeded KMeans) → non-oracle; AnnSpec plants
    * on-centroid vectors where ADC is EXACT and asserts twin retrieval
    * and the self-distance-zero invariant. */
  private[graft] def pqTopK(vectors: DataFrame, probeMax: Long, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cbs = pqCodebooks(vectors)
    val cbLit = typedLit(cbs)
    val encoded = pqEncode(vectors, cbs)
    val dt = transform(cbLit, (cbS, i) =>
      transform(cbS, c => l2(slice(col("qv"), i * PqSubDim + 1, lit(PqSubDim)), c)))
    val probes = vectors.filter(col("vec_id") < probeMax)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
      .select(col("query_id"), dt.as("dt"))
    val adc = aggregate(
      zip_with(col("dt"), col("codes"), (t, c) => element_at(t, (c + 1).cast("int"))),
      lit(0.0), (a, x) => a + x)
    val w = Window.partitionBy(col("query_id")).orderBy(col("adc"), col("neighbor_id"))
    probes
      .join(encoded, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), round(adc, 9).as("adc"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
  }

  val q173PqAnn: Q = Q.heavy("q173_pq_ann") { (s, dir) =>
    val vectors = Tables.embeddings(s, dir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    pqTopK(vectors, probeMax = 10L, topK = 5)
      .orderBy(col("query_id"), col("rk"))
  }

  val all: Seq[Q] = Seq(q102QuantizeEmb, q173PqAnn)
}
