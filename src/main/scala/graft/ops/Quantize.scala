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

  val all: Seq[Q] = Seq(q102QuantizeEmb)
}
