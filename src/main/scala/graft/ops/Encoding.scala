package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Categorical feature encodings — the model-ready rewrites of a
  * high-cardinality string column that a training-data pipeline computes
  * at corpus scale (extends the reference's StringIndexer/one-hot idiom,
  * MLP.ipynb:150-168, to the statistics-based encoders tree models and
  * tabular DL actually consume).
  *
  * Scale design (100 TB): every encoder reduces the fact table to a
  * CATEGORY-grain statistics table first (one map-side-combined
  * aggregation), broadcasts it back, and derives the per-row feature
  * with row-local arithmetic — the scan itself never shuffles, and a
  * hot category is just a hot aggregate key that partial aggregation
  * absorbs.
  */
object Encoding {

  import Relational.dec

  /** Leave-one-out smoothed target encoding of `cat` against `target`
    * (smoothing m, prior = global target mean), plus the frequency
    * encoding n/N — the two statistics-based categorical features.
    * LOO removes the row's own target from its category mean
    * (`(Σ_g − x_i + prior·m)/(n_g − 1 + m)`), the standard
    * leakage-control for target encodings fit on the training split.
    *
    * Determinism: both sums are exact DECIMAL(18,2) (well under 2⁵³
    * when scaled, so the double casts are exact); everything after is
    * correctly-rounded IEEE arithmetic on identical inputs, rounded to
    * 6 dp on output (q68's contract). */
  private[graft] def targetEncodeLoo(df: DataFrame, cat: String, target: String,
                                     m: Int = 10): DataFrame = {
    require(m >= 1,
      "smoothing must be >= 1: it is also what keeps a single-member category's " +
        "LOO denominator (n - 1 + m) away from zero")
    val g = df.groupBy(col(cat)).agg(
      count(lit(1)).as("__graft_n"),
      sum(dec(col(target))).cast("double").as("__graft_s"))
    val tot = df.agg(
      sum(dec(col(target))).cast("double").as("__graft_gs"),
      count(lit(1)).as("__graft_gn"))
    df.join(broadcast(g), cat)
      .crossJoin(broadcast(tot))
      .withColumn("loo_enc",
        round((col("__graft_s") - col(target)
          + (col("__graft_gs") / col("__graft_gn")) * m)
          / (col("__graft_n") - 1 + m), 6))
      .withColumn("freq_enc",
        round(col("__graft_n").cast("double") / col("__graft_gn"), 6))
      .drop("__graft_n", "__graft_s", "__graft_gs", "__graft_gn")
  }

  /** Registry entry: event_type target-encoded against value. */
  val q138TargetEncode: Q = Q.sql(
    "q138_target_encode",
    """WITH g AS (
      |  SELECT event_type, COUNT(*) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s
      |  FROM events GROUP BY event_type),
      |tot AS (
      |  SELECT CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS gs,
      |    COUNT(*) AS gn
      |  FROM events)
      |SELECT e.event_id, e.event_type,
      |  round((g.s - e.value + (t.gs / t.gn) * 10) / (g.n - 1 + 10), 6) AS loo_enc,
      |  round(CAST(g.n AS DOUBLE) / t.gn, 6) AS freq_enc
      |FROM events e JOIN g USING (event_type) CROSS JOIN tot t
      |ORDER BY e.event_id""".stripMargin
  ) { (s, dir) =>
    targetEncodeLoo(
      Tables.events(s, dir).select(col("event_id"), col("event_type"), col("value")),
      "event_type", "value")
      .select(col("event_id"), col("event_type"), col("loo_enc"), col("freq_enc"))
      .orderBy(col("event_id"))
  }

  val all: Seq[Q] = Seq(q138TargetEncode)
}
