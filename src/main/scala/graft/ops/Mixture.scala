package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Domain-mixture planning — temperature-flattened token budgets per
  * source, the static sibling of DoReMi-style learned mixtures: given
  * per-domain token counts n_i, allocate a token budget B across domains
  * by p_i ∝ n_i^τ with τ = 1/2 (the multilingual-sampling temperature of
  * mBERT/XLM-R, applied to sources). Flattening upweights small domains
  * relative to proportional sampling while never inverting the order; the
  * plan also reports the implied epoch count per domain (quota/n_i — the
  * "how many times does this domain repeat" number a 100 TB mixture
  * review reads first) and a capped quota (≤ MaxEpochs·n_i, the
  * don't-over-repeat rule of Muennighoff et al. 2023).
  *
  * Scale shape: one map-side-combined aggregation to (source, n_tokens) —
  * |domains| rows, constant afterwards. The plan arithmetic is row-local
  * over that tiny frame plus one 1-row total broadcast (the
  * [[HeavyHitters.cmsFrequencies]] BNLJ discipline).
  *
  * Cross-engine determinism: n_i^(1/2) is IEEE sqrt — correctly rounded
  * by both JVMs and DuckDB's libm BY SPEC (unlike ln/exp), so
  * floor(sqrt(n)) is bit-identical cross-engine with no boundary audit
  * needed; everything else is int64-exact DIV arithmetic. Weights are
  * floor(sqrt(n)) at unit scale (relative quantization ≤ 1/√n — at any
  * realistic domain size, sub-0.1%); range guards keep every product
  * provably under 2⁶³ and raise_error beyond. n_tokens is guarded to
  * ≥ 1 (an empty domain has no place in a mixture plan), which also
  * proves both divisors nonzero: n ≥ 1 → w = floor(√n) ≥ 1 → Σw ≥ 1 —
  * so the non-ANSI `div` can never hit the NULL-vs-error divergence
  * between Spark and DuckDB. */
object Mixture {

  /** Default epoch cap for [[temperatureMixturePlan]]'s `quota_capped`. */
  val MaxEpochs = 4L

  private def guarded(c: Column, lo: Long, hi: Long, what: String): Column =
    when(c > hi || c < lo, raise_error(concat(
      lit(s"mixture plan: $what outside [$lo, $hi]: "), c.cast("string"))))
      .otherwise(c)

  /** (source, n_tokens) + a token budget → the mixture plan:
    * (source, n_tokens, w, p_micro, quota_tokens, quota_capped,
    * epochs_milli, sum_ok) where w = floor(√n), p_micro = the domain's
    * micro-weight share, quota_tokens = its exact integer budget slice
    * (w·B div Σw), quota_capped = min(quota, MaxEpochs·n), epochs_milli
    * = quota·1000 div n, and sum_ok asserts Σ quota ≤ B (DIV floors per
    * domain, so the plan can never over-allocate — the boolean makes the
    * invariant part of the gated output). */
  def temperatureMixturePlan(tokenCounts: DataFrame, budget: Column): DataFrame = {
    val counts = tokenCounts
      .withColumn("n_tokens", guarded(col("n_tokens"), 1L, 1000000000000L, "n_tokens"))
      .withColumn("w", floor(sqrt(col("n_tokens").cast("double"))).cast("long"))
    val tot = counts.agg(
      sum(col("w")).as("sw"),
      guarded(budget, 0L, 1000000000000L, "budget").as("b"))
    val planned = counts.crossJoin(broadcast(tot))
      .withColumn("p_micro", expr("(w * 1000000) div sw"))
      .withColumn("quota_tokens", expr("(w * b) div sw"))
      .withColumn("quota_capped",
        least(col("quota_tokens"), col("n_tokens") * lit(MaxEpochs)))
      .withColumn("epochs_milli", expr("(quota_tokens * 1000) div n_tokens"))
    val sumOk = planned.agg((sum(col("quota_tokens")) <= first(col("b"))).as("sum_ok"))
    planned.crossJoin(broadcast(sumOk))
      .select(col("source"), col("n_tokens"), col("w"), col("p_micro"),
        col("quota_tokens"), col("quota_capped"), col("epochs_milli"), col("sum_ok"))
  }

  /** q237: the τ=1/2 mixture plan over the corpus' per-source
    * whitespace-token counts, budget = the corpus' own total (re-sample
    * to the same size with a flattened distribution — the classic
    * temperature use). The oracle replays weight quantization, the DIV
    * allocation, the cap, and the epoch arithmetic; sum_ok is literal
    * TRUE on the oracle side (the engine computes it — a plan that
    * over-allocates hash-fails). */
  val q237MixturePlan: Q = Q.sql(
    "q237_mixture_plan",
    """WITH n AS (
      |  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source),
      |w AS (SELECT source, n_tokens,
      |        CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS w FROM n),
      |t AS (SELECT CAST(SUM(w) AS BIGINT) AS sw, CAST(SUM(n_tokens) AS BIGINT) AS b FROM w)
      |SELECT source, n_tokens, w,
      |  (w * 1000000) // sw AS p_micro,
      |  (w * b) // sw AS quota_tokens,
      |  least((w * b) // sw, n_tokens * 4) AS quota_capped,
      |  (((w * b) // sw) * 1000) // n_tokens AS epochs_milli,
      |  TRUE AS sum_ok
      |FROM w, t
      |ORDER BY source""".stripMargin
  ) { (s, dir) =>
    val counts = Tables.documents(s, dir)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("toks"))
      .groupBy(col("source")).agg(sum(col("toks")).as("n_tokens"))
    temperatureMixturePlan(counts, sum(col("n_tokens")))
      .orderBy(col("source"))
  }

  val all: Seq[Q] = Seq(q237MixturePlan)
}
