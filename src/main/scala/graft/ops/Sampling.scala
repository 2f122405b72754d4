package graft.ops

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Sampling / split operators (SURVEY.md §2.5 rows 32-35) — the family
  * every reference workload runs before every fit. Cross-engine
  * randomness is not reproducible (Spark's per-partition XORShift vs
  * DuckDB), so these are non-oracle entries; their contracts
  * (determinism across runs for a fixed seed+partitioning, split
  * disjointness/coverage, count windows) are asserted in SamplingSpec.
  *
  * Scale notes: `sample`/`randomSplit` are NARROW — per-partition
  * Bernoulli draws, no shuffle, no driver involvement; they run at scan
  * speed on any cluster. `orderBy(rand(seed)).limit(n)` (the reference's
  * exact-n undersample, MLP.ipynb:63) costs a full range-exchange sort
  * at scale and is kept for parity — Catalyst plans the limit as
  * TakeOrderedAndProject so only n rows survive per partition, but the
  * rand sort key still materializes for every row. Prefer fraction
  * sampling when exact n is not required.
  */
object Sampling {

  /** Seeded Bernoulli fraction sample (model.py:42 / sample(frac)). */
  val q40SampleFraction: Q = Q.noOracle("q40_sample_fraction") { (s, dir) =>
    Tables.documents(s, dir)
      .sample(withReplacement = false, fraction = 0.2, seed = 42)
      .select(col("doc_id"))
      .orderBy(col("doc_id"))
  }

  /** Seeded randomSplit 80/20 (MLP.ipynb:79) — emits per-split counts;
    * SamplingSpec asserts disjointness and exact coverage. */
  val q41RandomSplit: Q = Q.noOracle("q41_random_split") { (s, dir) =>
    val Array(train, test) =
      Tables.documents(s, dir).randomSplit(Array(0.8, 0.2), seed = 42)
    train.select(lit("train").as("split"), col("doc_id"))
      .union(test.select(lit("test").as("split"), col("doc_id")))
      .groupBy(col("split")).agg(count(lit(1)).as("n"))
      .orderBy(col("split"))
  }

  /** Random-shuffle + limit undersample (MLP.ipynb:63), seeded. */
  val q42RandLimit: Q = Q.noOracle("q42_rand_limit") { (s, dir) =>
    Tables.documents(s, dir)
      .orderBy(rand(42))
      .limit(50)
      .select(col("doc_id"))
      .orderBy(col("doc_id"))
  }

  /** Two-stage train/val/test split (model.py:90-91: 10% test, then 15%
    * of the remainder as val) via chained seeded randomSplits. */
  val q43TwoStageSplit: Q = Q.noOracle("q43_two_stage_split") { (s, dir) =>
    val Array(rest, test) =
      Tables.documents(s, dir).randomSplit(Array(0.9, 0.1), seed = 1010)
    val Array(train, valid) = rest.randomSplit(Array(0.85, 0.15), seed = 1010)
    train.select(lit("1_train").as("split"), col("doc_id"))
      .union(valid.select(lit("2_val").as("split"), col("doc_id")))
      .union(test.select(lit("3_test").as("split"), col("doc_id")))
      .groupBy(col("split")).agg(count(lit(1)).as("n"))
      .orderBy(col("split"))
  }

  /** Deterministic hash-stratified sampling — the scale-correct sibling
    * of `sampleBy`/`sample(frac)`: membership is `md5(salt+doc_id) mod
    * 10⁴ < rateₗₐₙₐ·10⁴`, a pure row-local function of the key. Unlike
    * seeded Bernoulli (whose draws depend on partition layout), the
    * sample is identical across reruns, cluster topologies, AND engines
    * — so this family's one oracle-paired member checks exact membership
    * row by row, not just counts. Rates stratify by language (downsample
    * over-represented 'en', keep minority langs) — the class-rebalance
    * idiom of the reference's undersample (MLP.ipynb:63) without the
    * exact-n range sort. No shuffle: filter + scan only. */
  /** Generic deterministic stratified sample: keep each row iff
    * `md5(salt + keyCol) mod 10⁴` falls under its stratum's rate.
    * `rates` maps stratum values (of `stratumCol`) to [0,1] fractions;
    * unlisted strata use `defaultRate`. Membership is a pure function of
    * the key — identical across reruns, partitionings, and engines. */
  private[graft] def stratifiedOf(docs: org.apache.spark.sql.DataFrame,
                                  rates: Map[String, Double],
                                  defaultRate: Double,
                                  salt: String = "strat:"): org.apache.spark.sql.DataFrame = {
    val bucket = call_function("graft_md5long64",
      concat(lit(salt), col("doc_id").cast("string"))) % 10000
    val thresh = rates.foldLeft(lit((defaultRate * 10000).toInt)) {
      case (els, (stratum, rate)) =>
        when(col("lang") === stratum, (rate * 10000).toInt).otherwise(els)
    }
    docs.filter(bucket < thresh)
  }

  val q71StratifiedSample: Q = Q.sql(
    "q71_stratified_sample",
    """SELECT doc_id, lang FROM documents
      |WHERE CAST(concat('0x', substr(md5(concat('strat:', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 10000
      |  < CASE WHEN lang = 'en' THEN 2500 WHEN lang = 'zh' THEN 5000 ELSE 7500 END
      |ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    stratifiedOf(Tables.documents(s, dir),
      rates = Map("en" -> 0.25, "zh" -> 0.5), defaultRate = 0.75)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic exact-n sample: top-50 by md5 order — the
    * reproducible twin of q42's `orderBy(rand(seed)).limit(n)`. Same
    * TakeOrderedAndProject physical shape (per-partition top-n, merge on
    * the driver — no full sort materializes), but the order key is a
    * pure function of doc_id, so the selected set is identical across
    * engines, reruns, and partitionings, and the oracle checks exact
    * membership. The hash key also decorrelates the sample from any
    * insertion/clustering order — the property the rand() sort was
    * buying, without the irreproducibility. */
  val q80HashTopnSample: Q = Q.sql(
    "q80_hash_topn_sample",
    """SELECT doc_id, lang FROM documents
      |ORDER BY md5(concat('topn:', CAST(doc_id AS VARCHAR))), doc_id
      |LIMIT 50""".stripMargin
  ) { (s, dir) =>
    Tables.documents(s, dir)
      .orderBy(md5(concat(lit("topn:"), col("doc_id").cast("string"))), col("doc_id"))
      .limit(50)
      .select(col("doc_id"), col("lang"))
  }

  /** Quality-weighted deterministic sampling — keep each doc with
    * probability proportional to a per-row quality weight (here length:
    * p = min(1, n_chars/400)), the "sample good documents more"
    * pipeline idiom (cf. importance-weighted corpus mixing). The
    * acceptance test is ALL-INTEGER: md5-bucket(doc_id) mod 10⁴ against
    * a threshold of min(10⁴, 25·n_chars) — no floating point anywhere,
    * so membership is bit-exact across engines, reruns, and
    * partitionings, and the weight ramp 48→553 chars spans rates
    * 0.12→1.0 on this corpus. Pure row-local filter: no shuffle, scan
    * speed at any scale. */
  val q116WeightedSample: Q = Q.sql(
    "q116_weighted_sample",
    """SELECT doc_id, lang, n_chars,
      |  CAST(LEAST(10000, 25 * n_chars) AS DOUBLE) / 10000 AS p_keep
      |FROM documents
      |WHERE CAST(concat('0x', substr(md5(concat('wsamp:', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 10000
      |  < LEAST(10000, 25 * n_chars)
      |ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    val bucket = call_function("graft_md5long64",
      concat(lit("wsamp:"), col("doc_id").cast("string"))) % 10000
    val thresh = least(lit(10000L), lit(25L) * col("n_chars"))
    Tables.documents(s, dir)
      .filter(bucket < thresh)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        (thresh.cast("double") / 10000).as("p_keep"))
      .orderBy(col("doc_id"))
  }

  val all: Seq[Q] = Seq(q40SampleFraction, q41RandomSplit, q42RandLimit, q43TwoStageSplit,
    q71StratifiedSample, q80HashTopnSample, q116WeightedSample)
}
