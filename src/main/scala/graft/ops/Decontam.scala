package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Benchmark decontamination — flag training documents whose n-grams
  * overlap a held-out evaluation set, the standard pre-training hygiene
  * step (no analog in the reference; the eval split here is the
  * deterministic `doc_id % 20 = 0` subset standing in for an external
  * benchmark table).
  *
  * Scale design: the eval side reduces to its DISTINCT shingle hashes —
  * proportional to the benchmark suite (MBs), not the corpus — so the
  * membership probe is a broadcast join against the corpus's exploded
  * shingles: no shuffle of the 100 TB side, contamination counting is a
  * partial+final aggregate keyed by doc_id. Shingling and 60-bit hashing
  * are shared with the dedup family ([[Dedup.hashedShinglesOf]]), so one
  * materialized shingle pass can feed dedup AND decontamination in a real
  * pipeline run.
  */
object Decontam {

  /** Contamination report of `corpus` against `evalSet` (both carry
    * (doc_id, text)): per corpus doc, its distinct-shingle count, how
    * many of those shingles appear anywhere in the eval set, the
    * contaminated fraction, and the ≥ `minFrac` drop flag. Unordered —
    * callers add their own sort. */
  private[graft] def decontaminate(corpus: DataFrame, evalSet: DataFrame,
                                   minFrac: Double = 0.1): DataFrame =
    decontaminateHashed(
      Dedup.hashedShinglesOf(corpus), Dedup.hashedShinglesOf(evalSet), minFrac)

  /** [[decontaminate]] over pre-hashed shingle frames (doc_id, hs) —
    * the composition entry point for pipelines that already hold hashed
    * shingles (q143 builds them once for dedup and decontamination from
    * the same helper). NOTE an instructive Catalyst limit, verified on
    * q143's executed plan: splitting one hashed frame by `doc_id % 20`
    * does NOT yield a shared shingle exchange — doc_id is the grouping
    * key, so the filters transpose BELOW the aggregation barrier and
    * the two consumers' subtrees diverge again (no ReusedExchange).
    * Within one job the corpus is still shingled per consumer; a real
    * pipeline that needs the pass shared materializes the hashed frame
    * (checkpoint / table), exactly what [[graft.Graft.decontaminate]]
    * callers can do with their own frames. */
  private[graft] def decontaminateHashed(corpusHashed: DataFrame, evalHashed: DataFrame,
                                         minFrac: Double = 0.1): DataFrame = {
    val evalShingles = evalHashed
      .select(explode(col("hs")).as("h")).distinct()
      .withColumn("hit", lit(1L))
    corpusHashed
      .select(col("doc_id"), size(col("hs")).cast("long").as("n_shingles"),
        explode(col("hs")).as("h"))
      .join(broadcast(evalShingles), Seq("h"), "left")
      .groupBy(col("doc_id"), col("n_shingles"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .select(col("doc_id"), col("n_shingles"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_shingles")).as("frac"),
        (col("n_hit").cast("double") / col("n_shingles") >= minFrac).as("contaminated"))
  }

  /** Per-document contamination report: distinct 5-gram shingles, how
    * many appear anywhere in the eval set, the contaminated fraction,
    * and the drop flag (frac ≥ 0.1). Docs under 5 tokens carry no
    * shingles and are excluded (same domain rule as q25/q26). The
    * oracle replays the identical shingling + hashing CTEs, so the gate
    * checks the full pipeline, not just the counting. */
  val q101Decontaminate: Q = Q.sql(
    "q101_decontaminate",
    s"""WITH
       |${Dedup.oracleDocs},
       |${Dedup.oracleHashed},
       |ev AS (SELECT DISTINCT unnest(hs) AS h FROM hashed WHERE doc_id % 20 = 0),
       |corp AS (
       |  SELECT doc_id, CAST(len(hs) AS BIGINT) AS n_shingles, unnest(hs) AS h
       |  FROM hashed WHERE doc_id % 20 != 0),
       |agg AS (
       |  SELECT corp.doc_id, corp.n_shingles,
       |    CAST(SUM(CASE WHEN ev.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
       |  FROM corp LEFT JOIN ev ON corp.h = ev.h
       |  GROUP BY corp.doc_id, corp.n_shingles)
       |SELECT doc_id, n_shingles, n_hit,
       |  CAST(n_hit AS DOUBLE) / n_shingles AS frac,
       |  CAST(n_hit AS DOUBLE) / n_shingles >= 0.1 AS contaminated
       |FROM agg
       |ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    decontaminate(
      docs.filter(col("doc_id") % 20 =!= 0),
      docs.filter(col("doc_id") % 20 === 0))
      .orderBy(col("doc_id"))
  }

  /** The REVERSE probe of [[decontaminate]] — the GPT-3-appendix-style
    * benchmark-integrity report: score each EVAL doc by the fraction of
    * ITS shingles that occur anywhere in the training corpus. q101 says
    * which train docs to drop; this says which benchmark items are
    * already compromised (a containment near 1.0 means the benchmark
    * item is memorizable verbatim and its score is meaningless).
    *
    * Scale: the corpus side is never shuffled by content — its exploded
    * shingles are FILTERED by the broadcast eval-shingle set first
    * (semi-join), so the only aggregation runs over corpus∩eval hits,
    * bounded by the eval suite's size, not the corpus's. */
  private[graft] def containmentOf(evalSet: DataFrame, corpus: DataFrame,
                                   dirtyFrac: Double = 0.2): DataFrame =
    containmentHashed(Dedup.hashedShinglesOf(evalSet),
      Dedup.hashedShinglesOf(corpus), dirtyFrac)

  private[graft] def containmentHashed(evalHashed: DataFrame, corpusHashed: DataFrame,
                                       dirtyFrac: Double): DataFrame = {
    val evalShingles = evalHashed.select(explode(col("hs")).as("h")).distinct()
    val hits = corpusHashed.select(explode(col("hs")).as("h"))
      .join(broadcast(evalShingles), Seq("h"), "left_semi")
      .distinct().withColumn("hit", lit(1L))
    evalHashed
      .select(col("doc_id"), size(col("hs")).cast("long").as("n_shingles"),
        explode(col("hs")).as("h"))
      .join(broadcast(hits), Seq("h"), "left")
      .groupBy(col("doc_id"), col("n_shingles"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_in_corpus"))
      .select(col("doc_id"), col("n_shingles"), col("n_in_corpus"),
        (col("n_in_corpus").cast("double") / col("n_shingles")).as("containment"),
        (col("n_in_corpus").cast("double") / col("n_shingles") >= dirtyFrac)
          .as("compromised"))
  }

  /** Benchmark containment report at 5-gram grain, dirty threshold 0.2;
    * the eval split is the q101 convention (doc_id % 20 = 0). */
  val q163EvalContainment: Q = Q.sql(
    "q163_eval_containment",
    s"""WITH
       |${Dedup.oracleDocs},
       |${Dedup.oracleHashed},
       |hits AS (
       |  SELECT DISTINCT ev.h FROM
       |    (SELECT DISTINCT unnest(hs) AS h FROM hashed WHERE doc_id % 20 = 0) ev
       |  JOIN (SELECT unnest(hs) AS h FROM hashed WHERE doc_id % 20 != 0) c ON c.h = ev.h),
       |evd AS (
       |  SELECT doc_id, CAST(len(hs) AS BIGINT) AS n_shingles, unnest(hs) AS h
       |  FROM hashed WHERE doc_id % 20 = 0),
       |agg AS (
       |  SELECT evd.doc_id, evd.n_shingles,
       |    CAST(SUM(CASE WHEN hits.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_in_corpus
       |  FROM evd LEFT JOIN hits ON hits.h = evd.h
       |  GROUP BY 1, 2)
       |SELECT doc_id, n_shingles, n_in_corpus,
       |  CAST(n_in_corpus AS DOUBLE) / n_shingles AS containment,
       |  CAST(n_in_corpus AS DOUBLE) / n_shingles >= 0.2 AS compromised
       |FROM agg ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    containmentOf(
      docs.filter(col("doc_id") % 20 === 0),
      docs.filter(col("doc_id") % 20 =!= 0))
      .orderBy(col("doc_id"))
  }

  val all: Seq[Q] = Seq(q101Decontaminate, q163EvalContainment)
}
