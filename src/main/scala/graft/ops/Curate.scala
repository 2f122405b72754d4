package graft.ops

import org.apache.spark.sql.functions._
import graft.Q

/** End-to-end corpus curation — the composition a 100 TB training-data
  * run actually executes: quality floor (composite score + length) ∧
  * near-dup survivorship, reported per language. Exists to prove the
  * stages COMPOSE as one lazy plan: [[TextAnalysis.textStats]] (row-local
  * scoring), [[Dedup.minhashPairs]] → [[Components.connectedComponents]]
  * (the pair graph + survivor labels), and a broadcast anti-join — no
  * materialization boundaries between modules, one job.
  *
  * Shape at scale: scoring is scan-speed; the dedup branch's state is
  * proportional to duplicated docs; the anti-join broadcasts; the final
  * per-language rollup is a 5-row aggregate. The corpus is scanned twice
  * (once for scoring, once inside the shingle pipeline) — fundamental,
  * since dedup needs the pair graph closed before survivorship is known.
  *
  * Determinism: thresholds compare round(…,9) doubles built from exact
  * integer ratios (bit-identical in both engines); aggregate outputs are
  * integer counts/sums plus MIN/MAX of those doubles — order-independent,
  * no float summation anywhere (the determinism contract from `Q`'s
  * scaladoc).
  */
object Curate {

  private val MinQuality = 0.40
  private val MinWords = 20

  val q75CuratedCorpus: Q = Q.sql(
    "q75_curated_corpus",
    s"""WITH RECURSIVE
       |np AS (
       |  ${Dedup.oracleMinhashPairsBody.replace("\n", "\n  ")}),
       |edges AS (SELECT i AS src, j AS dst FROM np UNION SELECT j, i FROM np),
       |reach AS (
       |  SELECT src AS id, src AS r FROM edges
       |  UNION
       |  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id),
       |dropped AS (
       |  SELECT id FROM (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
       |  WHERE id != component),
       |stats AS (
       |  ${TextAnalysis.oracleTextStats.replace("\n", "\n  ")}),
       |curated AS (
       |  SELECT s.* FROM stats s ANTI JOIN dropped ON s.doc_id = dropped.id
       |  WHERE s.quality >= $MinQuality AND s.n_words >= $MinWords)
       |SELECT lang, COUNT(*) AS n_docs,
       |  CAST(SUM(n_words) AS BIGINT) AS sum_words,
       |  MIN(quality) AS min_quality, MAX(quality) AS max_quality
       |FROM curated
       |GROUP BY lang
       |ORDER BY lang""".stripMargin
  ) { (s, dir) =>
    val dropped = Components.connectedComponents(
        Dedup.minhashPairs(s, dir).select(col("i"), col("j")))
      .filter(col("id") =!= col("label"))
      .select(col("id"))
    TextAnalysis.textStats(s, dir)
      .filter(col("quality") >= MinQuality && col("n_words") >= MinWords)
      .join(broadcast(dropped), col("doc_id") === col("id"), "left_anti")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_words")).cast("long").as("sum_words"),
        min(col("quality")).as("min_quality"),
        max(col("quality")).as("max_quality"))
      .orderBy(col("lang"))
  }

  val all: Seq[Q] = Seq(q75CuratedCorpus)
}
