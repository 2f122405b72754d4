package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Batched lexical retrieval — [[TextAnalysis.bm25Of]]'s Okapi kernel
  * lifted from ONE query to a QUERY TABLE, with per-query top-k.
  *
  * q129 ranks the corpus for a single OR-query (TakeOrderedAndProject
  * top-50). The missing shape for an eval harness / leakage screen is
  * BATCHED: thousands of benchmark queries scored against the corpus in
  * one job, each returning its own top-k block plus how many of its
  * terms matched. One corpus scan serves every query: postings build
  * once over the UNION of all query terms, then fan out to queries via a
  * broadcast join on the term — never |queries| scans, never doc×query.
  *
  * Scoring is IDENTICALLY q129's fixed-point kernel (k1 = 1.2, b = 0.75;
  * rational Robertson–Sparck Jones idf ×1000 — monotone in the log idf,
  * no libm anywhere, bit-identical across engines and aggregation
  * orders; exact while N·tf < 4·10¹⁴). Sharing the kernel is deliberate:
  * a single-query probe (q129) and a batched run (this) can never
  * disagree on a score.
  *
  * Scale shape:
  *  1. postings (doc_id, dl, term, tf) aggregate map-side over tokens
  *     pre-filtered to the broadcast query-term set — only matched terms
  *     survive the scan side.
  *  2. per-term df is a |terms|-row broadcast; corpus stats (N,
  *     avgdl_milli) ride one 1-row broadcast cross join (the q129/q215
  *     BNLJ discipline, RegistrySpec-whitelisted).
  *  3. the (query_id, term) fan-out is a broadcast equi-join; the top-k
  *     window partitions by query_id over CANDIDATE docs only (docs
  *     sharing ≥1 term), never the corpus.
  */
object Retrieval {

  /** The registered gate's fixed query batch — literal keyword queries
    * over the synthetic corpus vocabulary (TESTDATA.md), mixing all-high-
    * df queries (rank driven by tf·length-norm) and the rare "dup" term
    * (df ≈ 5%, idf-dominated). */
  private[graft] val gateQueries: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("hash", "join"),
    2L -> Seq("merge", "sort"),
    3L -> Seq("dup"),
    4L -> Seq("window", "agg", "stream"),
    5L -> Seq("customer", "order", "query"),
    6L -> Seq("vector", "scan", "fast"),
    7L -> Seq("slow", "filter"),
    8L -> Seq("spark", "table", "column", "key"))

  /** The search TAIL shared by the inline gate and the stored-index
    * path: given index pieces — postings `f` (doc_id, dl, t, tf), term
    * dfs `dft` (t, df), 1-row corpus `stats` (n, avgdl_milli) — score
    * and rank `queries`. `f`/`dft` may cover the FULL vocabulary (the
    * stored form) or just the query terms (the inline form): df and
    * stats are per-term/corpus facts independent of pruning, so both
    * serve bit-identical results. `dft` is pruned to the query terms
    * BEFORE broadcasting — a 100 TB vocabulary never broadcasts. */
  private[graft] def bm25SearchFrom(f: DataFrame, dft: DataFrame, stats: DataFrame,
                                    queries: DataFrame, k: Int): DataFrame = {
    val qt = queries
      .select(col("query_id"), explode(col("terms")).as("t")).distinct()
    val dftPruned = dft.join(broadcast(qt.select(col("t")).distinct()), Seq("t"))
    val scored = f
      .join(broadcast(qt), Seq("t"))
      .join(broadcast(dftPruned), Seq("t"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"),
        expr("((2*n - 2*df + 1) * 1000) DIV (2*df + 1)").as("idf_milli"),
        expr("250 + (750 * ((dl * 1000000) DIV avgdl_milli)) DIV 1000").as("norm_milli"),
        col("tf"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(
        sum(expr("(idf_milli * tf * 2200) DIV (tf*1000 + (1200 * norm_milli) DIV 1000)"))
          .as("score_milli"),
        count(lit(1)).as("n_hit"))
    import org.apache.spark.sql.expressions.Window
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score_milli").desc, col("doc_id"))))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk").cast("long").as("rk"), col("doc_id"),
        col("score_milli"), col("n_hit"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** Build the index pieces over `docs`: postings (doc_id, dl, t, tf),
    * per-term dfs, 1-row corpus stats. `termFilter` prunes the token
    * stream scan-side (the inline gate passes the query-term union; the
    * stored index passes None and keeps the full vocabulary). */
  private[graft] def bm25IndexPieces(docs: DataFrame, termFilter: Option[DataFrame])
      : (DataFrame, DataFrame, DataFrame) = {
    val d = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
    val stats = d.agg(
      count(lit(1)).as("n"),
      expr("(sum(size(w)) * 1000) DIV count(1)").as("avgdl_milli"))
    // coalesce keeps t non-nullable so the broadcast term filter pushes
    // no asymmetric isnotnull(t) into one branch (the q164/q129 lesson)
    val toks = d
      .select(col("doc_id"), size(col("w")).cast("long").as("dl"),
        explode(col("w")).as("t0"))
      .select(col("doc_id"), col("dl"), coalesce(col("t0"), lit("")).as("t"))
    val f = termFilter.fold(toks)(ts => toks.join(broadcast(ts), Seq("t")))
      .groupBy(col("doc_id"), col("dl"), col("t"))
      .agg(count(lit(1)).as("tf"))
    // (doc_id, t) unique in f ⇒ count(*) ≡ countDistinct(doc_id); the
    // tf >= 1 reference keeps this branch's partial agg shape shared
    // with the join branch so the f exchange is reused (q129's trick)
    val dft = f.groupBy(col("t")).agg(count(when(col("tf") >= 1, 1)).as("df"))
    (f, dft, stats)
  }

  /** BM25 top-k per query: `docs` (doc_id, text) × `queries` (query_id,
    * terms: array<string>) → (query_id, rk, doc_id, score_milli, n_hit),
    * the k best-scoring docs per query in q129's exact milli-unit fixed
    * point, ties broken by doc_id. Docs sharing no term with a query
    * never appear (inverted-index semantics); n_hit counts the query's
    * matched terms. Term-DEDUP semantics: a query's `terms` array is
    * deduplicated before scoring (the exploded (query_id, t) table is
    * `.distinct()` in [[bm25SearchFrom]]), so `['x','x']` scores
    * identically to `['x']` — each distinct term contributes its BM25
    * term score once, and n_hit = DISTINCT matched terms. This is the
    * set-of-terms query model (standard boolean-bag BM25), not a
    * weighted multiset; callers wanting repeat-term weighting should
    * pre-expand weights into their own scoring column. */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val allTerms = queries.select(explode(col("terms")).as("t")).distinct()
    val (f, dft, stats) = bm25IndexPieces(docs, Some(allTerms))
    bm25SearchFrom(f, dft, stats, queries, k)
  }

  /** Persist the full inverted index: postings/ (doc_id, dl, t, tf —
    * repartitioned by term so a term's posting list is one partition's
    * read; at real scale, bucketBy(t) into a table), df/ (t, df —
    * hash-partitioned by the SAME term key: the vocabulary is billions
    * of rows at 100 TB, so it gets the same multi-file term-hash layout
    * as the postings, never a single-task funnel), and the 1-row
    * stats/ (the only piece small enough to earn coalesce(1)). Raw
    * text is NOT stored — the index is the retrieval-sufficient
    * statistic, the writeAnnIndex discipline. */
  def writeBm25Index(docs: DataFrame, path: String): Unit = {
    val (f, dft, stats) = bm25IndexPieces(docs, None)
    f.repartition(col("t")).write.mode("overwrite").parquet(s"$path/postings")
    dft.repartition(col("t")).write.mode("overwrite").parquet(s"$path/df")
    stats.coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Re-open a [[writeBm25Index]] artifact: (postings, df, stats). */
  def readBm25Index(s: SparkSession, path: String): (DataFrame, DataFrame, DataFrame) =
    (s.read.parquet(s"$path/postings"),
      s.read.parquet(s"$path/df"),
      s.read.parquet(s"$path/stats"))

  /** Serve BM25 top-k from a STORED index — bit-identical to the inline
    * [[bm25TopK]] over the same corpus (RetrievalSpec proves it): df and
    * corpus stats are pruning-independent facts, so the full-vocabulary
    * index and the inline query-term build score every candidate the
    * same. New queries never re-tokenize the corpus. */
  def bm25SearchStored(index: (DataFrame, DataFrame, DataFrame),
                       queries: DataFrame, k: Int): DataFrame =
    bm25SearchFrom(index._1, index._2, index._3, queries, k)

  private def queriesDf(s: SparkSession): DataFrame = {
    import s.implicits._
    gateQueries.toDF("query_id", "terms")
  }

  private def oracleQueryValues: String =
    gateQueries.flatMap { case (id, ts) =>
      ts.map(t => s"(CAST($id AS BIGINT), '$t')")
    }.mkString(", ")

  /** q236: the batched top-10 for the gate query set. The oracle replays
    * the whole pipeline — postings, pruned df, the q129 integer kernel,
    * per-(query, doc) sums, (score desc, doc_id) ranking — so a drifted
    * constant, a DIV-vs-round mismatch, or an unstable tie-break all
    * hash-fail. */
  val q236BatchRetrieval: Q = Q.sql(
    "q236_batch_retrieval",
    s"""WITH q(query_id, t) AS (SELECT * FROM (VALUES $oracleQueryValues) v),
       |d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |stats AS (
       |  SELECT COUNT(*) AS n, (SUM(len(w)) * 1000) // COUNT(*) AS avgdl_milli FROM d),
       |f AS (
       |  SELECT doc_id, dl, t, COUNT(*) AS tf
       |  FROM (SELECT doc_id, len(w) AS dl, unnest(w) AS t FROM d)
       |  WHERE t IN (SELECT DISTINCT t FROM q) GROUP BY doc_id, dl, t),
       |dft AS (
       |  SELECT t, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM f GROUP BY t),
       |sc AS (
       |  SELECT q.query_id, f.doc_id,
       |    CAST(SUM((((2*s.n - 2*dft.df + 1) * 1000) // (2*dft.df + 1) * f.tf * 2200)
       |      // (f.tf*1000 + (1200 * (250 + (750 * ((f.dl * 1000000) // s.avgdl_milli)) // 1000)) // 1000))
       |      AS BIGINT) AS score_milli,
       |    CAST(COUNT(*) AS BIGINT) AS n_hit
       |  FROM q JOIN f USING (t) JOIN dft USING (t) CROSS JOIN stats s
       |  GROUP BY 1, 2),
       |r AS (
       |  SELECT query_id, doc_id, score_milli, n_hit,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score_milli DESC, doc_id) AS rk
       |  FROM sc)
       |SELECT query_id, rk, doc_id, score_milli, n_hit FROM r WHERE rk <= 10
       |ORDER BY query_id, rk""".stripMargin
  ) { (s, dir) =>
    bm25TopK(Tables.documents(s, dir), queriesDf(s), k = 10)
  }

  val all: Seq[Q] = Seq(q236BatchRetrieval)
}
