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
                                    queries: DataFrame, k: Int,
                                    dftAdditive: Boolean = false): DataFrame = {
    val qt = queries
      .select(col("query_id"), explode(col("terms")).as("t")).distinct()
    // `dftAdditive` (r15): a stored index refreshed through
    // [[refreshStoredBm25Index]] keeps one df segment per generation
    // (delta-proportional writes, guide §6), so a term present in
    // several generations arrives as several ADDITIVE rows — the
    // stored-serve path merges them AFTER the broadcast query-term
    // prune (bounded by |query terms| × |segments| rows; the full
    // vocabulary is never aggregated at serve time). Inline builds
    // derive df from the postings with t already unique, so they skip
    // the merge's extra (tiny) exchange and keep their r14 plan.
    val dftQ = dft.join(broadcast(qt.select(col("t")).distinct()), Seq("t"))
    val dftPruned =
      if (dftAdditive) dftQ.groupBy(col("t")).agg(sum(col("df")).as("df"))
      else dftQ
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
    // sum_dl rides beside the derived average so a stored-index REFRESH
    // can merge stats EXACTLY (n and sum_dl are additive; avgdl_milli's
    // DIV is not invertible — the q234/q235 lesson: store what the
    // refresh contract needs, publish the derived form beside it).
    val stats = d.agg(
        count(lit(1)).as("n"),
        expr("CAST(sum(size(w)) AS BIGINT)").as("sum_dl"))
      .withColumn("avgdl_milli", expr("(sum_dl * 1000) DIV n"))
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
    // checkpoint the postings ONCE (r14): the postings and df writes are
    // separate ACTIONS, so the full-vocabulary tokenize + (doc, term)
    // aggregation otherwise ran twice (df derives from f). Derivation of
    // df from the materialized frame is the identical expression
    // bm25IndexPieces builds; blocks release before returning (try/
    // finally so a failed write cannot pin them for the session).
    val (f0, _, stats) = bm25IndexPieces(docs, None)
    val rel = graft.ops.Components.sessionReliable(docs)
    if (rel) graft.ops.Components.requireCheckpointDir(docs)
    val f = graft.ops.Components.materialize(f0, rel)
    try {
      val dft = f.groupBy(col("t")).agg(count(when(col("tf") >= 1, 1)).as("df"))
      f.repartition(col("t")).write.mode("overwrite").parquet(s"$path/postings")
      dft.repartition(col("t")).write.mode("overwrite").parquet(s"$path/df")
      stats.coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
      writeSegmentManifest(docs.sparkSession, path, Seq(path))
    } finally graft.ops.Components.releaseBlocks(f)
  }

  /** The generation's SEGMENT manifest (r15, guide §6): `segments/`
    * lists the roots whose `postings/` + `df/` files make up this
    * generation, oldest first — the Lucene-segment / Iceberg-manifest
    * discipline that lets [[refreshStoredBm25Index]] write only
    * delta-proportional data while older generations' files are
    * REFERENCED, never copied or rewritten. |segments| rows — a
    * refresh cadence count, never data-sized. */
  private def writeSegmentManifest(s: SparkSession, path: String,
                                   segs: Seq[String]): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$path/segments.txt")
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write((segs.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** A generation's segment roots, manifest order. Plain newline-
    * separated text read through the Hadoop FS API — manifest metadata
    * (|segments| short strings, like a file listing), deliberately NOT
    * a Spark job: a parquet manifest cost one scheduled job per
    * read/write, measurable against a delta-sized refresh. */
  private def readSegmentManifest(s: SparkSession, path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/segments.txt")
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    val in = fs.open(p)
    val bytes = try {
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      Iterator.continually(in.read(tmp)).takeWhile(_ >= 0)
        .foreach(n => buf.write(tmp, 0, n))
      buf.toByteArray
    } finally in.close()
    new String(bytes, "UTF-8").linesIterator.filter(_.nonEmpty).toSeq
  }

  /** Re-open a [[writeBm25Index]] artifact: (postings, df, stats).
    * Postings and df are the UNION of the generation's segments (one
    * per refresh since the base build); a term refreshed across
    * generations therefore carries one additive df row per segment —
    * [[bm25SearchFrom]] merges them after its query-term prune. */
  def readBm25Index(s: SparkSession, path: String): (DataFrame, DataFrame, DataFrame) = {
    val segs = readSegmentManifest(s, path)
    (segs.map(p => s.read.parquet(s"$p/postings")).reduce(_.unionByName(_)),
      segs.map(p => s.read.parquet(s"$p/df")).reduce(_.unionByName(_)),
      s.read.parquet(s"$path/stats"))
  }

  /** Refresh a stored [[writeBm25Index]] artifact with ADDED docs into a
    * NEW generation at `outPath` — the [[writeAnnIndex]]-family refresh
    * discipline for the lexical index. Only the DELTA is tokenized:
    * postings append (an added doc touches no existing posting row), df
    * merges additively per term, and stats merge exactly through the
    * stored (n, sum_dl) — `avgdl_milli`'s DIV is recomputed from the
    * merged sums, so refreshed == rebuilt-from-scratch piece for piece
    * (RetrievalSpec proves it, serve path included). ADD-only contract:
    * a delta doc_id already present in the index fails loudly (an
    * updated doc needs retire-then-add, the q218 discipline — silently
    * unioning it would double-count its term frequencies). The
    * collision guard is one semi-join on the postings' distinct doc_ids;
    * the old artifact's rows are COPIED, never re-derived — work beyond
    * the copy is ∝ |delta|. */
  def refreshStoredBm25Index(s: SparkSession, path: String, deltaDocs: DataFrame,
                             outPath: String): Unit = {
    require(outPath != path,
      "refreshStoredBm25Index writes a new generation: outPath must differ from path")
    val (f0, _, stats0) = readBm25Index(s, path)
    // checkpoint the delta postings ONCE (r14): fD otherwise re-derives
    // the delta tokenize + aggregation for each of the collision check,
    // the postings write, and the df write (dftD derives from fD)
    val (fD0, _, statsD) = bm25IndexPieces(deltaDocs, None)
    val rel = graft.ops.Components.sessionReliable(deltaDocs)
    if (rel) graft.ops.Components.requireCheckpointDir(deltaDocs)
    val fD = graft.ops.Components.materialize(fD0, rel)
    try {
      val dftD = fD.groupBy(col("t")).agg(count(when(col("tf") >= 1, 1)).as("df"))
      val collisions = f0.select(col("doc_id")).distinct()
        .join(fD.select(col("doc_id")).distinct(), Seq("doc_id"))
        .limit(1).count()
      require(collisions == 0L,
        "refreshStoredBm25Index: delta contains doc_ids already in the index " +
          "(ADD-only contract; retire-then-add updated docs)")
      // DELTA-PROPORTIONAL write (r15, guide §6 / §2.4): the new
      // generation persists ONLY the delta's postings + df as its own
      // segment and lists the base generation's segments in its
      // manifest — an added doc touches no existing posting row and df
      // merges additively, so the base's corpus-sized pieces never
      // re-shuffle, re-encode, or even re-read (the r14 code rewrote
      // the MERGED postings and vocabulary: O(corpus) write volume per
      // refresh). Readers union the segments; [[bm25SearchFrom]] sums
      // the per-segment df rows after its query-term prune. Only the
      // 1-row stats piece merges at write time (exact, via the stored
      // additive (n, sum_dl)). Base segments are referenced by path:
      // a generation must outlive every generation refreshed from it.
      fD.repartition(col("t")).write.mode("overwrite").parquet(s"$outPath/postings")
      dftD.repartition(col("t")).write.mode("overwrite").parquet(s"$outPath/df")
      stats0.select(col("n"), col("sum_dl"))
        .unionByName(statsD.select(col("n"), col("sum_dl")))
        .agg(sum(col("n")).as("n"), sum(col("sum_dl")).as("sum_dl"))
        .withColumn("avgdl_milli", expr("(sum_dl * 1000) DIV n"))
        .coalesce(1).write.mode("overwrite").parquet(s"$outPath/stats")
      writeSegmentManifest(s, outPath, readSegmentManifest(s, path) :+ outPath)
    } finally graft.ops.Components.releaseBlocks(fD)
  }

  /** Serve BM25 top-k from a STORED index — bit-identical to the inline
    * [[bm25TopK]] over the same corpus (RetrievalSpec proves it): df and
    * corpus stats are pruning-independent facts, so the full-vocabulary
    * index and the inline query-term build score every candidate the
    * same. New queries never re-tokenize the corpus. */
  def bm25SearchStored(index: (DataFrame, DataFrame, DataFrame),
                       queries: DataFrame, k: Int): DataFrame =
    bm25SearchFrom(index._1, index._2, index._3, queries, k, dftAdditive = true)

  private def queriesDf(s: SparkSession): DataFrame = {
    import s.implicits._
    gateQueries.toDF("query_id", "terms")
  }

  private def oracleQueryValues: String =
    gateQueries.flatMap { case (id, ts) =>
      ts.map(t => s"(CAST($id AS BIGINT), '$t')")
    }.mkString(", ")

  /** Shared oracle CTE chain for q236 AND q240's lexical leg: gate
    * queries → postings → pruned df → the q129 integer kernel →
    * per-(query, doc) sums → the `r` ranked frame with the
    * (score desc, doc_id) tie-break. Factored so the batched gate and
    * the hybrid-fusion gate can never drift on the BM25 kernel. */
  private def oracleBm25RankedCtes: String =
    s"""q(query_id, t) AS (SELECT * FROM (VALUES $oracleQueryValues) v),
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
       |  FROM sc)""".stripMargin

  /** q236: the batched top-10 for the gate query set. The oracle replays
    * the whole pipeline — postings, pruned df, the q129 integer kernel,
    * per-(query, doc) sums, (score desc, doc_id) ranking — so a drifted
    * constant, a DIV-vs-round mismatch, or an unstable tie-break all
    * hash-fail. */
  val q236BatchRetrieval: Q = Q.sql(
    "q236_batch_retrieval",
    s"""WITH $oracleBm25RankedCtes
       |SELECT query_id, rk, doc_id, score_milli, n_hit FROM r WHERE rk <= 10
       |ORDER BY query_id, rk""".stripMargin
  ) { (s, dir) =>
    bm25TopK(Tables.documents(s, dir), queriesDf(s), k = 10)
  }

  /** Reciprocal-rank fusion of a lexical and a semantic ranked list
    * (Cormack, Clarke & Buettcher, SIGIR 2009 — the fusion Elasticsearch
    * / OpenSearch / Vespa ship for hybrid search): each leg contributes
    * `1000000 div (rrfK + rank)` milli-points for every (query, doc) it
    * ranked, a doc missing from one leg contributes 0 from that leg, and
    * the fused top-k is ordered (rrf_milli desc, doc_id). All-integer —
    * bit-identical across engines and partitionings; ties break to the
    * lower doc_id.
    *
    * Inputs: `lex` (query_id, doc_id, rk_lex), `sem` (query_id, doc_id,
    * rk_sem), ranks 1-based as [[bm25TopK]] / the ANN family emit them.
    * Output: (query_id, rk, doc_id, rrf_milli, rk_lex, rk_sem), the
    * leg ranks published 0 when that leg did not retrieve the doc.
    *
    * Scale shape: both legs arrive k-bounded (≤ kRetrieve rows per
    * query), so the fuse works on |queries|×2k rows — the full-outer
    * join and the per-query window are negligible next to the legs, and
    * AQE broadcasts one side. In production the legs come from the
    * STORED indexes ([[bm25SearchStored]]; `annSearchStored` /
    * `pqTopKFrozen` on the semantic side) — the corpus is tokenized and
    * encoded once, and fusion never touches it. */
  def rrfFuse(lex: DataFrame, sem: DataFrame, k: Int, rrfK: Int = 60): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rrfK >= 0, s"rrfK must be >= 0, got $rrfK")
    import org.apache.spark.sql.expressions.Window
    lex.select(col("query_id"), col("doc_id"), col("rk_lex").cast("long").as("rk_lex"))
      .join(sem.select(col("query_id"), col("doc_id"), col("rk_sem").cast("long").as("rk_sem")),
        Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        coalesce(col("rk_lex"), lit(0L)).as("rk_lex"),
        coalesce(col("rk_sem"), lit(0L)).as("rk_sem"))
      .withColumn("rrf_milli",
        when(col("rk_lex") > 0, expr(s"1000000 DIV ($rrfK + rk_lex)")).otherwise(0L) +
          when(col("rk_sem") > 0, expr(s"1000000 DIV ($rrfK + rk_sem)")).otherwise(0L))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("rrf_milli").desc, col("doc_id"))))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk").cast("long").as("rk"), col("doc_id"),
        col("rrf_milli"), col("rk_lex"), col("rk_sem"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** Hybrid retrieval: BM25 over `queries.terms` fused with exact
    * cosine over `queries.qv` by [[rrfFuse]]. `queries` carries
    * (query_id, terms: array<string>, qv: array<double>) — the standard
    * hybrid-search query (keywords + a query embedding); `vectors`
    * (vec_id, v) are the corpus embeddings keyed like `docs.doc_id`.
    * Each leg retrieves its own top-`kRetrieve` before fusing to the
    * final top-`k` — the RRF-over-top-K convention (a doc outside a
    * leg's top-K gets 0 from that leg).
    *
    * Scale shape: the lexical leg is [[bm25TopK]]'s one-corpus-scan
    * shape; the exact semantic leg broadcasts the bounded query set and
    * streams candidates unshuffled (the q27 discipline) — it is the
    * EXACT baseline; swap in the IVF/PQ serve paths for a 100 TB corpus
    * and fuse the same way (the legs' output contract is identical). */
  def hybridTopK(docs: DataFrame, vectors: DataFrame, queries: DataFrame,
                 k: Int, kRetrieve: Int): DataFrame = {
    require(kRetrieve >= k, s"kRetrieve ($kRetrieve) must be >= k ($k)")
    val lex = bm25TopK(docs, queries.select(col("query_id"), col("terms")), kRetrieve)
      .select(col("query_id"), col("doc_id"), col("rk").as("rk_lex"))
    val sem = Similarity.cosineTopKExternal(
        vectors, queries.select(col("query_id"), col("qv")), kRetrieve)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rk").as("rk_sem"))
    rrfFuse(lex, sem, k)
  }

  /** q240: the hybrid gate — the q236 lexical kernel and the q27-style
    * exact cosine leg (query embedding = the embedding row whose vec_id
    * equals the gate query id), each top-20, RRF-fused to top-10. The
    * oracle replays BOTH legs and the integer fusion end to end: a rank
    * drift in either leg, a wrong missing-leg contribution, or an
    * unstable fused tie-break all hash-fail. */
  val q240HybridRrf: Q = Q.sql(
    "q240_hybrid_rrf",
    s"""WITH $oracleBm25RankedCtes,
       |lex AS (SELECT query_id, doc_id, rk AS rk_lex FROM r WHERE rk <= 20),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |norms AS (
       |  SELECT vec_id, v,
       |    sqrt(list_reduce(list_transform(v, x -> x*x), (a,b) -> a+b)) AS nrm
       |  FROM e),
       |qemb AS (
       |  SELECT q2.query_id, n.v AS qv, n.nrm AS qn
       |  FROM (SELECT DISTINCT query_id FROM q) q2
       |  JOIN norms n ON n.vec_id = q2.query_id),
       |sem0 AS (
       |  SELECT t.query_id, c.vec_id AS doc_id,
       |    round(${Similarity.oracleDot.format("t.qv", "c.v")} / (t.qn * c.nrm), 9) AS sim
       |  FROM qemb t, norms c),
       |semr AS (
       |  SELECT query_id, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, doc_id) AS rk_sem
       |  FROM sem0),
       |sem AS (SELECT query_id, doc_id, rk_sem FROM semr WHERE rk_sem <= 20),
       |fused AS (
       |  SELECT COALESCE(l.query_id, s.query_id) AS query_id,
       |    COALESCE(l.doc_id, s.doc_id) AS doc_id,
       |    CAST(COALESCE(l.rk_lex, 0) AS BIGINT) AS rk_lex,
       |    CAST(COALESCE(s.rk_sem, 0) AS BIGINT) AS rk_sem,
       |    CAST(COALESCE(1000000 // (60 + l.rk_lex), 0)
       |       + COALESCE(1000000 // (60 + s.rk_sem), 0) AS BIGINT) AS rrf_milli
       |  FROM lex l FULL OUTER JOIN sem s
       |    ON l.query_id = s.query_id AND l.doc_id = s.doc_id),
       |fr AS (
       |  SELECT query_id, doc_id, rrf_milli, rk_lex, rk_sem,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY rrf_milli DESC, doc_id) AS rk
       |  FROM fused)
       |SELECT query_id, rk, doc_id, rrf_milli, rk_lex, rk_sem
       |FROM fr WHERE rk <= 10
       |ORDER BY query_id, rk""".stripMargin
  ) { (s, dir) =>
    val qEmb = Tables.embeddings(s, dir)
      .select(col("vec_id").as("query_id"), col("embedding").cast("array<double>").as("qv"))
    hybridTopK(
      Tables.documents(s, dir),
      Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v")),
      queriesDf(s).join(qEmb, "query_id"),
      k = 10, kRetrieve = 20)
  }

  /** q241: the stored-index REFRESH + SERVE path oracle-gated end to
    * end — the q238/q239 conversion applied to the lexical index. The
    * ENGINE builds a gen-1 index over 4/5 of the corpus, refreshes it
    * with the remaining 1/5 through [[refreshStoredBm25Index]] (delta-
    * only tokenization, additive df/stats merge), and serves the gate
    * queries from the REFRESHED artifact; the ORACLE replays the q236
    * kernel over the FULL corpus inline. A dropped posting, a
    * double-counted df, or a stats merge that loses a token all
    * hash-fail. Index generations live at FIXED fixture paths
    * (target/fixtures/q241_bm25_gen{1,2}) — written and read inside one
    * query execution, same single-Verify-at-a-time caveat as q238/q239
    * (verify SKILL.md). */
  val q241StoredBm25RefreshServe: Q = Q.sql(
    "q241_stored_bm25_refresh_serve",
    s"""WITH $oracleBm25RankedCtes
       |SELECT query_id, rk, doc_id, score_milli, n_hit FROM r WHERE rk <= 10
       |ORDER BY query_id, rk""".stripMargin
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val p1 = "target/fixtures/q241_bm25_gen1"
    val p2 = "target/fixtures/q241_bm25_gen2"
    writeBm25Index(docs.filter(col("doc_id") % 5 =!= 0), p1)
    refreshStoredBm25Index(s, p1, docs.filter(col("doc_id") % 5 === 0), p2)
    bm25SearchStored(readBm25Index(s, p2), queriesDf(s), k = 10)
  }

  val all: Seq[Q] = Seq(q236BatchRetrieval, q240HybridRrf, q241StoredBm25RefreshServe)
}
