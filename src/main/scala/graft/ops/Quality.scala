package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Document-quality gating and PII scrubbing — the filter stages a
  * training-data pipeline runs between raw crawl and dedup (no analog in
  * the reference, which trains on pre-curated Kaggle data; the nearest
  * idiom is its stopword/length cleanup, model.py:45-60).
  *
  * Both operators are pure row-local expression pipelines: every metric,
  * rule flag, and redaction is a codegen'd scalar/higher-order built-in
  * over one row's text — no shuffle, no UDF, no driver state. At 100 TB
  * they run at scan speed and stack onto any downstream shuffle stage
  * for free (Catalyst collapses them into the same WholeStageCodegen
  * span as the scan).
  */
object Quality {

  /** The single source of truth for the rule thresholds: the facade's
    * defaults and the oracle-checked q99 configuration both read these,
    * so they cannot drift apart. */
  val DefaultMinWords = 40
  val DefaultWlenRange: (Double, Double) = (3.0, 8.0)
  val DefaultMaxStopFrac = 0.12
  val DefaultMaxTopFrac = 0.15
  val DefaultMinDistinctRatio = 0.35

  /** The rule battery over any (doc_id, text) frame — unordered; the
    * registry query adds the gate's total ORDER BY. Thresholds are
    * caller-tunable (corpus-dependent by nature); the defaults are the
    * oracle-checked registry configuration.
    *
    * The repetition metric (most-frequent-word share) is computed
    * row-locally over the distinct words of the row — O(distinct×words)
    * per doc, bounded by doc length, cheaper at scale than the
    * explode+groupBy alternative which would shuffle every (doc, word)
    * pair. Ratios divide an exact integer by an exact integer in both
    * engines → bit-identical doubles. */
  private[graft] def rulesOf(docs: DataFrame,
                             minWords: Int = DefaultMinWords,
                             wlenRange: (Double, Double) = DefaultWlenRange,
                             maxStopFrac: Double = DefaultMaxStopFrac,
                             maxTopFrac: Double = DefaultMaxTopFrac,
                             minDistinctRatio: Double = DefaultMinDistinctRatio,
                             idCols: Seq[String] = Seq("doc_id")): DataFrame = {
    // idCols: the row identity the flags key on — (doc_id) for document
    // gating, (doc_id, piece_id) when the battery runs at PIECE grain
    // downstream of decontamSpans (q227's composition)
    val ids = idCols.map(col)
    val base = docs
      .select(ids :+ split(col("text"), " ").as("w"): _*)
      .select(ids ++ Seq(
        size(col("w")).cast("long").as("n_words"),
        aggregate(transform(col("w"), x => length(x)), lit(0L), (a, x) => a + x)
          .as("wlen_sum"),
        size(filter(col("w"), x => x === "the" || x === "a")).cast("long").as("stop_n"),
        array_max(transform(array_distinct(col("w")),
          d => size(filter(col("w"), x => x === d)))).cast("long").as("top_n"),
        size(array_distinct(col("w"))).cast("long").as("distinct_n")): _*)
      .select(ids ++ Seq(col("n_words"),
        (col("wlen_sum").cast("double") / col("n_words")).as("mean_wlen"),
        (col("stop_n").cast("double") / col("n_words")).as("stop_frac"),
        (col("top_n").cast("double") / col("n_words")).as("top_frac"),
        (col("distinct_n").cast("double") / col("n_words")).as("distinct_ratio")): _*)
    val rLen  = col("n_words") >= minWords
    val rWlen = col("mean_wlen") >= wlenRange._1 && col("mean_wlen") <= wlenRange._2
    val rStop = col("stop_frac") <= maxStopFrac
    val rRep  = col("top_frac") <= maxTopFrac
    val rDiv  = col("distinct_ratio") >= minDistinctRatio
    base.select(ids ++ Seq(col("n_words"), col("mean_wlen"),
      col("stop_frac"), col("top_frac"), col("distinct_ratio"),
      rLen.as("r_len"), rWlen.as("r_wlen"), rStop.as("r_stop"),
      rRep.as("r_rep"), rDiv.as("r_div"),
      (rLen && rWlen && rStop && rRep && rDiv).as("keep")): _*)
  }

  /** Digit-run and email redaction of `column` on any frame: the column
    * is replaced by its scrubbed form and an `n_redacted` audit count is
    * appended. Row-local, codegen'd, global-by-default replacement. */
  private[graft] def scrubbed(df: DataFrame, column: String): DataFrame =
    df
      .withColumn("n_redacted",
        size(regexp_extract_all(col(column),
          lit("(?i)[a-z0-9._-]+@[a-z0-9.-]+|[0-9]+"), lit(0))).cast("long"))
      .withColumn(column,
        regexp_replace(
          regexp_replace(col(column), "(?i)[a-z0-9._-]+@[a-z0-9.-]+", "<EMAIL>"),
          "[0-9]+", "<NUM>"))

  /** Gopher/C4-style rule battery ([[rulesOf]] at the default
    * thresholds). Each rule is published as its own boolean column (so
    * a pipeline can audit WHICH rule dropped a doc — the standard
    * requirement for filter ablations), plus the combined `keep`.
    * Thresholds sit inside this corpus's measured metric ranges
    * (n_words 10-99, stop_frac 0-0.22, top_frac 0.05-0.30,
    * distinct_ratio 0.28-1.0 at sf0.01) so both outcomes of every rule
    * occur in the gate data. */
  val q99QualityRules: Q = Q.sql(
    "q99_quality_rules",
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |m AS (
      |  SELECT doc_id,
      |    CAST(len(w) AS BIGINT) AS n_words,
      |    CAST(list_sum(list_transform(w, x -> len(x))) AS BIGINT) AS wlen_sum,
      |    CAST(len(list_filter(w, x -> x IN ('the', 'a'))) AS BIGINT) AS stop_n,
      |    CAST(list_max(list_transform(list_distinct(w),
      |      d2 -> len(list_filter(w, x -> x = d2)))) AS BIGINT) AS top_n,
      |    CAST(len(list_distinct(w)) AS BIGINT) AS distinct_n
      |  FROM d),
      |r AS (
      |  SELECT doc_id, n_words,
      |    CAST(wlen_sum AS DOUBLE) / n_words AS mean_wlen,
      |    CAST(stop_n AS DOUBLE) / n_words AS stop_frac,
      |    CAST(top_n AS DOUBLE) / n_words AS top_frac,
      |    CAST(distinct_n AS DOUBLE) / n_words AS distinct_ratio
      |  FROM m)
      |SELECT doc_id, n_words, mean_wlen, stop_frac, top_frac, distinct_ratio,
      |  n_words >= 40 AS r_len,
      |  mean_wlen >= 3.0 AND mean_wlen <= 8.0 AS r_wlen,
      |  stop_frac <= 0.12 AS r_stop,
      |  top_frac <= 0.15 AS r_rep,
      |  distinct_ratio >= 0.35 AS r_div,
      |  n_words >= 40 AND mean_wlen >= 3.0 AND mean_wlen <= 8.0
      |    AND stop_frac <= 0.12 AND top_frac <= 0.15
      |    AND distinct_ratio >= 0.35 AS keep
      |FROM r
      |ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    rulesOf(Tables.documents(s, dir)).orderBy(col("doc_id"))
  }

  /** PII scrubbing: pattern-based redaction with an audit count — the
    * form every release pipeline runs before publishing a corpus.
    * Demonstrated on the events stream: numeric identifiers inside the
    * `props` JSON blob are masked, and a synthesized contact field
    * (the only PII-shaped text in the testdata) exercises the email
    * rule. `n_redacted` counts the matches BEFORE replacement so the
    * audit trail survives the scrub. Spark's regexp_replace is
    * global-by-default; the oracle passes DuckDB's explicit 'g' flag —
    * patterns stay inside the regex subset (character classes, +) that
    * Java regex and RE2 interpret identically. */
  val q100PiiScrub: Q = Q.sql(
    "q100_pii_scrub",
    """SELECT event_id,
      |  regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS props_clean,
      |  CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS n_redacted,
      |  regexp_replace('user' || CAST(user_id AS VARCHAR) || '@example.com',
      |    '(?i)[a-z0-9._-]+@[a-z0-9.-]+', '<EMAIL>', 'g') AS contact_clean
      |FROM events
      |ORDER BY event_id""".stripMargin
  ) { (s, dir) =>
    Tables.events(s, dir)
      .select(col("event_id"),
        regexp_replace(col("props"), "[0-9]+", "<NUM>").as("props_clean"),
        size(regexp_extract_all(col("props"), lit("[0-9]+"), lit(0)))
          .cast("long").as("n_redacted"),
        regexp_replace(
          concat(lit("user"), col("user_id").cast("string"), lit("@example.com")),
          "(?i)[a-z0-9._-]+@[a-z0-9.-]+", "<EMAIL>").as("contact_clean"))
      .orderBy(col("event_id"))
  }

  /** k-anonymity threshold for [[q110KAnonymity]] and the facade
    * default: a quasi-identifier cell seen by fewer than K individuals
    * is a re-identification risk. */
  val DefaultK = 5

  /** k-anonymity audit + one-step generalization over the customer
    * quasi-identifiers (nation, market segment) — the privacy gate a
    * pipeline runs before releasing grouped training data. Cells with
    * fewer than K members are generalized (segment → '*') and re-counted
    * at the coarser grain; a generalized cell that STILL falls below K
    * is flagged `k_ok = false` (it needs suppression, the caller's
    * decision).
    *
    * Scale: everything after the first aggregation operates at CELL
    * grain (|nations|×|segments| rows, not |customers|) — the
    * generalization is a re-keyed second aggregation over that tiny
    * frame, so the raw table is scanned exactly once and never
    * reshuffled. At 100 TB the first hash-agg with map-side combine is
    * the whole cost; materializing generalized ROWS (the facade's job)
    * broadcasts the cell verdicts back instead of shuffling the fact
    * table again. */
  val q110KAnonymity: Q = Q.sql(
    "q110_k_anonymity",
    s"""WITH cells AS (
       |  SELECT c_nationkey AS nat, c_mktsegment AS seg, COUNT(*) AS n
       |  FROM customer GROUP BY 1, 2),
       |gen AS (
       |  SELECT nat, CASE WHEN n >= $DefaultK THEN seg ELSE '*' END AS seg, n
       |  FROM cells)
       |SELECT nat, seg, CAST(SUM(n) AS BIGINT) AS n, SUM(n) >= $DefaultK AS k_ok
       |FROM gen GROUP BY nat, seg
       |ORDER BY nat, seg""".stripMargin
  ) { (s, dir) =>
    kAnonymity(Tables.customer(s, dir).select(
      col("c_nationkey").as("nat"), col("c_mktsegment").as("seg")), DefaultK)
      .orderBy(col("nat"), col("seg"))
  }

  /** (nat, seg) rows → per-cell (nat, seg, n, k_ok) with sub-k cells
    * generalized to (nat, '*') and re-counted. Single scan; the re-key +
    * re-count run at cell grain. */
  private[graft] def kAnonymity(rows: DataFrame, k: Int): DataFrame =
    rows.groupBy(col("nat"), col("seg")).agg(count(lit(1)).as("n"))
      .select(col("nat"),
        when(col("n") >= k, col("seg")).otherwise(lit("*")).as("seg"),
        col("n"))
      .groupBy(col("nat"), col("seg")).agg(sum(col("n")).as("n"))
      .withColumn("k_ok", col("n") >= k)

  /** Bigram-LM cross-entropy quality score — the CCNet/KenLM idiom
    * (a doc whose word sequence is improbable under a language model
    * trained on the corpus itself is boilerplate, gibberish, or
    * off-distribution): train Laplace-smoothed bigram counts on the
    * WHOLE corpus in one pass, then score each doc by its average
    * negative log-probability, -1/n · Σ ln p(w2|w1) with
    * p(w2|w1) = (c(w1,w2)+1) / (c(w1)+V).
    *
    * Determinism at 1000 executors: per-bigram log-probs are rounded to
    * integer micro-nats row-locally (each term is a pure function of
    * exact integer counts), then summed as exact longs — the aggregate
    * is partition-order-independent, unlike a raw double sum. The final
    * division rounds to 6 dp, the q68/q136 discipline.
    *
    * Scale: bigram occurrences are pre-aggregated per (doc, w1, w2)
    * before joining the count tables (map-side combine), and both count
    * joins are hash joins on token keys — the vocabulary scales with the
    * corpus, so neither side is broadcast (the q152 bigram-df
    * discipline). Only the 1-row vocab-size scalar broadcasts. */
  val q161LmQuality: Q = Q.sql(
    "q161_lm_quality",
    """WITH tok AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |uni AS (
      |  SELECT t, COUNT(*) AS c1 FROM (SELECT unnest(w) AS t FROM tok) GROUP BY 1),
      |v AS (SELECT COUNT(*) AS v FROM uni),
      |big AS (
      |  SELECT doc_id, w[k+1] AS w1, w[k+2] AS w2, COUNT(*) AS n_occ
      |  FROM (SELECT doc_id, w, unnest(range(0, len(w) - 1)) AS k FROM tok)
      |  GROUP BY 1, 2, 3),
      |c2t AS (
      |  SELECT w1, w2, CAST(SUM(n_occ) AS BIGINT) AS c2 FROM big GROUP BY 1, 2),
      |scored AS (
      |  SELECT b.doc_id, b.n_occ,
      |    CAST(round(ln((u.c1 + v.v) / (c.c2 + 1.0)) * 1e6) AS BIGINT) AS lp_micro
      |  FROM big b JOIN uni u ON u.t = b.w1
      |  JOIN c2t c ON c.w1 = b.w1 AND c.w2 = b.w2
      |  CROSS JOIN v)
      |SELECT d.doc_id,
      |  coalesce(CAST(SUM(s.n_occ) AS BIGINT), 0) AS n_bigrams,
      |  CAST((2 * SUM(s.lp_micro * s.n_occ) + SUM(s.n_occ))
      |    // (2 * SUM(s.n_occ)) AS BIGINT) / 1e6 AS xent
      |FROM documents d LEFT JOIN scored s ON s.doc_id = d.doc_id
      |GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, dir) =>
    lmQualityOf(Tables.documents(s, dir)).orderBy(col("doc_id"))
  }

  /** Generic form over any (doc_id, text) frame: appends (n_bigrams,
    * xent); docs with fewer than two tokens get n_bigrams = 0 and a
    * NULL score (no bigram evidence — the caller decides the policy).
    *
    * Determinism contract: every arithmetic step is integer-exact and
    * partition-order-independent EXCEPT the `ln` evaluated per distinct
    * Laplace ratio, which depends on the platform libm. That step is
    * covered by [[lmBoundaryGap]] — a spec-enforced audit asserting no
    * vocabulary ratio's scaled log lands near a micro-nat rounding
    * boundary, so a ≤1-ulp libm disagreement cannot flip any rounded
    * integer the rest of the pipeline consumes. */
  private[graft] def lmQualityOf(docs: DataFrame): DataFrame = {
    // coalesce(…, "") makes every join key non-nullable (split yields no
    // nulls), so the count-table joins push no isnotnull filters into
    // one consumer's subtree — differing pushed filters defeat
    // ReuseExchange and re-scan the corpus (the q164 lesson)
    // doc_id too: the final left join pushes isnotnull(doc_id) into the
    // per-doc branch only, which would desync it from the c2t branch
    val tok = docs.select(coalesce(col("doc_id"), lit(-1L)).as("doc_id"),
      split(col("text"), " ").as("w"))
    val uni = tok.select(explode(col("w")).as("t0"))
      .select(coalesce(col("t0"), lit("")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c1"))
    // count(c1 >= 1) ≡ count(*) here (c1 is a group count, always ≥ 1)
    // but REFERENCES c1, keeping this branch's partial aggregate
    // identical to the join branch's so the uni exchange is reused
    val v = uni.agg(count(when(col("c1") >= 1, 1)).as("v"))
    val big = tok.where(size(col("w")) >= 2)
      .select(col("doc_id"),
        slice(col("w"), lit(1), size(col("w")) - 1).as("a"),
        slice(col("w"), lit(2), size(col("w")) - 1).as("b"))
      .select(col("doc_id"), explode(arrays_zip(col("a"), col("b"))).as("bg"))
      .select(col("doc_id"),
        coalesce(col("bg.a"), lit("")).as("w1"),
        coalesce(col("bg.b"), lit("")).as("w2"))
      .groupBy(col("doc_id"), col("w1"), col("w2")).agg(count(lit(1)).as("n_occ"))
    val c2t = big.groupBy(col("w1"), col("w2")).agg(sum(col("n_occ")).as("c2"))
    val scored = big
      .join(uni.withColumnRenamed("t", "w1"), Seq("w1"))
      .join(c2t, Seq("w1", "w2"))
      .crossJoin(broadcast(v))
      .select(col("doc_id"), col("n_occ"),
        round(log((col("c1") + col("v")) / (col("c2") + lit(1.0))) * 1e6, 0)
          .cast("long").as("lp_micro"))
      .groupBy(col("doc_id")).agg(
        sum(col("n_occ")).as("n_bigrams"),
        sum(col("lp_micro") * col("n_occ")).as("lp_sum"))
    // final rounding to 6 dp as EXACT integer half-up — (2a+b) DIV (2b)
    // on int64 micro-nats — not round() of a double quotient: a quotient
    // that lands exactly on a 6-dp half (hit once at sf0.1) rounds
    // differently through the two engines' double paths, while the
    // integer division is bit-identical by construction
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        (expr("(2 * lp_sum + n_bigrams) DIV (2 * n_bigrams)") / 1e6).as("xent"))
  }

  /** Character-entropy verdict thresholds in MICRO-BITS (integer
    * comparisons — no double threshold can straddle engines): natural
    * text runs ~3.5-4.5 bits/char; a low score flags repetitive filler
    * (aaaa…), a high score flags random blobs (base64, hex dumps) —
    * the classic crawl gibberish filter. */
  val DefaultLowEntropyMicroBits = 2000000L
  val DefaultHighEntropyMicroBits = 5500000L

  /** Character-level Shannon entropy per doc, row-local (q170).
    *
    * H = log2(n) − (Σ cᵢ·log2(cᵢ))/n over the per-character counts cᵢ
    * — the algebraic form that keeps every log argument an INTEGER, so
    * the only libm inputs are counts 1..|doc|. The charEntropy spec
    * audits the whole rounded-log2 table for counts up to 2048 (no
    * integer's scaled log2 lands near a .5 micro-bit boundary there —
    * min distance 1.55e-4 at c=2033 — and it pins every gate corpus's
    * max doc length under that range; wider ranges DO contain
    * near-boundary integers, c≈7-8k lands ~6e-7 away). The per-doc sum
    * and the final half-up division are int64-exact, q161's
    * discipline. Docs longer than 2048 chars still score correctly —
    * the audited bound is about cross-engine ORACLE identity.
    *
    * Scale: the whole metric is one row-local expression battery —
    * distinct-chars × doc-length comparisons per row (alphabet-bounded,
    * the q99 repetition idiom), NO shuffle, no explode, no UDF; at
    * 100 TB it is a single scan-speed map stage that stacks onto any
    * downstream shuffle for free (the higher-order functions are
    * interpreted expressions, not codegen — row-local cost, bounded by
    * alphabet × length, measured 95 ms over sf0.1's 100k docs).
    *
    * Tokens come from `regexp_extract_all(text, '.')` — identical
    * single-char semantics in Spark and DuckDB (both default-exclude
    * newlines), dodging the engines' divergent empty-string `split`
    * edge cases. Empty text → n = 0, NULL entropy, verdict 'empty'. */
  private[graft] def charEntropyOf(docs: DataFrame,
                                   lowMicro: Long = DefaultLowEntropyMicroBits,
                                   highMicro: Long = DefaultHighEntropyMicroBits): DataFrame = {
    val counted = docs
      .select(col("doc_id"),
        regexp_extract_all(coalesce(col("text"), lit("")), lit("."), lit(0)).as("cs"))
      .select(col("doc_id"),
        size(col("cs")).cast("long").as("n"),
        aggregate(
          transform(array_distinct(col("cs")),
            d => size(filter(col("cs"), x => x === d)).cast("long")),
          lit(0L),
          (acc, c) => acc + c * round(log2(c.cast("double")) * 1e6, 0).cast("long"))
          .as("s"))
    counted
      .withColumn("h_micro",
        when(col("n") === 0, lit(null).cast("long"))
          .otherwise(expr(
            "CAST(round(log2(n) * 1e6, 0) AS BIGINT) - ((2 * s + n) DIV (2 * n))")))
      .select(col("doc_id"),
        col("n").as("n_chars_counted"),
        (col("h_micro") / 1e6).as("entropy_bits"),
        when(col("n") === 0, "empty")
          .when(col("h_micro") < lowMicro, "low")
          .when(col("h_micro") > highMicro, "high")
          .otherwise("ok").as("verdict"))
  }

  val q170CharEntropy: Q = Q.sql(
    "q170_char_entropy",
    s"""WITH cnt AS (
      |  SELECT doc_id, c, CAST(COUNT(*) AS BIGINT) AS c_n
      |  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '.')) AS c
      |        FROM documents)
      |  GROUP BY 1, 2),
      |agg AS (
      |  SELECT doc_id, CAST(SUM(c_n) AS BIGINT) AS n,
      |    CAST(SUM(c_n * CAST(round(log2(c_n) * 1e6) AS BIGINT)) AS BIGINT) AS s
      |  FROM cnt GROUP BY 1),
      |scored AS (
      |  SELECT doc_id, n,
      |    CAST(round(log2(n) * 1e6) AS BIGINT) - (2 * s + n) // (2 * n) AS h_micro
      |  FROM agg)
      |SELECT d.doc_id,
      |  coalesce(a.n, 0) AS n_chars_counted,
      |  a.h_micro / 1e6 AS entropy_bits,
      |  CASE WHEN a.h_micro IS NULL THEN 'empty'
      |       WHEN a.h_micro < ${DefaultLowEntropyMicroBits} THEN 'low'
      |       WHEN a.h_micro > ${DefaultHighEntropyMicroBits} THEN 'high'
      |       ELSE 'ok' END AS verdict
      |FROM documents d LEFT JOIN scored a USING (doc_id)
      |ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    charEntropyOf(Tables.documents(s, dir)).orderBy(col("doc_id"))
  }

  /** Keyed consistent pseudonymization (q171): the OTHER half of the
    * PII toolbox next to q100's destructive redaction — every user_id
    * maps to a stable salted-hash token, so downstream joins, sessions,
    * and per-user aggregates still line up while the raw identifier
    * never leaves the scan. `user_seq` (the user's event rank) is
    * emitted as the proof: sequence analytics survive pseudonymization.
    *
    * Scale: the token is a row-local md5 (codegen'd built-in, no UDF);
    * the only shuffle is the rank's hash partition on user_id — the
    * same exchange any per-user analytic already pays. NULL user_ids
    * map to the literal 'anon' token (one shared pseudonym, matching
    * the null-partition semantics both engines give the window). */
  private[graft] def pseudonymizeOf(events: DataFrame,
                                    pepper: String = "graft-pepper"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    events.select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .withColumn("user_pseudo",
        when(col("user_id").isNull, lit("anon"))
          .otherwise(substring(
            md5(concat(lit(pepper + ":"), col("user_id").cast("string"))), 1, 16)))
      .withColumn("user_seq",
        row_number().over(Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))))
      .select(col("event_id"), col("user_pseudo"), col("user_seq"), col("event_type"))
  }

  val q171Pseudonymize: Q = Q.sql(
    "q171_pseudonymize",
    """SELECT event_id,
      |  CASE WHEN user_id IS NULL THEN 'anon'
      |       ELSE substr(md5('graft-pepper:' || CAST(user_id AS VARCHAR)), 1, 16)
      |  END AS user_pseudo,
      |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |    AS INTEGER) AS user_seq,
      |  event_type
      |FROM events
      |ORDER BY event_id""".stripMargin
  ) { (s, dir) =>
    pseudonymizeOf(Tables.events(s, dir)).orderBy(col("event_id"))
  }

  /** Boundary-distance audit for the ONE libm-dependent step in the
    * otherwise integer-exact scoring family: [[lmQualityOf]] rounds
    * `ln((c1+V)/(c2+1)) * 1e6` to integer micro-nats, and the JVM and
    * DuckDB evaluate `ln` with different libms. Correctly-rounded-ish
    * libms agree to ~1 ulp — ≤ ~3e-9 at the 1e6 scale for any log this
    * pipeline can produce — so a cross-engine hash mismatch requires a
    * ratio whose scaled log lands within that distance of a `.5`
    * rounding boundary. q82/q121/q129 avoid `ln` entirely (rational
    * scoring); q161 keeps it because cross-entropy IS a log, and this
    * audit makes the assumption checked instead of hoped: it returns,
    * for every DISTINCT (c1+V, c2+1) ratio the vocabulary produces, the
    * distance `|frac(lp_micro) - 0.5|`. The spec asserts the minimum
    * stays above 1e-6 on every gate vocabulary — a ≥300× margin over
    * the worst cross-libm disagreement. Measured floors: 4.2e-5 at
    * sf0.01, 8.2e-4 at sf0.1.
    *
    * The count pipeline mirrors [[lmQualityOf]]'s kernel term for term
    * (same split, same coalesce-to-"" token normalization, same Laplace
    * numerator/denominator); only the per-doc weighting is dropped,
    * which does not affect WHICH ratios occur. */
  private[graft] def lmBoundaryGap(docs: DataFrame): DataFrame = {
    val tok = docs.select(split(col("text"), " ").as("w"))
    val uni = tok.select(explode(col("w")).as("t0"))
      .select(coalesce(col("t0"), lit("")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c1"))
    val v = uni.agg(count(lit(1)).as("v"))
    val big = tok.where(size(col("w")) >= 2)
      .select(
        slice(col("w"), lit(1), size(col("w")) - 1).as("a"),
        slice(col("w"), lit(2), size(col("w")) - 1).as("b"))
      .select(explode(arrays_zip(col("a"), col("b"))).as("bg"))
      .select(coalesce(col("bg.a"), lit("")).as("w1"),
        coalesce(col("bg.b"), lit("")).as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val lp = big
      .join(uni.withColumnRenamed("t", "w1"), Seq("w1"))
      .crossJoin(broadcast(v))
      .select((col("c1") + col("v")).as("num"), (col("c2") + lit(1L)).as("den"))
      .distinct()
      .select(col("num"), col("den"),
        (log(col("num").cast("double") / col("den")) * 1e6).as("lp_micro"))
    lp.select(col("num"), col("den"),
      abs(col("lp_micro") - floor(col("lp_micro")) - lit(0.5)).as("half_dist"))
  }

  val all: Seq[Q] = Seq(q99QualityRules, q100PiiScrub, q110KAnonymity,
    q161LmQuality, q170CharEntropy, q171Pseudonymize)
}
