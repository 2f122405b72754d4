package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.MisraGries

/** Exact top-k heavy hitters at sketch cost — the two-pass pattern:
  * a Misra-Gries sketch pass surfaces ≤ width candidates (shuffle =
  * width rows per partition, NOT one row per distinct term), then an
  * exact recount touches only the candidates. Output is EXACT top-k —
  * provably, whenever the k-th count exceeds N/(width+1), the sketch's
  * capture bound — computed without ever hash-aggregating the full term
  * domain. The frequent-terms primitive for vocab building / stopword
  * discovery over a 100 TB corpus whose term domain is billions wide.
  */
object HeavyHitters {

  /** (term, cnt, rk) for the exact top-k terms of `terms` (a one-column
    * frame of strings), via sketch-then-recount. Valid (= exact) when
    * cnt_k > N/(width+1); callers size `width` from the expected skew. */
  def topTerms(terms: DataFrame, k: Int, width: Int = 64): DataFrame = {
    val termCol = terms.columns.head
    val sketch = terms.agg(MisraGries.udaf(width)(col(termCol)).as("mg"))
    val cands = sketch.select(explode(map_keys(col("mg"))).as(termCol))
    // exact recount restricted to candidates: broadcast the ≤width-row
    // candidate set, one map-side-combined count over the filtered stream
    val counts = terms
      .join(broadcast(cands), termCol)
      .groupBy(col(termCol)).agg(count(lit(1)).as("cnt"))
    // global rank over a ≤width-row frame — the single-partition window
    // is candidates-sized by construction, never corpus-sized
    counts
      .withColumn("rk", row_number().over(Window.orderBy(col("cnt").desc, col(termCol))))
      .filter(col("rk") <= k)
      .orderBy(col("rk"))
  }

  /** Top-10 corpus terms. This synthetic corpus's 31-word vocabulary all
    * fits in width=64 (the sketch never decrements), so the oracle can
    * demand exact equality with a full GROUP BY; MisraGriesSpec drives
    * the decrement/merge paths the fixture can't reach. */
  val q90HeavyHitters: Q = Q.sql(
    "q90_heavy_hitters",
    """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
      |c AS (SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term),
      |r AS (SELECT term, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS rk FROM c)
      |SELECT term, cnt, rk FROM r WHERE rk <= 10
      |ORDER BY rk""".stripMargin
  ) { (s, dir) =>
    topTerms(
      Tables.documents(s, dir).select(explode(split(col("text"), " ")).as("term")),
      k = 10)
  }

  /** Per-language approximate distinct token count via the
    * [[graft.functions.HllDistinct]] sketch — COUNT(DISTINCT) at 4 KB of
    * state per group instead of a shuffle of the full token domain. The
    * vocabulary-size profile a tokenizer-prep pass runs per language /
    * per source on a corpus whose distinct-term space is billions wide.
    * Sketch (hash-seeded, no oracle-able SQL twin) → no-oracle; HllSpec
    * pins accuracy vs exact, partitioning-independence, and merge
    * semantics. */
  val q182HllDistinct: Q = Q.noOracle("q182_hll_distinct") { (s, dir) =>
    approxDistinct(
      Tables.documents(s, dir)
        .select(col("lang"), explode(split(col("text"), " ")).as("term")),
      col("lang"), col("term"))
      .orderBy(col("lang"))
  }

  /** Generic form: (groupCol, est_distinct) — the HLL estimate of
    * distinct `value` per group. Null values are excluded (the
    * COUNT(DISTINCT) convention — and a null hash must never reach the
    * Long-typed aggregator). Shuffle = one 4 KB sketch per group after
    * map-side partial aggregation, independent of cardinality. */
  def approxDistinct(df: DataFrame, group: org.apache.spark.sql.Column,
                     value: org.apache.spark.sql.Column): DataFrame =
    df.filter(value.isNotNull)
      .groupBy(group)
      .agg(graft.functions.HllDistinct.udaf(
        call_function("graft_md5long64", value.cast("string"))).as("est_distinct"))

  /** Sketch-STATE distinct counting — the materialized-view form of
    * q182: per-(lang, source) 4 KB register sketches are built once
    * (the stored state a daily pipeline persists per partition), then
    * UNIONED per lang into estimates without ever rescanning base
    * data. Register-max union is associative/commutative/idempotent,
    * so the merged estimate is IDENTICAL to q182's direct pass — not
    * approximately: the same sketch, byte for byte (HllSpec asserts
    * equality). The mergeAggState (q112) discipline extended from
    * algebraic COUNT/SUM to sketches. */
  val q193HllStateMerge: Q = Q.noOracle("q193_hll_state_merge") { (s, dir) =>
    val toks = Tables.documents(s, dir)
      .select(col("lang"), col("source"), explode(split(col("text"), " ")).as("term"))
    val state = toks.groupBy(col("lang"), col("source"))
      .agg(graft.functions.HllDistinct.sketchUdaf(
        call_function("graft_md5long64", col("term").cast("string"))).as("sk"))
    mergeDistinctSketches(state, col("lang"), col("sk"))
      .orderBy(col("lang"))
  }

  /** Stored-sketch builder: (group…, sketch) — persist this as state. */
  def distinctSketch(df: DataFrame, group: org.apache.spark.sql.Column,
                     value: org.apache.spark.sql.Column): DataFrame =
    df.filter(value.isNotNull)
      .groupBy(group)
      .agg(graft.functions.HllDistinct.sketchUdaf(
        call_function("graft_md5long64", value.cast("string"))).as("sketch"))

  /** Union stored sketches to estimates: (group, est_distinct). */
  def mergeDistinctSketches(state: DataFrame, group: org.apache.spark.sql.Column,
                            sketch: org.apache.spark.sql.Column): DataFrame =
    state.groupBy(group)
      .agg(graft.functions.HllDistinct.unionUdaf(sketch).as("est_distinct"))

  val all: Seq[Q] = Seq(q90HeavyHitters, q182HllDistinct, q193HllStateMerge)
}
