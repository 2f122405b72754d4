package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Distributed BPE merge training (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — learn the
  * byte-pair-encoding merge table from the corpus itself: the tokenizer-
  * TRAINING counterpart of the engine's token-counting/packing surface
  * (q65's BPE-ish accounting consumes a tokenizer; this builds one).
  *
  * The industrial-scale structure: BPE statistics live at WORD-TYPE
  * grain, not corpus grain — one corpus pass builds the (word, count)
  * table, and every merge round then works on |vocabulary| rows
  * (millions at 100 TB, not billions). Per round: adjacent-pair counts
  * via one explode + map-side-combined aggregation, ONE argmax row
  * collected to the driver (scalars-only driver state, the CC-loop
  * discipline), and a row-local fold applying the merge left-to-right
  * non-overlapping — then a lineage-truncating checkpoint
  * ([[Components.ReliableConfKey]] upgrades to reliable on a cluster).
  *
  * Determinism: the argmax tie-breaks on (count DESC, left, right) — a
  * total order — so the learned merge table is a pure function of the
  * corpus. Iterative data-dependent choice per round → no SQL oracle;
  * BpeSpec pins the exact merge sequence on a hand-computable fixture
  * and corpus-level invariants (symbol-count shrinkage, pair-count
  * monotonicity of the chosen pair).
  */
object Bpe {

  /** End-of-word marker (Sennrich's `</w>`): keeps merges from crossing
    * word boundaries and lets the tokenizer restore spacing. */
  private val Eow = "</w>"

  /** (word, n, syms) at word-TYPE grain: every distinct corpus token
    * with its count and initial symbol sequence (chars + [[Eow]]). */
  private[graft] def wordTable(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .withColumn("syms", concat(split(col("word"), ""), array(lit(Eow))))

  /** Adjacent symbol pairs of each word, weighted by word count:
    * (left, right, cnt). */
  private def pairCounts(state: DataFrame): DataFrame =
    state
      // guard BEFORE the explode: Spark's sequence(1, 0) descends ([1,0])
      // rather than being empty, so a fully-merged single-symbol word
      // would index element 0
      .filter(size(col("syms")) >= 2)
      .select(col("n"), col("syms"),
        explode(sequence(lit(1), size(col("syms")) - 1)).as("i"))
      .select(element_at(col("syms"), col("i")).as("left"),
        element_at(col("syms"), col("i") + 1).as("right"), col("n"))
      .groupBy(col("left"), col("right")).agg(sum(col("n")).as("cnt"))

  /** Train `nMerges` BPE merges on (doc_id, text) docs. Returns the
    * merge table (step, left, right, pair_count) in learning order. */
  private[graft] def trainMerges(docs: DataFrame, nMerges: Int): DataFrame = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val spark = docs.sparkSession
    val rel = Components.sessionReliable(docs)
    if (rel) Components.requireCheckpointDir(docs)
    var state = Components.materialize(wordTable(docs), rel)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      // one aggregated pair table per round; the argmax is ONE driver row
      val top = pairCounts(state)
        .filter(col("cnt") >= 2) // a pair seen once compresses nothing
        .orderBy(col("cnt").desc, col("left"), col("right"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((step, l, r, c))
        val lq = l.replace("\\", "\\\\").replace("'", "\\'")
        val rq = r.replace("\\", "\\\\").replace("'", "\\'")
        // left-to-right non-overlapping fold: (out, pend) state walks the
        // symbol array once; pend holds the candidate left element
        val mergedSyms = expr(
          s"""CASE WHEN x.pend = '' THEN x.out
             |     ELSE concat(x.out, array(x.pend)) END""".stripMargin)
        val folded = expr(
          s"""aggregate(syms,
             |  named_struct('out', CAST(array() AS ARRAY<STRING>), 'pend', ''),
             |  (st, s) -> CASE
             |    WHEN st.pend = '$lq' AND s = '$rq'
             |      THEN named_struct('out', concat(st.out, array('$lq$rq')), 'pend', '')
             |    WHEN st.pend = '' THEN named_struct('out', st.out, 'pend', s)
             |    ELSE named_struct('out', concat(st.out, array(st.pend)), 'pend', s)
             |  END)""".stripMargin)
        state = Components.materialize(
          state.withColumn("x", folded)
            .select(col("word"), col("n"), mergedSyms.as("syms")), rel)
        step += 1
      }
    }
    spark.createDataFrame(merges.toSeq)
      .toDF("step", "left", "right", "pair_count")
      .orderBy(col("step"))
  }

  /** Ten BPE merges learned from the documents corpus — the merge table
    * a subword tokenizer would ship. Iterative data-dependent argmax →
    * no-oracle; BpeSpec pins the exact sequence on a fixture. */
  val q191BpeMerges: Q = Q.noOracle("q191_bpe_merges") { (s, dir) =>
    trainMerges(Tables.documents(s, dir), 10)
  }

  val all: Seq[Q] = Seq(q191BpeMerges)
}
