package graft

import org.scalatest.funsuite.AnyFunSuite

/** Partition-count invariance gate (VERDICT r8 item 5): many operators
  * CLAIM partitioning/order-independence — integer fixed-point
  * centroids (q79), MAD/z-score double discipline (q107), quantized-idf
  * ranking (q121), libm-free LM scoring (q161), integer rank-sum AUC
  * (q180), register-max HLL merges (q193). Claims drift; this spec
  * machine-checks them: each representative query re-runs under
  * `spark.sql.shuffle.partitions` ∈ {1, 7, 64} and must produce
  * BYTE-IDENTICAL rows (the driver-gate representation: row.toString
  * over the totally-ordered output). Any order-dependent aggregate
  * regression — a naive double sum, a first()-based tiebreak, a
  * partition-dependent seed — now fails the suite instead of flaking
  * the oracle hash at some future partition count. */
class PartitionInvarianceSpec extends AnyFunSuite {
  import TestSpark._

  private val targets = Seq(
    "q79_label_centroids",  // order-independent fixed-point float agg
    "q107_outliers",        // z-score outliers over event amounts
    "q121_ranked_search",   // quantized-idf + fixed-point BM25 ranking
    "q161_lm_quality",      // transcendental-free LM quality scoring
    "q180_auc",             // exact Mann-Whitney AUC, integer rank sums
    "q193_hll_state_merge", // register-max sketch merge (associative)
    // guard family (VERDICT r9 item 4): q206 runs with the bucket guard
    // ENGAGED (23 oversized sf0.001 buckets at cap 4 — AnnSpec pins it),
    // so the fixed-point centroid sums, integer-chain r, and band-sig
    // machinery are all under the gate; q29 covers the adaptive
    // plain-join branch of the same generator
    "q29_emb_neardup",
    "q206_guarded_pairs",
    // r10: the last two one-task global windows were rewritten onto the
    // scalable-prefix pattern (range repartition + broadcast offsets) —
    // gate that the prefix arithmetic is boundary-placement-independent
    "q134_abc_class",
    "q149_ks_drift",
    // r10: incremental band-index refresh — the anti-join + re-band +
    // union composition must not depend on how the delta or the stored
    // index happens to be partitioned
    "q207_band_index_refresh",
    // r10: priority sampling — exact u, one rounded division, top-(k+1)
    // with doc_id tiebreak; a partition-dependent priority or a
    // non-total merge order would reorder the kept set
    "q210_priority_sample",
    // r10: centroid-state refresh — int64 state sums plus a full-outer
    // state join; order-dependence anywhere would shift s_micro
    "q211_centroid_refresh",
    // r10: the per-stratum rank + tau windows must not depend on how
    // strata are spread across input partitions
    "q212_strat_priority_sample",
    // r10: Bloom bitmap built via bit_or (associative/commutative) and
    // probed via seeded xxhash64 — neither may pick up partition order
    "q213_bloom_decontam",
    // r10: inclusion–exclusion over register-max unions — sketches are
    // pure functions of the input sets, so the whole matrix must be too
    "q214_sketch_overlap",
    // r10: CMS state is element-wise long sums (exactly associative);
    // the probe must read identical cells whatever wrote them
    "q215_cms_freq",
    // r11: segment-dedup keeper election is a packed-long MIN (total
    // order); reassembly sorts the surviving-position list — neither
    // may depend on which partition saw a segment first
    "q221_segment_dedup",
    // r11: collision positions arrive from a shuffled semi-join and are
    // sort_array'd before the row-local cut — piece boundaries must not
    // move with the partitioning of the hit stream
    "q222_decontam_spans",
    // r11: CDC chunk boundaries are row-local, but n_occ crosses the
    // hash-grain aggregate + join — counts must not depend on layout
    "q223_cdc_chunks",
    // r11: counted-index refresh merges three aggregates through a
    // full-outer join — increments/decrements are exact longs, so the
    // merged counts must be layout-independent
    "q224_segment_index_refresh",
    // r11: the CDC rewrite's keeper election and packed-span rebuild
    // must not depend on which partition saw a chunk first
    "q225_cdc_dedup",
    // r12: frozen-quantizer SemDeDup — fixed-point centroids, argmin
    // folds over a SORTED centroid array, a min-per-(cluster, v)
    // window, and a distinct dropped set: every stage must be
    // layout-independent for the oracle hash to be meaningful
    "q226_semdedup_frozen",
    // r12: the span-curation capstone chains q225 → q222 → piece rules
    // → four per-source rollups; all integer counts, so any layout
    // dependence anywhere upstream surfaces here
    "q227_span_curation",
    // r12: best-quality keeper election — the (invq, pk) struct MIN is
    // a total order (quality quantized, pk unique), so the elected
    // keeper must not move with partitioning
    "q228_segment_dedup_best",
    "q229_cdc_dedup_best",
    // r12 second pass: IVF-PQ — fixed-point coarse means AND bucket
    // means, argmin folds over sorted arrays, first-min positional
    // encode, 8-term ADC; two quantizers' worth of float discipline
    // under one hash (q230's arithmetic is a strict subset)
    "q231_ivfpq_search",
    // r12 second pass: eval-delta decontam refresh — detection semi-
    // join, affected re-cut, pass-through anti-join + union; piece
    // rows must not depend on how the delta hashes or the stored
    // pieces are laid out
    "q232_decontam_refresh",
    // r12 second pass: code-table refresh — anti-join + map-only delta
    // encode union; unchanged rows must be byte-stable through it
    "q233_ivfpq_refresh")

  test("representative queries are byte-identical under shuffle.partitions in {1, 7, 64}") {
    val conf = spark.conf
    val key = "spark.sql.shuffle.partitions"
    val before = conf.get(key)
    def run(name: String): Seq[String] =
      SparkEntry.queries(name)(spark, Sf0001).collect().map(_.toString).toSeq
    try {
      val runs: Map[Int, Map[String, Seq[String]]] =
        Seq(1, 7, 64).map { p =>
          conf.set(key, p.toString)
          p -> targets.map(n => n -> run(n)).toMap
        }.toMap
      for (n <- targets) {
        assert(runs(1)(n).nonEmpty, s"$n returned no rows — vacuous invariance")
        assert(runs(7)(n) == runs(1)(n),
          s"$n differs between shuffle.partitions=1 and 7")
        assert(runs(64)(n) == runs(1)(n),
          s"$n differs between shuffle.partitions=1 and 64")
      }
    } finally conf.set(key, before)
  }
}
