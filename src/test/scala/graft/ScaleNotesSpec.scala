package graft

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Executed (post-AQE) parquet-scan floors per query, audited in
  * plans/R7_PLAN_AUDIT.md. PlanSpec's ReuseExchange sweep enforces them
  * at runtime; ScaleNotesSpec publishes them in the generated table. */
object PlanFloors {
  val executedScanFloors: Map[String, Int] = Map(
    "q164_dsir_select" -> 1,
    // q142 r15: the (lang, shingle-hash) vocabulary checkpoints once —
    // the registered query's own action reads blocks, zero parquet scans
    "q168_novelty" -> 1, "q142_lang_overlap" -> 0, "q160_leakage_safe_split" -> 1,
    "q152_bigram_rarity" -> 2, "q129_bm25" -> 2, "q121_ranked_search" -> 2,
    "q82_collocations" -> 2, "q106_cohort_retention" -> 2,
    "q162_source_cap" -> 2, "q163_eval_containment" -> 2,
    "q165_ngram_diversity" -> 2, "q169_code_switch" -> 2,
    "q161_lm_quality" -> 3, "q105_funnel" -> 3,
    // round 8: the eval/sketch family — ReuseExchange collapses the
    // score-grain diamonds (q180: offsets + prefix share one exchange;
    // q185: all four cell-frame consumers serve from one scan)
    "q180_auc" -> 1, "q183_calibration" -> 1, "q185_chi2_assoc" -> 1,
    // r15: the bootstrap folded to ONE grouping-free aggregate pass —
    // one scan serves the point estimate and all 32 replicates
    "q181_pr_curve" -> 2, "q184_bootstrap_ci" -> 1,
    // q187: the count branch + the doc-id grid branch prune to different
    // column sets, so the two scans are genuinely different reads
    "q187_phash_groups" -> 2,
    "q178_knn_graph" -> 2,
    // the chat/tokenizer family is row-local by design: one corpus scan
    // (q194/q195 then window inside conversations; q196/q199 fold
    // merges per row and aggregate)
    "q194_chat_turns" -> 1, "q195_chat_template" -> 1,
    "q196_bpe_encode" -> 1, "q199_length_buckets" -> 1,
    // two-pass by contract (MG sketch + exact recount); the third scan
    // is the totals re-aggregation's static twin
    "q198_stream_topk" -> 3,
    // AQE ReuseExchange collapses the prefix/offsets diamond (q200) and
    // the postings/verification diamond (q201) to ONE corpus scan
    "q200_shard_manifest" -> 1, "q201_jaccard_sweep" -> 1,
    // r11: the Gopher battery is row-local BY CONTRACT — one corpus
    // scan feeding one projection; any second scan means an expression
    // escaped the fused pipeline
    "q220_gopher_repetition" -> 1)
}

/** Machine-generates plans/SCALE_NOTES.md — one row per registry query
  * with the physical-plan facts the 100×-readiness argument rests on
  * (VERDICT r7 item 7): parquet scans, shuffle count, the DISTINCT
  * shuffle grains (hash/range partitioning keys), broadcast count, and
  * the PlanSpec-enforced executed scan floor where one is pinned. All
  * derived from the statically-planned physical plan at sf0.001 (AQE may
  * further collapse exchanges at runtime — the floor column records the
  * executed truth for the audited queries). Like the README facade
  * table, the committed file must byte-match the generated content, so
  * scaladoc claims and the real plans cannot drift apart. */
class ScaleNotesSpec extends AnyFunSuite {
  import TestSpark._

  private val GrainRe = """(hash|range)partitioning\((.*), \d+\)""".r

  /** Strip expr ids / plan ids so output is stable across JVMs. */
  private def scrub(s: String): String =
    s.replaceAll("#\\d+L?", "").replaceAll("#\\d+", "")

  private def cell(s: String): String = s.replace("|", "\\|")

  private def row(q: Q): String = {
    val oracle = if (q.oracle.isDefined) "yes" else "spec"
    if (!q.inBench)
      return s"| ${q.name} | $oracle | — | — | iterative ML fit — bench-excluded; " +
        "exercised by Verify at sf0.01 and named specs | — | — |"
    val plan = q.fn(spark, Sf0001).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    val lines = plan.linesIterator.toSeq
    // match only the detail-section headers "(N) Scan parquet" — the tree
    // section repeats every operator and would double-count
    val scans = lines.count(_.trim.matches("""\(\d+\) Scan parquet.*"""))
    val exchanges = lines.count(_.trim.matches("""\(\d+\) Exchange.*"""))
    val broadcasts = lines.count(_.trim.matches("""\(\d+\) BroadcastExchange.*"""))
    val grains = lines.flatMap(l => GrainRe.findFirstMatchIn(l).map { m =>
      val keys = scrub(m.group(2)).replaceAll("\\s+", " ").trim
      val tag = if (m.group(1) == "range") "range: " else ""
      tag + (if (keys.length > 48) keys.take(45) + "…" else keys)
    }).distinct
    val grainCell =
      if (grains.isEmpty) "none (scan-local)"
      else if (grains.size <= 3) grains.mkString("; ")
      else grains.take(3).mkString("; ") + s"; +${grains.size - 3} more"
    val floor = PlanFloors.executedScanFloors.get(q.name)
      .map(f => s"≤$f executed").getOrElse("—")
    s"| ${q.name} | $oracle | $scans | $exchanges | ${cell(grainCell)} | $broadcasts | $floor |"
  }

  test("plans/SCALE_NOTES.md matches the machine-generated registry scale table") {
    val header = Seq(
      "# SCALE_NOTES — generated by ScaleNotesSpec, do not hand-edit",
      "",
      "One row per registry query: statically-planned parquet scans, shuffle",
      "exchanges and their DISTINCT partitioning grains, broadcast exchanges,",
      "and the PlanSpec-enforced executed (post-AQE) scan floor where one is",
      "pinned (plans/R7_PLAN_AUDIT.md). Derived from the formatted physical",
      "plan at sf0.001; AQE may collapse further at runtime, never expand.",
      "On drift: copy target/SCALE_NOTES.md over this file and review the",
      "diff like a plan regression.",
      "",
      "| query | oracle | scans | shuffles | shuffle grain | broadcasts | scan floor |",
      "|-------|--------|-------|----------|---------------|------------|------------|")
    val content = (header ++ SparkEntry.registry.map(row)).mkString("", "\n", "\n")
    val gen = java.nio.file.Paths.get("target/SCALE_NOTES.md")
    java.nio.file.Files.createDirectories(gen.getParent)
    java.nio.file.Files.writeString(gen, content)
    val committed = java.nio.file.Paths.get("plans/SCALE_NOTES.md")
    assert(java.nio.file.Files.exists(committed),
      "plans/SCALE_NOTES.md missing — copy target/SCALE_NOTES.md")
    val have = java.nio.file.Files.readString(committed)
    assert(have == content,
      "plans/SCALE_NOTES.md drifted from the generated table — " +
        "copy target/SCALE_NOTES.md over it and review the diff")
  }
}
