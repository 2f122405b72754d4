package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Explain-plan assertions: the scale properties the Scaladoc in
  * ops.Relational claims are verified here, not just asserted in prose.
  *
  * AQE note: at tiny SF, AQE may legitimately broadcast an SF-scaling
  * table at RUNTIME from observed sizes — that is the desired adaptive
  * behavior, not a plan bug. What must never appear is a STATIC
  * broadcast hint on an SF-scaling table, so the hint assertions run
  * against the logical plan, where hints live.
  */
class PlanSpec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, Sf0001)

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q02 pushes its filters into the parquet scan") {
    val plan = formatted(q("q02_filter_project"))
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("GreaterThanOrEqual(l_discount,0.05)"), plan)
    assert(plan.contains("LessThan(l_quantity,10.0)"), plan)
  }

  test("q02 prunes the read schema to referenced columns only") {
    val plan = formatted(q("q02_filter_project"))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema:")).get
    // 4 projected + 3 filter columns; the other 4 lineitem columns must
    // not be read.
    Seq("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
      "l_shipdate", "l_discount").foreach(c => assert(readSchema.contains(c), readSchema))
    Seq("l_returnflag", "l_linestatus", "l_partkey", "l_suppkey", "l_tax")
      .foreach(c => assert(!readSchema.contains(c), readSchema))
  }

  test("q03 carries no static broadcast hint (SF-scaling sides left to AQE)") {
    val logical = q("q03_join_revenue").queryExecution.optimizedPlan.toString
    assert(!logical.toLowerCase.contains("broadcast"), logical)
  }

  test("q23 broadcast-hints ONLY the constant-cardinality nation dimension") {
    val logical = q("q23_snowflake_join").queryExecution.optimizedPlan.toString
    val hintLines = logical.linesIterator.filter(_.toLowerCase.contains("strategy=broadcast")).toSeq
    assert(hintLines.nonEmpty, logical)
    // the hint must sit on the nation side of the first join only —
    // customer/orders must not appear on a hinted side
    assert(!logical.contains("rightHint=(strategy=broadcast)") ||
      !hintLines.exists(l => l.contains("customer") || l.contains("orders")), logical)
  }

  test("q18 window rewrite shuffles exactly once on o_custkey") {
    val plan = formatted(q("q18_group_max_join"))
    // formatted mode puts the partitioning on the Exchange's Arguments
    // line; the final ORDER BY's range exchange is expected and excluded.
    val hashExchanges = plan.linesIterator
      .count(l => l.contains("Arguments: hashpartitioning"))
    assert(hashExchanges == 1,
      s"expected exactly 1 hash Exchange (the window), got $hashExchanges:\n$plan")
  }

  test("q25/q26 dedup plans contain no cartesian product") {
    Seq("q25_neardup_jaccard", "q26_neardup_minhash").foreach { name =>
      val plan = formatted(q(name))
      assert(!plan.contains("CartesianProduct"), s"$name:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$name:\n$plan")
    }
  }

  test("q70 simhash banding plans no cartesian product") {
    val plan = formatted(q("q70_simhash_neardup"))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q73 anti-join carries no forced hint; AQE broadcasts the drop set at runtime") {
    // the drop set is duplication-bounded but NOT bounded by
    // construction (a heavy-dup corpus makes it corpus-scale), so the
    // plan must leave the join strategy to AQE: no static hint in the
    // logical plan, broadcast chosen adaptively from observed sizes
    val df = q("q73_dedup_survivors")
    assert(!df.queryExecution.optimizedPlan.toString.toLowerCase.contains("broadcast"))
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("BroadcastHashJoin") && finalPlan.contains("LeftAnti"),
      finalPlan)
  }

  test("q74 packing runs window + aggregation on ONE shard exchange") {
    // the window hash-partitions by shard; groupBy(shard, bin) is already
    // clustered by shard, so no second hash exchange may appear (the
    // final ORDER BY's range exchange is expected and excluded)
    val plan = formatted(q("q74_token_packing"))
    val hashExchanges = plan.linesIterator
      .count(l => l.contains("Arguments: hashpartitioning"))
    assert(hashExchanges == 1,
      s"expected exactly 1 hash Exchange (the shard window), got $hashExchanges:\n$plan")
  }

  test("q89 profiler plans NO Expand (the fused wide-aggregate regression, 8.7s vs 1.0s)") {
    val plan = formatted(q("q89_profile"))
    assert(!plan.contains("Expand"), plan)
  }

  test("q86 grouping sets runs ONE scan with one Expand (not a union of group-bys)") {
    val plan = formatted(q("q86_grouping_sets"))
    assert(plan.contains("Expand"), plan)
    // formatted mode prints each scan once in the tree and once in the
    // detail section — count the detail headers' Location lines instead
    assert(plan.linesIterator.count(_.contains("Location: InMemoryFileIndex")) == 1, plan)
  }

  test("q91 z-order top-100 plans TakeOrderedAndProject (no global sort materialization)") {
    val plan = formatted(q("q91_zorder"))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q98 cube runs ONE scan with one Expand (not a union of four group-bys)") {
    val plan = formatted(q("q98_cube"))
    assert(plan.contains("Expand"), plan)
    assert(plan.linesIterator.count(_.contains("Location: InMemoryFileIndex")) == 1, plan)
  }

  test("q101 probes the eval shingle set via BROADCAST (corpus side never shuffles pre-agg)") {
    val plan = formatted(q("q101_decontaminate"))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q103/q104 compact the changelog on ONE hash exchange (window + filter fused)") {
    for (name <- Seq("q103_merge_upsert", "q104_scd2_history")) {
      val plan = formatted(q(name))
      val hashExchanges = plan.linesIterator
        .count(l => l.contains("Arguments: hashpartitioning"))
      assert(hashExchanges == 1,
        s"$name: expected exactly 1 hash Exchange, got $hashExchanges:\n$plan")
    }
  }

  test("q113 joins the incident dimension via BROADCAST, never a probe-side pairing") {
    val plan = formatted(q("q113_interval_overlap"))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q114 ranks the (user,type) COUNT table, never the raw event stream") {
    // the window's sort must sit above the aggregate: a plan that windows
    // first would rank |events| rows per user instead of <=|types|
    val plan = formatted(q("q114_mode_per_group"))
    val aggIdx = plan.indexOf("HashAggregate")
    val winIdx = plan.indexOf("Window")
    assert(aggIdx >= 0 && winIdx >= 0, plan)
    // formatted mode prints the tree root-first: the window (above the
    // aggregate in the plan) must appear before it in the text
    assert(winIdx < aggIdx, plan)
  }

  test("every registered query keeps its aggregates partial (no single-point pre-agg shuffle of raw rows)") {
    // HashAggregate must appear in partial+final pairs — spot-check q01.
    val plan = formatted(q("q01_pricing_summary"))
    assert(plan.contains("HashAggregate"), plan)
    assert(plan.contains("partial_"), plan)
  }

  test("q130 decorrelates all four subquery forms into hash joins (no per-row re-execution)") {
    val plan = formatted(q("q130_subqueries"))
    assert(plan.contains("LeftSemi"), plan)   // EXISTS and IN
    assert(plan.contains("LeftAnti"), plan)   // NOT EXISTS
    assert(plan.contains("LeftOuter"), plan)  // scalar COUNT subquery
    // correlation rewrites must not survive as nested-loop re-execution
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q135 decorrelates the LATERAL ORDER BY+LIMIT into a window rank, not per-nation reruns") {
    val plan = formatted(q("q135_lateral_topn"))
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // exactly one scan of orders feeds the aggregate (no per-outer-row rescan)
    val ordersScans = plan.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("orders"))
    assert(ordersScans <= 1, plan)
  }

  test("q129 BM25 broadcasts the term-grain df table; tf aggregates before any join") {
    val plan = formatted(q("q129_bm25"))
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the tf aggregate must sit BELOW the df join (root-first text: join
    // printed before the partial tf aggregate it consumes)
    val joinIdx = plan.indexOf("BroadcastHashJoin")
    val aggIdx = plan.lastIndexOf("partial_count")
    assert(joinIdx >= 0 && aggIdx > joinIdx, plan)
  }

  test("q136 TWA aggregates on the window's own user_id exchange (one hash shuffle total)") {
    val plan = formatted(q("q136_time_weighted"))
    assert(plan.contains("Window"), plan)
    // formatted mode: each Exchange node's partitioning is on its
    // "Arguments:" detail line
    val hashExchanges = plan.linesIterator.count(_.contains("Arguments: hashpartitioning"))
    assert(hashExchanges == 1, plan)
  }

  test("q133 MAD broadcasts both groups-sized median tables; the event scan never exchanges") {
    val plan = formatted(q("q133_mad_outliers"))
    assert(plan.contains("BroadcastHashJoin"), plan)
    // every hash exchange belongs to a tiny grouped-percentile aggregate,
    // never the event stream: the med subplan appears twice statically
    // (dev feeds both mad and the output join; runtime ReuseExchange
    // dedups the identical pair), plus one exchange for the mad agg
    val hashExchanges = plan.linesIterator.count(_.contains("Arguments: hashpartitioning"))
    assert(hashExchanges <= 3, plan)
    // the event stream itself reaches the joins unshuffled: every hash
    // exchange sits directly above a percentile ObjectHashAggregate
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  /** Count parquet scans in the EXECUTED (post-AQE final) plan at
    * sf0.01 — sf0.001 broadcasts everything statically, leaving no hash
    * exchange to reuse. The Initial Plan section legitimately shows the
    * diamond AQE later collapses, so only the Final section counts. */
  private def executedFinalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, Sf001)
    df.collect()
    val full = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    val start = full.indexOf("== Final Plan ==")
    if (start < 0) full
    else full.substring(start, full.indexOf("== Initial Plan ==") match {
      case -1 => full.length
      case i  => i
    })
  }

  test("q164 DSIR executes exactly ONE corpus scan (ReuseExchange collapses the diamonds)") {
    // the zip_with feature fusion plus window-based totals keep the plan
    // linear enough that AQE's ReuseExchange serves every other consumer
    // (bt vs dw, dw vs th) from the first exchange
    val plan = executedFinalPlan("q164_dsir_select")
    assert(plan.linesIterator.count(_.contains("Scan parquet")) == 1, plan)
    assert(plan.contains("ReusedExchange"), plan)
  }

  test("the ReuseExchange sweep holds: executed scan counts stay at their floors") {
    // floors established in plans/R7_PLAN_AUDIT.md — a regression here
    // means a join started pushing an asymmetric isnotnull, or a pruned
    // aggregate column desynced a shared subtree, and a corpus-sized
    // re-scan silently returned
    PlanFloors.executedScanFloors.foreach { case (name, floor) =>
      val scans = executedFinalPlan(name).linesIterator.count(_.contains("Scan parquet"))
      assert(scans <= floor, s"$name: $scans executed scans, floor is $floor")
    }
  }

  test("q189 sliced AUC windows partition by (pid, g) and g - never one global window") {
    val plan = formatted(q("q189_auc_by_lang"))
    // corpus-side prefix: partitioned by (partition id, group)
    assert(plan.contains("windowspecdefinition(__graft_pid"), plan)
    // every other window must carry a partition spec too (the per-group
    // offset table is partitioned by g over <=|partitions| rows/group)
    val globalWindows = plan.linesIterator.count(l =>
      l.contains("windowspecdefinition(") &&
        !l.contains("windowspecdefinition(__graft_pid") &&
        !l.contains("windowspecdefinition(g#"))
    assert(globalWindows == 0, plan)
  }

  test("q166 curriculum ranks inside pid partitions, never one global window") {
    val plan = formatted(q("q166_curriculum"))
    // the corpus-side row_number must be partitioned by spark_partition_id
    assert(plan.contains("windowspecdefinition(pid"), plan)
    // the only empty-partition window runs over the ≤|partitions|-row
    // offset table (prefix sums of per-partition counts), never the docs
    val globalWindows = plan.linesIterator.count(l =>
      l.contains("windowspecdefinition(") && !l.contains("windowspecdefinition(pid"))
    assert(globalWindows <= 1, plan)
  }

  test("q213 Bloom pre-filter: bitmap probes are all BroadcastHashJoins; the corpus never exchanges before the candidate filter") {
    val plan = formatted(q("q213_bloom_decontam"))
    // the k probe joins on __graft_wN keys must be broadcast hash joins
    // (map-side, inside codegen), never shuffle joins of the corpus —
    // formatted mode lists keys in per-operator detail blocks, so find
    // every join block whose keys mention a probe word column
    val probeBlocks = plan.split("\n\n").filter(b =>
      b.contains("keys") && b.contains("__graft_w")).toSeq
    assert(probeBlocks.nonEmpty, plan)
    probeBlocks.foreach(b =>
      assert(b.linesIterator.next().contains("BroadcastHashJoin"),
        s"bitmap probe is not a broadcast hash join:\n$b"))
    // the exact verify join carries NO static broadcast hint (its eval
    // side is presumed big — the operator's premise; AQE may still pick
    // broadcast at runtime from observed sizes)
    val logical = q("q213_bloom_decontam").queryExecution.optimizedPlan.toString
    val hinted = logical.linesIterator
      .filter(_.contains("strategy=broadcast")).mkString("\n")
    // hints exist only for the bitmap sides (word/bits), never for the
    // eval shingle set the verify join probes
    assert(!hinted.contains("__graft_hit") && !hinted.toLowerCase.contains("left_semi"),
      s"verify join must not be statically broadcast-hinted:\n$hinted")
  }

  test("q215 CMS probe is one 1-row-build BNLJ; the term stream aggregates map-side into a single state row") {
    val plan = formatted(q("q215_cms_freq"))
    // at most two nested-loop joins, both 1-row builds: the probe set
    // against the 1-row CMS state, and topTerms' 1-row MG sketch —
    // the deliberate constant-build pattern, nothing corpus-sized
    val bnlj = plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj >= 1 && bnlj <= 2, s"expected 1-2 constant-build BNLJs, got $bnlj:\n$plan")
    // the sketch aggregates (MG + CMS, typed buffers) must keep their
    // partial stage (map-side combine of the token stream, one state
    // row to the final) — ObjectHashAggregate partial+final pairs
    val objAggs = plan.linesIterator.count(_.contains("ObjectHashAggregate"))
    assert(objAggs >= 2, s"sketch aggregates lost their partial stage:\n$plan")
  }
}
