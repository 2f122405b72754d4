package graft

import org.apache.spark.sql.functions._

/** r14 optimization-round phase probe: decomposes the bench's slowest
  * queries into their pipeline stages so the expensive stage is named
  * by measurement before anything is rewritten (guide §1). Run:
  * `SPARK_GRAFT_CPUS=32 sbt "runMain graft.OptProbe"`. Not registered;
  * moves to tools/ once its numbers are captured. */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-opt-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, dir)
    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)

    def sweep(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    def t(label: String)(body: => Unit): Unit =
      if (only.forall(_.exists(label.startsWith))) {
        body // warm
        sweep()
        val times = Seq.tabulate(2) { _ =>
          val t0 = System.nanoTime(); body; val s = (System.nanoTime() - t0) / 1e9
          sweep(); s
        }
        println(f"""{"phase":"$label","sec":${times.min}%.3f}""")
      }

    val byName = SparkEntry.registry.map(q => q.name -> q).toMap
    def q(name: String): Unit = t(name) { byName(name).fn(spark, dir).count() }

    // --- shared upstream stages ---
    t("stage_shingles") { ops.Dedup.hashedShinglesOf(docs).count() }
    t("stage_minhashPairs") {
      ops.Dedup.minhashPairs(spark, dir).count()
    }
    t("stage_cc_over_pairs") {
      ops.Components.connectedComponents(
        ops.Dedup.minhashPairs(spark, dir).select(col("i"), col("j"))).count()
    }
    t("stage_statsOf") {
      ops.TextAnalysis.statsOf(docs.withColumn("lang", lit(""))).count()
    }

    // --- q158 decomposition ---
    q("q158_best_survivors")
    q("q73_dedup_survivors")

    // --- q208/q217 decomposition ---
    t("stage_standing_pairs") {
      val d = ops.Dedup.hashedShinglesOf(docs)
      ops.Dedup.minhashPairsOf(d.filter(col("doc_id") % 3 =!= 0)).count()
    }
    t("stage_newpairs") {
      val d = ops.Dedup.hashedShinglesOf(docs)
      val standing = d.filter(col("doc_id") % 3 =!= 0)
      val incoming = d.filter(col("doc_id") % 3 === 0)
      ops.Dedup.crossVerifiedPairs(standing, incoming).select(col("i"), col("j"))
        .unionByName(ops.Dedup.minhashPairsOf(incoming).select(col("i"), col("j")))
        .count()
    }
    q("q208_component_refresh")
    q("q217_incremental_ingest")
    q("q218_component_retire")

    // --- q175 decomposition ---
    t("stage_trade_edges") {
      graft.Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"))
        .join(graft.Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(graft.Tables.customer(spark, dir)
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(graft.Tables.supplier(spark, dir)
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
        .count()
    }
    q("q175_pagerank")

    // --- other top-of-table queries, as-registered ---
    Seq("q192_cv_folds", "q160_leakage_safe_split", "q240_hybrid_rrf",
      "q239_stored_neardup_serve", "q206_guarded_pairs", "q231_ivfpq_search",
      "q191_bpe_merges", "q186_clustering_coeff", "q145_triangles",
      "q143_training_manifest", "q230_pq_adc_frozen", "q177_dup_spans",
      "q201_jaccard_sweep", "q147_schema_merge", "q128_dup_passages",
      "q179_embed_clusters", "q154_neardup_diff", "q232_decontam_refresh",
      "q187_phash_groups", "q144_market_basket", "q236_batch_retrieval",
      "q72_dedup_components").foreach(q)

    spark.stop()
  }
}
