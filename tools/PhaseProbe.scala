package graft

import org.apache.spark.sql.functions._

/** q143 phase-timing diagnostic (R14 demand 2 — naming the residual
  * q143-specific inflation on the driver-class host with E6-grade
  * rigor): times each stage of the training-manifest DAG in isolation
  * so the host-sensitive phase is identified by measurement, not
  * theory. Run: `sbt "runMain graft.PhaseProbe"`. Not registered;
  * lives in tools/ (off the classpath) once its data is captured. */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "graft-phase-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, dir)

    // NO blanket block sweep between phases: later phases read the
    // `hashed` localCheckpoint built below — unpersisting it mid-probe
    // yields CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND on the next phase. The
    // few MB of accumulated probe state at sf0.1 are irrelevant to the
    // phase timings.
    def t(label: String)(body: => Unit): Unit = {
      body // warm
      val times = Seq.tabulate(2) { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"phase":"$label","sec":${times.min}%.3f}""")
    }

    t("textStats") { ops.TextAnalysis.textStats(spark, dir).count() }
    t("hashedShingles_count") { ops.Dedup.hashedShinglesOf(docs).count() }
    t("materialize_localckpt") {
      val m = ops.Components.materialize(ops.Dedup.hashedShinglesOf(docs), reliable = false)
      ops.Components.releaseBlocks(m)
    }
    val hashed = ops.Components.materialize(ops.Dedup.hashedShinglesOf(docs), reliable = false)
    t("minhashPairs_from_mat") { ops.Dedup.minhashPairsOf(hashed).count() }
    val pairs = ops.Dedup.minhashPairsOf(hashed).select(col("i"), col("j"))
    t("connectedComponents") { ops.Components.connectedComponents(pairs).count() }
    t("decontaminate_from_mat") {
      ops.Decontam.decontaminateHashed(
        hashed.filter(col("doc_id") % 20 =!= 0),
        hashed.filter(col("doc_id") % 20 === 0), 0.1).count()
    }
    val q143 = SparkEntry.registry.find(_.name == "q143_training_manifest").get
    t("q143_full") { q143.fn(spark, dir).count() }
    spark.stop()
  }
}
