package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Serve-path parity for the two remaining stored-state families —
  * the AnnIndexSpec / RetrievalSpec discipline (write → read → serve ==
  * inline; layout law: no raw text, no single-file funnels on unbounded
  * pieces; refresh ∝ delta == rebuild) applied to the near-dup band
  * index and the Bloom decontamination index. */
class StoredIndexSpec extends AnyFunSuite {
  import TestSpark._

  private def docs = Tables.documents(spark, Sf0001)

  /** Write under AQE partition-coalescing pinned OFF so the artifact
    * file count reflects the write's OWN shape (at sf0.001 AQE rightly
    * folds tiny shuffles to one partition, which would hide a
    * coalesce(1) funnel from the multi-file law — the RetrievalSpec
    * precedent). */
  private def writeUncoalesced(body: => Unit): Unit = {
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try body finally spark.conf.set(key, prev)
  }

  private def parts(dir: String): Int =
    new java.io.File(dir).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  // ---------------------------------------------------------------- band

  // standing corpus + an incoming batch that re-keys 30 standing docs
  // (identical text ⇒ guaranteed jaccard-1.0 alerts, so the equality
  // checks compare non-empty sets)
  private def standing = docs.filter(col("doc_id") < 200)
    .select(col("doc_id"), col("text"))
  private def incoming = docs.filter(col("doc_id") < 30)
    .select((col("doc_id") + 100000L).as("doc_id"), col("text"))

  test("band index: serve-from-stored == inline gate; layout law") {
    val path = java.nio.file.Files.createTempDirectory("bandidx").toString
    writeUncoalesced { Graft.writeBandIndex(standing, path) }
    val idx = Graft.readBandIndex(spark, path)
    val stored = sortedRows(Graft.nearDupServeStored(incoming, idx, 0.8))
    val inline = sortedRows(Graft.nearDupStream(incoming, standing, 0.8))
    assert(stored.nonEmpty, "planted re-keyed duplicates must alert")
    assert(stored == inline, "stored-index alerts drifted from the inline gate")
    // layout law: no raw text anywhere; the heavy shingle state lives
    // once per doc in docs/, the probe rows in bands/; both pieces are
    // multi-file (no coalesce(1) funnel on unbounded data)
    val (bands, docsPiece) = idx
    assert(bands.columns.toSeq == Seq("doc_id", "b", "bkey"))
    assert(docsPiece.columns.toSeq == Seq("doc_id", "hs", "bkeys"))
    assert(!bands.columns.contains("text") && !docsPiece.columns.contains("text"))
    assert(parts(s"$path/bands") > 1, "bands must be multi-file (band-key partitioned)")
    assert(parts(s"$path/docs") > 1, "docs must be multi-file (doc_id partitioned)")
    assert(docsPiece.count() == standing.count(), "one state row per standing doc")
    assert(bands.count() == 4L * standing.count(), "one probe row per (doc, band)")
  }

  test("band index: stored refresh == rebuild, piece for piece and alert for alert") {
    // generations built like q207: gen1 lacks every 7th doc (-> added),
    // gen2 drops every 6th (-> removed) and rewrites every 5th (-> changed)
    val base = standing
    val g1 = base.filter(col("doc_id") % 7 =!= 0)
    val g2 = base.filter(col("doc_id") % 6 =!= 0)
      .withColumn("text", when(col("doc_id") % 5 === 0,
        concat(col("text"), lit(" freshly appended refresh clause")))
        .otherwise(col("text")))
    val delta = Graft.snapshotDelta(
        g1.withColumn("fp", md5(col("text"))),
        g2.withColumn("fp", md5(col("text"))), "doc_id", "fp")
      .select(col("doc_id"), col("status"), col("text"))
    val p1 = java.nio.file.Files.createTempDirectory("bandg1").toString
    val p2 = java.nio.file.Files.createTempDirectory("bandg2").toString
    val p3 = java.nio.file.Files.createTempDirectory("bandg2r").toString
    Graft.writeBandIndex(g1, p1)
    Graft.refreshStoredBandIndex(spark, p1, delta, p2)
    Graft.writeBandIndex(g2, p3)
    val refreshed = Graft.readBandIndex(spark, p2)
    val rebuilt = Graft.readBandIndex(spark, p3)
    assert(sortedRows(refreshed._1) == sortedRows(rebuilt._1), "bands/ drifted")
    assert(sortedRows(refreshed._2) == sortedRows(rebuilt._2), "docs/ drifted")
    val a1 = sortedRows(Graft.nearDupServeStored(incoming, refreshed, 0.8))
    val a2 = sortedRows(Graft.nearDupServeStored(incoming, rebuilt, 0.8))
    assert(a1.nonEmpty && a1 == a2)
  }

  // --------------------------------------------------------------- bloom

  private def corpus = docs.filter(col("doc_id") % 20 =!= 0)
  private def evalSet = docs.filter(col("doc_id") % 20 === 0)

  test("bloom index: serve-from-stored == inline path; layout law") {
    val path = java.nio.file.Files.createTempDirectory("bloomidx").toString
    writeUncoalesced { Graft.writeBloomIndex(evalSet, path) }
    val idx = Graft.readBloomIndex(spark, path)
    val stored = sortedRows(Graft.bloomDecontaminateStored(corpus, idx))
    val inline = sortedRows(ops.Decontam.bloomDecontaminate(corpus, evalSet))
    assert(stored.nonEmpty && stored == inline,
      "stored-index report drifted from the inline path")
    // layout law: format-stamped bitmap bounded by mBits/64 rows; the
    // unbounded shingle table multi-file; no raw text anywhere
    val (bitmap, shingles) = idx
    assert(bitmap.columns.toSeq == Seq("word", "bits", "m_bits", "k_hashes"))
    assert(shingles.columns.toSeq == Seq("h"))
    assert(bitmap.count() <= ops.Decontam.DefaultBloomBits / 64)
    assert(parts(s"$path/shingles") > 1,
      "shingles must be multi-file (hash partitioned, no coalesce(1) funnel)")
    // a mismatched probe format raises instead of corrupting
    val ex = intercept[Exception] {
      Graft.bloomDecontaminateStored(corpus, idx, bloomHashes = 2).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("bloom index format mismatch")))
  }

  test("bloom index: stored refresh (added eval docs) == rebuild, bitmap byte-identical") {
    val baseEval = docs.filter(col("doc_id") % 40 === 0)
    val deltaEval = docs.filter(col("doc_id") % 40 === 20)
    val p1 = java.nio.file.Files.createTempDirectory("bloomg1").toString
    val p2 = java.nio.file.Files.createTempDirectory("bloomg2").toString
    val p3 = java.nio.file.Files.createTempDirectory("bloomg2r").toString
    Graft.writeBloomIndex(baseEval, p1)
    Graft.refreshStoredBloomIndex(spark, p1, deltaEval, p2)
    Graft.writeBloomIndex(evalSet, p3) // % 20 == 0 is exactly base ∪ delta
    val refreshed = Graft.readBloomIndex(spark, p2)
    val rebuilt = Graft.readBloomIndex(spark, p3)
    assert(sortedRows(refreshed._1) == sortedRows(rebuilt._1),
      "refreshed bitmap must be byte-identical to the rebuild")
    assert(sortedRows(refreshed._2) == sortedRows(rebuilt._2),
      "refreshed shingle table must equal the rebuild's")
    val r1 = sortedRows(Graft.bloomDecontaminateStored(corpus, refreshed))
    val r2 = sortedRows(Graft.bloomDecontaminateStored(corpus, rebuilt))
    assert(r1.nonEmpty && r1 == r2)
  }
}
