package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The stored IVF-PQ index round-trip: writeAnnIndex → readAnnIndex →
  * annSearchStored must reproduce the inline q231 gate BIT-FOR-BIT —
  * the promise the q230/q231 plan audits make ("production persists the
  * codebook + codes parquet and serves from it") turned into a law.
  * Parquet round-trips doubles and ints exactly, and the ADC ranking
  * breaks ties on neighbor_id, so nothing may drift. */
class AnnIndexSpec extends AnyFunSuite {
  import TestSpark._

  private def emb = Tables.embeddings(spark, Sf0001)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"), col("label"))

  test("serve-from-stored equals the inline gate bit-for-bit") {
    val path = java.nio.file.Files.createTempDirectory("annidx").toString
    Graft.writeAnnIndex(emb, path)
    val idx = Graft.readAnnIndex(spark, path)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .sortBy(t => (t._1, t._4)).toSeq
    val stored = rows(Graft.annSearchStored(idx, queries, nProbe = 2, topK = 5))
    val inline = rows(ops.Quantize.ivfPqSearch(emb, probeMax = 10L, nProbe = 2, topK = 5))
    assert(stored == inline, "stored-index search drifted from the inline gate")
    assert(stored.nonEmpty)
  }

  test("the stored layout is the production shape: tiny quantizers, list-partitioned codes") {
    val path = java.nio.file.Files.createTempDirectory("annidx2").toString
    Graft.writeAnnIndex(emb, path)
    val (cents, cbRow, codes) = Graft.readAnnIndex(spark, path)
    // quantizer state is constant-grain (broadcast-everywhere at 100 TB)
    assert(cbRow.count() == 1L)
    val k = cents.count()
    assert(k >= 2 && codes.count() == emb.count())
    // codes/ is directory-partitioned by list_id: a 2-probe query reads
    // 2 of k directories and the raw vectors are nowhere in the artifact
    val dirs = new java.io.File(s"$path/codes").listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("list_id=")).toSet
    assert(dirs.size.toLong == k, s"expected $k list_id= partitions, got $dirs")
    assert(!codes.columns.contains("v"), "raw vectors leaked into the stored index")
    // refresh composes against the stored pieces: re-encoding one
    // existing vector through the frozen quantizers is a no-op
    val one = emb.filter(col("vec_id") === 0).select(col("vec_id"), col("v"))
    val delta = one.withColumn("status", lit("changed"))
      .select(col("vec_id"), col("status"), col("v"))
    val refreshed = Graft.refreshIvfPqCodes(codes, delta, cents, cbRow)
    val before = codes.filter(col("vec_id") === 0)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2))).toSeq
    val after = refreshed.filter(col("vec_id") === 0)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2))).toSeq
    assert(after == before,
      "an unchanged embedding re-encoded under frozen quantizers must keep its codes")
  }
}
