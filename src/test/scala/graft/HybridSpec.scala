package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RRF fusion contract: the integer formula against a scalar replay on
  * planted rank lists, the missing-leg-contributes-0 law, the fused
  * tie-break, and [[Graft.hybridTopK]]'s wiring (hybrid == rrfFuse of
  * its two legs computed independently). */
class HybridSpec extends AnyFunSuite {
  import TestSpark._

  private def leg(name: String, rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("query_id", "doc_id", name)
  }

  private def rrf(rk: Long): Long = if (rk > 0) 1000000L / (60 + rk) else 0L

  test("planted legs: fused milli-points match the scalar formula; missing leg contributes 0") {
    val lex = leg("rk_lex", Seq((1L, 10L, 1L), (1L, 11L, 2L)))
    val sem = leg("rk_sem", Seq((1L, 11L, 1L), (1L, 12L, 2L)))
    val out = Graft.rrfFuse(lex, sem, k = 10).collect()
    // doc 11 in both legs, 10 lex-only, 12 sem-only
    val byDoc = out.map(r => r.getLong(2) -> r).toMap
    assert(byDoc(11L).getLong(3) == rrf(2) + rrf(1)) // 16129 + 16393
    assert(byDoc(10L).getLong(3) == rrf(1) && byDoc(10L).getLong(5) == 0L,
      "lex-only doc must publish rk_sem = 0")
    assert(byDoc(12L).getLong(3) == rrf(2) && byDoc(12L).getLong(4) == 0L,
      "sem-only doc must publish rk_lex = 0")
    // fused order: doc 11 (32522) > doc 10 (16393) > doc 12 (16129)
    assert(out.map(_.getLong(2)).toSeq == Seq(11L, 10L, 12L))
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L), "rk must be 1-based dense")
  }

  test("equal fused scores break ties to the lower doc_id") {
    // docs 20/21 swap leg ranks -> identical rrf sums
    val lex = leg("rk_lex", Seq((1L, 21L, 1L), (1L, 20L, 2L)))
    val sem = leg("rk_sem", Seq((1L, 20L, 1L), (1L, 21L, 2L)))
    val out = Graft.rrfFuse(lex, sem, k = 10).collect()
    assert(out.map(_.getLong(3)).distinct.length == 1, "planted sums must be equal")
    assert(out.map(_.getLong(2)).toSeq == Seq(20L, 21L))
  }

  test("k truncates the fused list per query, not globally") {
    val lex = leg("rk_lex", Seq((1L, 1L, 1L), (1L, 2L, 2L), (2L, 3L, 1L)))
    val sem = leg("rk_sem", Seq((1L, 1L, 1L), (2L, 4L, 1L), (2L, 5L, 2L)))
    val out = Graft.rrfFuse(lex, sem, k = 1).collect()
    assert(out.length == 2 && out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out.forall(_.getLong(1) == 1L))
  }

  test("hybridTopK == rrfFuse of its two legs computed independently (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    import spark.implicits._
    val queries = Seq(1L -> Seq("hash", "join"), 3L -> Seq("dup"))
      .toDF("query_id", "terms")
      .join(emb.select(col("vec_id").as("query_id"), col("v").as("qv")), "query_id")
    val hybrid = Graft.hybridTopK(docs, emb, queries, k = 5, kRetrieve = 10).collect()
    val lex = Graft.bm25TopK(docs, queries.select(col("query_id"), col("terms")), 10)
      .select(col("query_id"), col("doc_id"), col("rk").as("rk_lex"))
    val sem = ops.Similarity.cosineTopKExternal(
        emb, queries.select(col("query_id"), col("qv")), 10)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rk").as("rk_sem"))
    val manual = Graft.rrfFuse(lex, sem, k = 5).collect()
    assert(hybrid.map(_.toSeq).toSeq == manual.map(_.toSeq).toSeq)
    assert(hybrid.nonEmpty)
  }
}
