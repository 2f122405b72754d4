package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup

/** The native MinHash signature must be element-identical to the
  * composed transform/array_min HOF form it replaces — that equivalence
  * is what keeps q26's DuckDB oracle (which replays the same universal-
  * hash family in SQL) checking the full LSH pipeline. */
class MinHashSigSpec extends AnyFunSuite {
  import TestSpark._

  private val P = 2147483647L
  private def aLit = array(Dedup.MinhashAB.map(ab => lit(ab._1)): _*)
  private def bLit = array(Dedup.MinhashAB.map(ab => lit(ab._2)): _*)

  private def composed = transform(sequence(lit(0), lit(15)), j =>
    array_min(transform(col("hs"), h =>
      (get(aLit, j) * (h % P) + get(bLit, j)) % P)))

  test("element-identical to the composed HOF form on real shingle hashes") {
    val hs = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 5)
      .select(col("doc_id"),
        transform(col("w"), t => ops.Hashes.hexLong(t)).as("hs"))
    val diff = hs.select(
        call_function("graft_minhash", col("hs"), aLit, bLit, lit(P)).as("native"),
        composed.as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diff == 0)
  }

  test("empty input yields 16 nulls, matching array_min-of-empty") {
    val r = spark.sql(
      s"""SELECT graft_minhash(CAST(array() AS ARRAY<BIGINT>),
         |  array(${Dedup.MinhashAB.map(_._1 + "L").mkString(",")}),
         |  array(${Dedup.MinhashAB.map(_._2 + "L").mkString(",")}), ${P}L) AS sig
         |""".stripMargin).head.getSeq[Any](0)
    assert(r.size == 16 && r.forall(_ == null))
  }

  test("null hash elements are skipped, matching array_min null handling") {
    val r = spark.sql(
      s"""SELECT graft_minhash(array(7L, CAST(NULL AS BIGINT)),
         |  array(3L, 5L), array(1L, 2L), ${P}L) AS sig
         |""".stripMargin).head.getSeq[Long](0)
    assert(r == Seq(3 * 7 + 1, 5 * 7 + 2))
  }

  test("rejects a non-foldable hash-family argument") {
    val e = intercept[Exception] {
      spark.sql(
        """SELECT graft_minhash(array(1L), array(id), array(1L), 7L)
          |FROM range(2)""".stripMargin).collect()
    }
    assert(e.getMessage.contains("foldable") || e.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
