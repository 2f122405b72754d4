package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native 48-bit SimHash must be bit-identical to the composed
  * aggregate/CASE HOF form it replaces — that equivalence is what keeps
  * q70's DuckDB oracle (which replays the same vote-and-threshold math
  * in SQL) checking the full banded pipeline. */
class SimHash48Spec extends AnyFunSuite {
  import TestSpark._

  private val hofForm =
    """aggregate(sequence(0, 47), 0L, (acc, b) -> acc +
      |  CASE WHEN aggregate(hs, 0, (a, h) ->
      |         a + CASE WHEN shiftright(h, b) % 2 = 1 THEN 1 ELSE -1 END) > 0
      |       THEN CAST(pow(2, b) AS BIGINT) ELSE 0L END)""".stripMargin

  test("bit-identical to the composed HOF form on real shingle hashes") {
    val hs = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 5)
      .select(col("doc_id"),
        transform(col("w"), t => ops.Hashes.hexLong(t)).as("hs"))
    val diff = hs
      .withColumn("native", call_function("graft_simhash48", col("hs")))
      .withColumn("hof", expr(hofForm))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diff == 0)
  }

  test("empty array folds to 0 and null elements are skipped, matching the HOF") {
    val rows = spark.sql(
      """SELECT graft_simhash48(CAST(array() AS ARRAY<BIGINT>)) AS a,
        |       graft_simhash48(array(5L, CAST(NULL AS BIGINT))) AS b,
        |       graft_simhash48(CAST(NULL AS ARRAY<BIGINT>)) AS c""".stripMargin).head
    assert(rows.getLong(0) == 0L)
    assert(rows.getLong(1) == 5L) // single vote: bits 0 and 2 of 5 win
    assert(rows.isNullAt(2))
  }

  test("ties vote 0, not 1 (strict majority, matching '> 0')") {
    // two hashes with complementary bit 0: votes cancel to 0 → bit unset
    val r = spark.sql("SELECT graft_simhash48(array(1L, 2L)) AS s").head.getLong(0)
    assert((r & 1L) == 0L && (r & 2L) == 0L,
      "bit0: +1-1=0 unset; bit1: -1+1=0 unset")
  }
}
