package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native dot product must be bit-identical to the composed HOF form
  * it replaces — that equivalence is what keeps the DuckDB
  * `list_reduce(list_transform(list_zip(...)))` oracle valid for every
  * similarity operator that scores through it. */
class DotF64Spec extends AnyFunSuite {
  import TestSpark._

  private def hofDot = aggregate(
    zip_with(col("a"), col("b"), (x, y) => x * y),
    lit(0.0), (acc, v) => acc + v)

  test("bit-identical to zip_with+aggregate on the embeddings corpus") {
    val e = Tables.embeddings(spark, Sf0001)
      .select(col("embedding").cast("array<double>").as("v"))
    // self-join-free pairing: each vector against the reversed self
    val diff = e
      .select(col("v").as("a"), reverse(col("v")).as("b"))
      .select(
        call_function("graft_dot_f64", col("a"), col("b")).as("native"),
        hofDot.as("composed"))
      .filter(col("native") =!= col("composed")) // exact, not approx
      .count()
    assert(diff == 0)
  }

  test("null semantics match the HOF form: null array, length mismatch, null element") {
    val rows = spark.sql(
      """SELECT
        |  graft_dot_f64(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS null_arr,
        |  graft_dot_f64(array(1.0d, 2.0d), array(3.0d)) AS len_mismatch,
        |  graft_dot_f64(array(1.0d, CAST(NULL AS DOUBLE)), array(3.0d, 4.0d)) AS null_elem,
        |  graft_dot_f64(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS ok
        |""".stripMargin).head
    assert(rows.isNullAt(0) && rows.isNullAt(1) && rows.isNullAt(2))
    assert(rows.getDouble(3) == 11.0)
  }

  test("empty arrays dot to 0.0 (fold identity), matching the HOF form") {
    val r = spark.sql(
      """SELECT graft_dot_f64(CAST(array() AS ARRAY<DOUBLE>),
        |                     CAST(array() AS ARRAY<DOUBLE>)) AS native,
        |  aggregate(zip_with(CAST(array() AS ARRAY<DOUBLE>),
        |                     CAST(array() AS ARRAY<DOUBLE>), (x, y) -> x * y),
        |            0.0d, (acc, v) -> acc + v) AS composed
        |""".stripMargin).head
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0)
  }

  test("stays inside whole-stage codegen (the point of the native form)") {
    val e = Tables.embeddings(spark, Sf0001)
      .select(col("embedding").cast("array<double>").as("v"))
      .select(call_function("graft_dot_f64", col("v"), col("v")).as("d"))
    // formatted mode stars codegen'd operators; the projection holding
    // the dot must be starred (a non-codegen Expression would force the
    // whole Project out of the codegen span)
    val formatted = e.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.linesIterator.exists(l =>
      l.trim.startsWith("* Project") || l.trim.startsWith("+- * Project")), formatted)
  }
}
