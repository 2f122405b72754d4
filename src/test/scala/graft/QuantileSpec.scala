package graft

import org.scalatest.funsuite.AnyFunSuite

/** q68's exact form is oracle-checked; this spec covers what the oracle
  * can't — the sketch path's error bound and the plan property that
  * makes it the 100 TB choice (mergeable partial aggregation). */
class QuantileSpec extends AnyFunSuite {
  import TestSpark._

  test("sketch quantiles land within rank-error tolerance of exact; rank contract holds") {
    // the full internal frame (sketch values + exact rank counts) — the
    // registered q69 publishes only the oracle-safe projection of it
    val rows = ops.Quantiles.quantileSketchOf(Tables.events(spark, Sf001)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (e50, s50) = (r.getDouble(2), r.getDouble(4))
      val (e99, s99) = (r.getDouble(3), r.getDouble(5))
      // value ∈ [0,1000) uniform-ish; accuracy 10000 → rank error ~0.01%
      // of the group; allow a generous absolute window
      assert(math.abs(e50 - s50) <= 25.0, s"p50 off: exact=$e50 sketch=$s50")
      assert(math.abs(e99 - s99) <= 25.0, s"p99 off: exact=$e99 sketch=$s99")
      // the exact-integer rank contract the q69 oracle gates as TRUE
      assert(r.getBoolean(10) && r.getBoolean(11),
        s"rank contract violated: $r")
    }
  }

  test("approx_percentile aggregates with map-side partials (mergeable sketch)") {
    val df = Tables.events(spark, Sf001)
      .groupBy(org.apache.spark.sql.functions.col("event_type"))
      .agg(org.apache.spark.sql.functions.approx_percentile(
        org.apache.spark.sql.functions.col("value"),
        org.apache.spark.sql.functions.lit(0.5),
        org.apache.spark.sql.functions.lit(1000)).as("p50"))
    val physical = df.queryExecution.executedPlan.toString
    // two-phase agg: a partial ObjectHashAggregate/SortAggregate below
    // the exchange proves sketch partials merge before the shuffle
    val aggs = physical.linesIterator.count(l =>
      l.contains("Aggregate") && l.contains("approx_percentile"))
    assert(aggs >= 2, physical)
  }
}
