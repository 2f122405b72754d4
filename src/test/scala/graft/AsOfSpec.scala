package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.AsOf

/** The temporal joins are verified two ways: the DuckDB oracle checks the
  * union-window / bucketed formulations against DuckDB's native ASOF and
  * inequality joins at sf0.01, and these tests check them against a
  * brute-force Spark formulation at sf0.001 — plus the plan property the
  * whole design exists for: no nested-loop or cartesian operator. */
class AsOfSpec extends AnyFunSuite {
  import TestSpark._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, Sf0001)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("as-of join matches the brute-force max-over-inequality-join form") {
    val ev = Tables.events(spark, Sf0001)
    val probe = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val ref = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
        col("event_id").as("r_id"), col("value").as("r_value"))
    // brute force: all candidates at-or-before, keep the (ts, event_id)-max
    val brute = probe
      .join(ref, col("p_user") === col("r_user") && col("r_ts") <= col("p_ts"), "left")
      .groupBy(col("event_id"))
      .agg(max_by(col("r_value"), struct(col("r_ts"), col("r_id"))).as("expected"))
    val got = SparkEntry.queries("q66_asof_join")(spark, Sf0001)
      .select(col("event_id"), col("last_purchase_value"))
    val diff = got.join(brute, "event_id")
      .filter(!(col("last_purchase_value") <=> col("expected")))
    assert(diff.count() == 0, diff.show())
    assert(got.count() == probe.count()) // left semantics: every click kept
  }

  test("forward as-of matches the brute-force min-over-inequality-join form") {
    val ev = Tables.events(spark, Sf0001)
    val probe = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val ref = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
        col("event_id").as("r_id"), col("value").as("r_value"))
    // brute force: all candidates at-or-after, keep the ts-min (ties by
    // max event_id — the deduped-ref convention both engines share)
    val brute = probe
      .join(ref, col("p_user") === col("r_user") && col("r_ts") >= col("p_ts"), "left")
      .groupBy(col("event_id"))
      .agg(min_by(col("r_value"), struct(col("r_ts"), -col("r_id"))).as("expected"))
    val got = SparkEntry.queries("q81_asof_forward")(spark, Sf0001)
      .select(col("event_id"), col("next_purchase_value"))
    val diff = got.join(brute, "event_id")
      .filter(!(col("next_purchase_value") <=> col("expected")))
    assert(diff.count() == 0, diff.show())
    assert(got.count() == probe.count())
  }

  test("range-join counts match the brute-force inequality join") {
    val ev = Tables.events(spark, Sf0001)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val brute = p.join(c,
        col("p_user") === col("c_user") && col("c_ts") > col("p_ts") &&
          col("c_ts") <= col("p_ts") + expr("INTERVAL 10 MINUTES"), "left")
      .groupBy(col("event_id")).agg(count(col("c_ts")).as("expected"))
    val got = SparkEntry.queries("q67_range_join_count")(spark, Sf0001)
    val diff = got.join(brute, "event_id")
      .filter(col("n_clicks_10m") =!= col("expected"))
    assert(diff.count() == 0, diff.show())
    assert(got.count() == p.count())
  }

  test("neither temporal join plans a nested-loop or cartesian operator") {
    for (name <- Seq("q66_asof_join", "q81_asof_forward", "q67_range_join_count",
        "q123_attribution")) {
      val s = plan(name)
      assert(!s.contains("CartesianProduct"), s"$name:\n$s")
      assert(!s.contains("BroadcastNestedLoopJoin"), s"$name:\n$s")
    }
  }

  test("attribution splits purchases exactly like the brute-force lookback") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, Sf0001)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t"),
        col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val clicksByUser = ev.filter(_._2 == "click").groupBy(_._1)
      .map { case (u, g) => u -> g.map(_._3).sorted }
    val expected = ev.filter(_._2 == "purchase")
      .map { case (u, _, t, v) =>
        val lastClick = clicksByUser.getOrElse(u, Array.empty[Long])
          .takeWhile(_ <= t).lastOption
        val attr = lastClick.exists(c => t - c <= 604800000000L)
        (t / 86400000000L, attr, BigDecimal(v).setScale(2))
      }
      .groupBy(_._1).map { case (d, g) =>
        d -> ((g.size.toLong, g.count(_._2).toLong,
          g.filter(_._2).map(_._3).sum.toDouble,
          g.filterNot(_._2).map(_._3).sum.toDouble))
      }
    val got = SparkEntry.queries("q123_attribution")(spark, Sf0001).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got == expected)
    // both outcomes occur on the fixture or the split is vacuous
    assert(got.values.exists(_._2 > 0) && got.values.exists(v => v._1 > v._2))
  }
}
