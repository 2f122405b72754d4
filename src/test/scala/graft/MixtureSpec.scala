package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Temperature-mixture-plan contract: exact arithmetic on a planted
  * count table, the flattening laws (small domains gain share, order
  * never inverts, never over-allocates), the epoch cap, and the range
  * guards. */
class MixtureSpec extends AnyFunSuite {
  import TestSpark._

  private def counts(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    rows.toDF("source", "n_tokens")
  }

  test("planted counts: exact integer plan, flattening beats proportional for the small domain") {
    // n = 1M / 250k / 10k: √n weights 1000 / 500 / 100
    val out = Graft.temperatureMixturePlan(
      counts(Seq("big" -> 1000000L, "mid" -> 250000L, "small" -> 10000L)),
      sum(col("n_tokens")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getBoolean(7))).toMap
    val b = 1260000L; val sw = 1600L
    assert(out("big") == (1000L, 625000L, 1000L * b / sw,
      math.min(1000L * b / sw, 4000000L), (1000L * b / sw) * 1000L / 1000000L, true))
    assert(out("mid") == (500L, 312500L, 500L * b / sw,
      math.min(500L * b / sw, 1000000L), (500L * b / sw) * 1000L / 250000L, true))
    assert(out("small") == (100L, 62500L, 100L * b / sw,
      math.min(100L * b / sw, 40000L), (100L * b / sw) * 1000L / 10000L, true))
    // flattening: the small domain's share (6.25%) beats proportional
    // (10000/1260000 ≈ 0.8%); the big domain still gets the most tokens
    assert(out("small")._2 > 10000L * 1000000L / 1260000L)
    assert(out("big")._3 > out("mid")._3 && out("mid")._3 > out("small")._3)
    // Σ quota ≤ B — also published as sum_ok
    assert(out.values.map(_._3).sum <= b)
  }

  test("epoch cap binds exactly when the quota implies > MaxEpochs repeats") {
    // tiny domain beside a huge one: its √n share implies many epochs
    val out = Graft.temperatureMixturePlan(
      counts(Seq("huge" -> 1000000000L, "tiny" -> 100L)),
      sum(col("n_tokens")))
      .collect().map(r => r.getString(0) -> r).toMap
    val tiny = out("tiny")
    assert(tiny.getLong(4) > tiny.getLong(5), "cap must bind for the tiny domain")
    assert(tiny.getLong(5) == 100L * ops.Mixture.MaxEpochs)
    assert(tiny.getLong(6) > 1000L * ops.Mixture.MaxEpochs, "uncapped epochs published")
    val huge = out("huge")
    assert(huge.getLong(4) == huge.getLong(5), "cap must not bind for the huge domain")
  }

  test("zero-token domain fails loudly instead of dividing by zero") {
    // n_tokens = 0 would make epochs_milli a div-by-zero (and an
    // all-zero table would zero Σw) — the ≥ 1 guard turns both into a
    // raise_error before any div runs, so Spark's NULL-on-div-by-zero
    // can never silently diverge from an erroring oracle.
    val ex = intercept[Exception] {
      Graft.temperatureMixturePlan(
        counts(Seq("ok" -> 1000L, "empty" -> 0L)), sum(col("n_tokens"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("mixture plan: n_tokens")))
  }

  test("range guards fire loudly") {
    val ex = intercept[Exception] {
      Graft.temperatureMixturePlan(
        counts(Seq("a" -> 2000000000000L)), sum(col("n_tokens"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("mixture plan: n_tokens")))
  }

  test("q237 gate: every source planned, invariants hold at sf0.01") {
    val rows = SparkEntry.queries("q237_mixture_plan")(spark, Sf001).collect()
    val nSources = Tables.documents(spark, Sf001)
      .select(col("source")).distinct().count()
    assert(rows.length == nSources)
    assert(rows.forall(_.getBoolean(7)), "sum_ok must hold")
    rows.foreach { r =>
      assert(r.getLong(5) <= r.getLong(4), "capped quota must not exceed raw quota")
      assert(r.getLong(5) <= r.getLong(1) * ops.Mixture.MaxEpochs)
    }
    val b = rows.map(_.getLong(1)).sum
    assert(rows.map(_.getLong(4)).sum <= b, "plan over-allocates")
  }
}
