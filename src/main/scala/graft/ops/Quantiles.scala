package graft.ops

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Quantile operators — exact and sketch forms.
  *
  * Scale design (100 TB): exact `percentile` must materialize every
  * value of a group on one reducer (sort-based, unbounded state) — fine
  * for bounded groups, a scale-killer for hot ones. The production path
  * is `approx_percentile` (Greenwald-Khanna sketch): one streaming pass,
  * bounded memory (O(accuracy) per group), and MERGEABLE partials — the
  * map side combines sketches before the shuffle exactly like a partial
  * sum, so shuffle volume is one sketch per (partition × group), not one
  * row per value. q68 is the exact form the oracle can check; q69 runs
  * both side by side and QuantileSpec bounds the sketch's rank error.
  */
object Quantiles {

  /** Exact grouped quantiles: median and p95 of lineitem quantity per
    * return flag. Spark `percentile` and DuckDB `quantile_cont` both
    * use the standard (n-1)·q linear interpolation on the sorted
    * values; rounding both engines to 6 dp absorbs any final-ulp noise
    * in the interpolation arithmetic. */
  val q68GroupedQuantiles: Q = Q.sql(
    "q68_grouped_quantiles",
    """SELECT l_returnflag,
      |  round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.5), 6) AS median_qty,
      |  round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.95), 6) AS p95_qty,
      |  round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5), 6) AS median_price
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin
  ) { (s, dir) =>
    val l = Tables.lineitem(s, dir)
    l.groupBy(col("l_returnflag"))
      .agg(
        round(percentile(col("l_quantity").cast("double"), lit(0.5)), 6).as("median_qty"),
        round(percentile(col("l_quantity").cast("double"), lit(0.95)), 6).as("p95_qty"),
        round(percentile(col("l_extendedprice").cast("double"), lit(0.5)), 6).as("median_price"))
      .orderBy(col("l_returnflag"))
  }

  /** Exact vs sketch, side by side (same shape as q63's HLL row): the
    * per-event-type value quantiles computed exactly and via the
    * mergeable Greenwald-Khanna sketch at accuracy 10000 (max rank error
    * ≈ n/10000 per group). QuantileSpec asserts the sketch lands within
    * the exact group's value range and close to the exact answer;
    * non-oracle because DuckDB's approx_quantile is a different sketch
    * (t-digest) with different — equally valid — approximation noise. */
  val q69QuantileSketch: Q = Q.noOracle("q69_quantile_sketch") { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        percentile(col("value"), lit(0.5)).as("exact_p50"),
        approx_percentile(col("value"), lit(0.5), lit(10000)).as("sketch_p50"),
        percentile(col("value"), lit(0.99)).as("exact_p99"),
        approx_percentile(col("value"), lit(0.99), lit(10000)).as("sketch_p99"))
      .orderBy(col("event_type"))
  }

  /** Winsorization — clamp each value into its group's [p05, p95] band,
    * the outlier-robust feature-prep stage (the percentile-based
    * complement of q107's z-score flagging: q107 reports, this
    * repairs). Cut points follow q68's cross-engine recipe (exact
    * `percentile` ↔ `quantile_cont`, rounded to 6 dp so both engines
    * clamp against identical constants); each output row keeps the raw
    * value, the clamped value, and a `clipped` audit flag. Per-row
    * output — no aggregate ever sums the clamped doubles, so there is
    * no float-association hazard anywhere.
    *
    * Scale: aggregate-then-broadcast (q117's shape) — the |types|-row
    * cut table broadcasts back onto an unshuffled scan, and the clamp
    * is row-local codegen. Exact percentile state is per-group sorted
    * values (q68's caveat); hot unbounded groups swap in
    * approx_percentile's mergeable sketch (q69) with the same plan
    * shape. */
  val q122Winsorize: Q = Q.sql(
    "q122_winsorize",
    """WITH cuts AS (
      |  SELECT event_type,
      |    round(quantile_cont(value, 0.05), 6) AS lo,
      |    round(quantile_cont(value, 0.95), 6) AS hi
      |  FROM events GROUP BY event_type)
      |SELECT e.event_id, e.event_type, e.value,
      |  LEAST(GREATEST(e.value, c.lo), c.hi) AS v_wins,
      |  e.value < c.lo OR e.value > c.hi AS clipped
      |FROM events e JOIN cuts c USING (event_type)
      |ORDER BY e.event_id""".stripMargin
  ) { (s, dir) =>
    winsorized(Tables.events(s, dir), "event_type", "value", 0.05, 0.95)
      .select(col("event_id"), col("event_type"), col("value"),
        col("v_wins"), col("clipped"))
      .orderBy(col("event_id"))
  }

  /** Generic winsorization over any frame: clamp `valueCol` into its
    * `groupCol` group's [pLo, pHi] percentile band, appending `v_wins`
    * and a `clipped` audit flag (cut columns are graft-prefixed while
    * in flight so user frames with lo/hi columns pass through).
    * Aggregate-then-broadcast; see [[q122Winsorize]] for the scale
    * contract. */
  private[graft] def winsorized(df: org.apache.spark.sql.DataFrame,
                                groupCol: String, valueCol: String,
                                pLo: Double, pHi: Double): org.apache.spark.sql.DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad band [$pLo, $pHi]")
    val cuts = df.groupBy(col(groupCol))
      .agg(
        round(percentile(col(valueCol), lit(pLo)), 6).as("__graft_lo"),
        round(percentile(col(valueCol), lit(pHi)), 6).as("__graft_hi"))
    df.join(broadcast(cuts), Seq(groupCol))
      .withColumn("v_wins",
        least(greatest(col(valueCol), col("__graft_lo")), col("__graft_hi")))
      .withColumn("clipped",
        col(valueCol) < col("__graft_lo") || col(valueCol) > col("__graft_hi"))
      .drop("__graft_lo", "__graft_hi")
  }

  val all: Seq[Q] = Seq(q68GroupedQuantiles, q69QuantileSketch, q122Winsorize)
}
