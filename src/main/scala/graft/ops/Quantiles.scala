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
  * row per value. q68 is the exact form the oracle checks value-for-
  * value; q69 runs exact and sketch side by side and is oracle-paired
  * on the exact columns PLUS the sketch's rank contract as booleans
  * (QuantileSpec keeps the tighter numeric error bounds).
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

  /** Exact + sketch per-group quantiles with the sketch reduced to its
    * RANK CONTRACT (oracle-paired since r13; the raw sketch VALUES stay
    * engine-internal — DuckDB's approx_quantile is a different sketch
    * (t-digest) with different, equally valid, approximation noise, so
    * the values can never hash-compare). What CAN be paired:
    *  - n and the exact percentiles (q68's rounded quantile_cont recipe);
    *  - the Greenwald-Khanna guarantee itself, asserted as exact-integer
    *    booleans: the sketch output is an OBSERVED value, so its true
    *    rank interval is [cnt_lt+1, cnt_le] (both exact counts from a
    *    second pass); the GK contract says that interval must meet
    *    [ceil(q·n) − err, ceil(q·n) + err] with err = n/accuracy plus a
    *    +2 slack absorbing the ceil-vs-(n−1)q target ambiguity. The
    *    oracle emits literal TRUE — any engine sketch that ever violates
    *    its documented bound flips the boolean and hash-fails the gate.
    * [[quantileSketchOf]] exposes the full frame (sketch values, rank
    * counts) for QuantileSpec's tighter numeric assertions. */
  private[graft] def quantileSketchOf(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val g = events.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(percentile(col("value"), lit(0.5)), 6).as("exact_p50"),
        round(percentile(col("value"), lit(0.99)), 6).as("exact_p99"),
        approx_percentile(col("value"), lit(0.5), lit(10000)).as("sketch_p50"),
        approx_percentile(col("value"), lit(0.99), lit(10000)).as("sketch_p99"))
    val ranks = events
      .join(broadcast(g.select(col("event_type"),
        col("sketch_p50").as("__s50"), col("sketch_p99").as("__s99"))), "event_type")
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("value") < col("__s50"), 1L).otherwise(0L)).as("lt50"),
        sum(when(col("value") <= col("__s50"), 1L).otherwise(0L)).as("le50"),
        sum(when(col("value") < col("__s99"), 1L).otherwise(0L)).as("lt99"),
        sum(when(col("value") <= col("__s99"), 1L).otherwise(0L)).as("le99"))
    def rankOk(lt: String, le: String, target: org.apache.spark.sql.Column) = {
      val err = expr("n DIV 10000") + lit(2L)
      col(le) >= target - err && col(lt) + lit(1L) <= target + err
    }
    g.join(broadcast(ranks), "event_type")
      .select(col("event_type"), col("n"),
        col("exact_p50"), col("exact_p99"),
        col("sketch_p50"), col("sketch_p99"),
        col("lt50"), col("le50"), col("lt99"), col("le99"),
        rankOk("lt50", "le50", expr("(n + 1) DIV 2")).as("p50_rank_ok"),
        rankOk("lt99", "le99", expr("(99 * n + 99) DIV 100")).as("p99_rank_ok"))
  }

  val q69QuantileSketch: Q = Q.sql(
    "q69_quantile_sketch",
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  round(quantile_cont(value, 0.5), 6) AS exact_p50,
      |  round(quantile_cont(value, 0.99), 6) AS exact_p99,
      |  TRUE AS p50_rank_ok, TRUE AS p99_rank_ok
      |FROM events GROUP BY event_type
      |ORDER BY event_type""".stripMargin
  ) { (s, dir) =>
    quantileSketchOf(Tables.events(s, dir))
      .select(col("event_type"), col("n"), col("exact_p50"), col("exact_p99"),
        col("p50_rank_ok"), col("p99_rank_ok"))
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
