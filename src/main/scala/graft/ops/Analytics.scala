package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** OLAP analytics beyond plain GROUP BY — the multi-granularity and
  * ranked-window families (extends the reference's groupBy.count /
  * crosstab idioms, MLP.ipynb:53-54,94-95, to the full SQL analytics
  * surface a warehouse user expects).
  *
  * Scale: a GROUPING SETS aggregation is ONE pass — Spark expands each
  * input row to its grouping-set instances before the partial aggregate,
  * so the shuffle carries (sets × groups) pre-aggregated rows, never raw
  * data per set; the union-of-N-group-bys alternative scans N times.
  * Window analytics shuffle once on the partition key and evaluate all
  * ranked/offset functions in a single sort within each partition.
  */
object Analytics {

  import Relational.{dec, msum}

  /** Multi-granularity aggregation via native GROUPING SETS — a set list
    * that is neither a ROLLUP nor a CUBE prefix ((status), (priority)),
    * with grouping_id() disambiguating NULL-as-data from NULL-as-total
    * (both engines put the FIRST listed column in the most significant
    * bit — probed, not assumed). */
  val q86GroupingSets: Q = Q.sql(
    "q86_grouping_sets",
    """SELECT o_orderstatus, o_orderpriority,
      |  GROUPING(o_orderstatus, o_orderpriority) AS gid,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
      |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n"),
        msum(col("o_totalprice")).as("sum_price"))
      .select(col("o_orderstatus"), col("o_orderpriority"), col("gid"),
        col("n"), col("sum_price"))
      .orderBy(col("gid"),
        col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
  }

  /** The ranked/offset window family in one pass: lag/lead, ntile,
    * percent_rank, cume_dist, and an unbounded first_value — one shuffle
    * on o_custkey, one sort per partition, every function evaluated in
    * that sort. Ratios (percent_rank, cume_dist) divide identical
    * integers in both engines → bit-exact doubles; spend_delta subtracts
    * two STORED doubles (no reassociation), equally exact. */
  val q87WindowAnalytics: Q = Q.sql(
    "q87_window_analytics",
    """SELECT o_custkey, o_orderkey,
      |  lag(o_totalprice) OVER w AS prev_price,
      |  lead(o_totalprice) OVER w AS next_price,
      |  o_totalprice - lag(o_totalprice) OVER w AS spend_delta,
      |  ntile(4) OVER w AS quartile,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd,
      |  first_value(o_orderkey) OVER w AS first_order
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin
  ) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    Tables.orders(s, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        (col("o_totalprice") - lag(col("o_totalprice"), 1).over(w)).as("spend_delta"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        first_value(col("o_orderkey")).over(w).as("first_order"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val all: Seq[Q] = Seq(q86GroupingSets, q87WindowAnalytics)
}
