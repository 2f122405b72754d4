package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{Q, Tables}

/** Remaining §2 row-op inventory: na.drop (§2.2 row 10,
  * category_model.ipynb:43 / model.py:242), row-wise horizontal sum
  * (§2.4 row 25, category_model.ipynb:152,159 — both the plain
  * expression sum and the higher-order aggregate-over-array form), and
  * the wide grouped mean (§2.4 rows 22/27, category_model.ipynb:66).
  * Row-local expressions + partial hash aggregates — scan-speed then
  * one per-group-sized shuffle at any scale.
  */
object RelationalExt {

  /** na.drop: nulls are introduced deterministically (nullif on zero
    * discount/tax) and then dropped with how="any" — equivalent to the
    * oracle's IS-NOT-NULL conjunction. */
  val q48NaDrop: Q = Q.sql(
    "q48_na_drop",
    """SELECT l_orderkey, l_linenumber, d, t FROM (
      |  SELECT l_orderkey, l_linenumber,
      |    nullif(l_discount, 0) AS d, nullif(l_tax, 0) AS t
      |  FROM lineitem)
      |WHERE d IS NOT NULL AND t IS NOT NULL
      |ORDER BY l_orderkey, l_linenumber""".stripMargin
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        nullif(col("l_discount"), lit(0)).as("d"),
        nullif(col("l_tax"), lit(0)).as("t"))
      .na.drop("any", Seq("d", "t"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** Row-wise horizontal sum across columns — the plain expression form
    * (qty+disc+tax) AND the higher-order aggregate(array(...)) form the
    * reference's per-row category scoring maps to. Left-fold double
    * addition evaluates identically in DuckDB's list_reduce. */
  val q49HorizontalSum: Q = Q.sql(
    "q49_horizontal_sum",
    """SELECT l_orderkey, l_linenumber,
      |  l_quantity + l_discount + l_tax AS expr_sum,
      |  list_reduce([l_quantity, l_discount, l_tax], (a, x) -> a + x) AS hof_sum
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber""".stripMargin
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_quantity") + col("l_discount") + col("l_tax")).as("expr_sum"),
        aggregate(
          array(col("l_quantity"), col("l_discount"), col("l_tax")),
          lit(0.0), (a, x) => a + x).as("hof_sum"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** Wide grouped mean: one groupBy, many avg columns (the reference's
    * ~380-column per-cluster mean). Means go through exact DECIMAL sums
    * divided by counts so the result is partitioning-independent in both
    * engines (SURVEY §7.4 risk 1 — a naive avg(double) depends on
    * accumulation order). */
  val q50WideMean: Q = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    Q.sql(
      "q50_wide_mean",
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |  ${cols.map(c => s"CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS mean_$c").mkString(", ")}
         |FROM lineitem
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin
    ) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n"),
          cols.map(c =>
            (sum(col(c).cast(DecimalType(18, 2))).cast("double") / count(lit(1)))
              .as(s"mean_$c")): _*)
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }
  }

  /** Ordered LISTAGG / string_agg — the SQL string-aggregation surface:
    * per nation, its customers' DISTINCT market segments as one sorted
    * comma-joined string. Spark's collect_set is partition-order-
    * nondeterministic, so the deterministic form is collect_set →
    * array_sort → array_join — semantically STRING_AGG(DISTINCT …
    * ORDER BY …).
    *
    * Scale: safe ONLY because the aggregated domain is bounded
    * (|segments| = 5) — the per-group state is a tiny set regardless of
    * row count, and map-side partial collect_sets cap shuffle volume at
    * |groups|×|domain|. Aggregating an UNBOUNDED value domain into
    * strings (e.g. all customer names) is the anti-pattern: per-group
    * state grows with data; cap the domain or use top-k ([[graft.ops
    * .HeavyHitters]]) instead. */
  val q118Listagg: Q = Q.sql(
    "q118_listagg",
    """SELECT c_nationkey,
      |  string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
      |  COUNT(DISTINCT c_mktsegment) AS n_segments
      |FROM customer
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin
  ) { (s, dir) =>
    Tables.customer(s, dir)
      .groupBy(col("c_nationkey"))
      .agg(
        array_join(array_sort(collect_set(col("c_mktsegment"))), ",").as("segments"),
        countDistinct(col("c_mktsegment")).as("n_segments"))
      .orderBy(col("c_nationkey"))
  }

  /** SQL NULL-semantics battery, cross-engine: nulls grouped as one
    * group, COUNT(*) vs COUNT(col), null-skipping SUM, and the
    * null-safe equality join (Spark `<=>` ↔ ANSI IS NOT DISTINCT FROM)
    * proved by a self-join in which the NULL group must match itself.
    * Any divergence in null handling between the engine and the oracle
    * — dropped null groups, nulls counted, a null-safe join that
    * doesn't match NULL — breaks the hash. Aggregation shrinks the
    * input to |status| rows before the join, so the null-safe join is
    * over a constant-size frame. */
  val q127NullSemantics: Q = Q.sql(
    "q127_null_semantics",
    """WITH o AS (
      |  SELECT NULLIF(o_orderstatus, 'O') AS st,
      |    CASE WHEN o_orderkey % 7 = 0 THEN NULL
      |         ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS price_n
      |  FROM orders),
      |agg AS (
      |  SELECT st, COUNT(*) AS n_rows, COUNT(price_n) AS n_price,
      |    CAST(SUM(price_n) AS DOUBLE) AS sum_price
      |  FROM o GROUP BY st)
      |SELECT a.st, a.n_rows, a.n_price, a.sum_price,
      |  b.n_rows IS NOT NULL AS self_match
      |FROM agg a LEFT JOIN agg b ON a.st IS NOT DISTINCT FROM b.st
      |ORDER BY a.st NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    val o = Tables.orders(s, dir)
      .select(
        nullif(col("o_orderstatus"), lit("O")).as("st"),
        when(col("o_orderkey") % 7 === 0, lit(null))
          .otherwise(col("o_totalprice").cast(DecimalType(18, 2))).as("price_n"))
    val agg = o.groupBy(col("st"))
      .agg(count(lit(1)).as("n_rows"), count(col("price_n")).as("n_price"),
        sum(col("price_n")).cast("double").as("sum_price"))
    val b = agg.select(col("st").as("st_b"), col("n_rows").as("n_rows_b"))
    agg.join(b, col("st") <=> col("st_b"), "left")
      .select(col("st"), col("n_rows"), col("n_price"), col("sum_price"),
        col("n_rows_b").isNotNull.as("self_match"))
      .orderBy(col("st").asc_nulls_first)
  }

  val all: Seq[Q] = Seq(q48NaDrop, q49HorizontalSum, q50WideMean, q118Listagg,
    q127NullSemantics)
}
