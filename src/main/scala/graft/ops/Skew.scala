package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{Q, Tables}

/** Skew-mitigation operators (builder prompt: "salting for skew, AQE for
  * runtime re-plan"). Both rewrites are RESULT-PRESERVING, so the DuckDB
  * oracle runs the plain un-salted SQL — the gate proves the salted
  * plans compute exactly the same answer.
  *
  * AQE's skew-join splitting handles most skew automatically; explicit
  * salting remains the tool when a single key's group STATE (not just
  * its row count) exceeds one task — e.g. a groupBy whose per-key
  * aggregation buffer is huge, or a join key so hot AQE's split floor
  * still overloads a task. These operators document the pattern with
  * deterministic salts (pmod of the row hash, not rand()) so plans are
  * stable run to run.
  */
object Skew {

  private val NSalts = 8

  /** Salted aggregation: revenue per customer with the hot-key-safe
    * two-phase shape (groupBy(key, salt) partial → groupBy(key) final —
    * a hot key's rows split across NSalts reducers in phase 1, phase 2
    * combines NSalts small partials per key); oracle is the plain
    * GROUP BY. */
  val q61SaltedAgg: Q = Q.sql(
    "q61_salted_agg",
    """SELECT o_custkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
      |FROM orders
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin
  ) { (s, dir) =>
    val o = Tables.orders(s, dir)
      .withColumn("_salt", pmod(hash(col("o_orderkey")), lit(NSalts)))
    o.groupBy(col("o_custkey"), col("_salt"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("partial"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("partial")).cast("double").as("total_spend"))
      .orderBy(col("o_custkey"))
  }

  /** Salted join: the big (skew-prone) side gets a deterministic salt;
    * the small side is exploded ×NSalts so every (key, salt) pair still
    * matches — a hot key's rows now spread over NSalts join tasks.
    * Identical result to the plain join (the oracle). The ×NSalts
    * duplication of the small side is the price of the technique —
    * that is why it applies only when the small side is genuinely
    * small. */
  val q62SaltedJoin: Q = Q.sql(
    "q62_salted_join",
    """SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      |FROM customer JOIN orders ON o_custkey = c_custkey
      |GROUP BY c_custkey, c_name
      |ORDER BY c_custkey""".stripMargin
  ) { (s, dir) =>
    val big = Tables.orders(s, dir)
      .withColumn("_salt", pmod(hash(col("o_orderkey")), lit(NSalts)))
    val small = Tables.customer(s, dir)
      .withColumn("_salt", explode(sequence(lit(0), lit(NSalts - 1))))
    big.join(small,
        big("o_custkey") === small("c_custkey") && big("_salt") === small("_salt"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("spend"))
      .orderBy(col("c_custkey"))
  }

  /** HLL sketch distinct-count beside the exact count: the sketch is
    * Spark-internal (HLL++ — not bit-reproducible in DuckDB, hence
    * non-oracle); ScaleSpec bounds its relative error against the exact
    * count. At 100 TB the sketch is the only affordable per-key
    * distinct over high-cardinality columns — fixed-size state instead
    * of a per-key hash set. */
  val q63ApproxDistinct: Q = Q.noOracle("q63_approx_distinct") { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
      .orderBy(col("l_returnflag"))
  }

  val all: Seq[Q] = Seq(q61SaltedAgg, q62SaltedJoin, q63ApproxDistinct)
}
