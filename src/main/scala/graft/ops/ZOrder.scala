package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Z-order (Morton) multi-dimensional layout — the write-path technique
  * that makes parquet min/max zone maps prune on TWO filter dimensions
  * at once. A single-column sort clusters only its own column; sorting
  * by the bit-interleaved z-value clusters BOTH coordinates, so a scan
  * filtered on either dimension touches O(√files) instead of all of
  * them. (The layout sibling of ScaleSpec's range-partitioned sorted
  * write; same idea Delta/Iceberg expose as OPTIMIZE ZORDER BY.)
  *
  * The z-value is plain 64-bit shift/mask arithmetic — identical in
  * Spark and DuckDB, so the computation itself is oracle-checkable
  * (q91); the pruning effect is asserted by ScaleSpec on real files.
  */
object ZOrder {

  /** Interleave a 16-bit value's bits with zeros (Morton spread) via the
    * classic shift-or-mask ladder — pure integer ops, codegen-friendly,
    * no UDF. */
  private def spread(c: Column): Column = {
    val a = c.bitwiseOR(shiftleft(c, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of (x, y): bits of x on even positions, y on
    * odd. Coordinates are taken mod 2^16 — callers bucket wider domains
    * into 16-bit coordinates first (layout needs locality, not
    * injectivity). */
  def zvalue(x: Column, y: Column): Column =
    spread(x.cast("long").bitwiseAND(lit(65535L)))
      .bitwiseOR(shiftleft(spread(y.cast("long").bitwiseAND(lit(65535L))), 1))

  /** The z-ordered write layout: range-partition by z-value, sort within
    * partitions — file-range clustering on both dims, NO global sort
    * barrier. Write the result with .write.parquet(...). */
  def zorderBy(df: DataFrame, x: Column, y: Column, partitions: Int): DataFrame = {
    val withZ = df.withColumn("zval", zvalue(x, y))
    withZ.repartitionByRange(partitions, col("zval"))
      .sortWithinPartitions(col("zval"))
  }

  /** Shared spread ladder in DuckDB SQL (step CTEs; `e` must be a
    * 16-bit-masked expression alias). */
  private def oracleZ: String =
    """z AS (
      |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
      |    (x4 | (y4 << 1)) AS zval
      |  FROM (
      |    SELECT *, ((x3 | (x3 << 1)) & 1431655765) AS x4,
      |              ((y3 | (y3 << 1)) & 1431655765) AS y4
      |    FROM (
      |      SELECT *, ((x2 | (x2 << 2)) & 858993459) AS x3,
      |                ((y2 | (y2 << 2)) & 858993459) AS y3
      |      FROM (
      |        SELECT *, ((x1 | (x1 << 4)) & 252645135) AS x2,
      |                  ((y1 | (y1 << 4)) & 252645135) AS y2
      |        FROM (
      |          SELECT *, ((x0 | (x0 << 8)) & 16711935) AS x1,
      |                    ((y0 | (y0 << 8)) & 16711935) AS y1
      |          FROM (
      |            SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
      |              l_partkey & 65535 AS x0, l_suppkey & 65535 AS y0
      |            FROM lineitem))))))""".stripMargin

  /** Morton codes over (l_partkey, l_suppkey): the 100 lowest z-values —
    * the exact interleave arithmetic the layout sorts by, replayed bit
    * for bit by the oracle. Plans as TakeOrderedAndProject (no global
    * sort materialization). */
  val q91ZOrder: Q = Q.sql(
    "q91_zorder",
    s"""WITH $oracleZ
       |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, zval
       |FROM z
       |ORDER BY zval, l_orderkey, l_linenumber
       |LIMIT 100""".stripMargin
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        zvalue(col("l_partkey"), col("l_suppkey")).as("zval"))
      .orderBy(col("zval"), col("l_orderkey"), col("l_linenumber"))
      .limit(100)
  }

  val all: Seq[Q] = Seq(q91ZOrder)
}
