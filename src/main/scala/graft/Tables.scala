package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata star schema (TESTDATA.md).
  *
  * Every query takes the scale-factor directory as a runtime parameter so
  * the same plan runs at sf0.001 (smoke), sf0.01 (oracle) and sf0.1
  * (bench) — and, unchanged, against a 100 TB warehouse layout where each
  * logical table is a multi-file parquet dataset: `spark.read.parquet` on
  * a directory scales out to any number of files/partitions, and all
  * downstream plans here rely only on Catalyst-visible schemas so column
  * pruning + predicate pushdown reach the scan.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  /** The events table: `ts` normalizes to a session-TZ TIMESTAMP (UTC —
    * [[Sessions.local]] pins the session TZ) whatever physical type the
    * generator wrote. Two generations exist in the wild:
    *  - parquet TIMESTAMP(NANOS), which Spark 4 rejects by default and
    *    `spark.sql.legacy.parquet.nanosAsLong=true` ([[Sessions.local]])
    *    surfaces as a long — rebuilt into a micros TIMESTAMP via integer
    *    division (`DIV` keeps full int64 precision where `/` (double)
    *    would lose sub-millisecond bits at 2024 epochs);
    *  - native parquet micros with isAdjustedToUTC=false, which Spark
    *    reads as TIMESTAMP_NTZ — cast to TIMESTAMP (identical wall-clock
    *    under the pinned UTC session TZ, and keeps every downstream
    *    plan + written schema byte-identical across generations).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}

/** One named engine query: the Spark plan plus (when SQL-expressible) the
  * DuckDB oracle the driver hash-compares against on sf0.01.
  *
  * Determinism contract (SURVEY.md §7.4): every query orders its output on
  * a unique key, and any aggregate over non-integral doubles goes through
  * an exact DECIMAL(18,2) sum so the result is independent of partitioning
  * / evaluation order in BOTH engines — a result that only matches on 32
  * local threads but drifts on a 1000-executor shuffle is a bug.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    inBench: Boolean = true)

object Q {
  def sql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
  /** Non-oracle AND excluded from the per-round bench: ML training
    * entries whose iterative fit cost would swamp the query timings the
    * bench tracks (they are exercised by Verify at sf0.01 and by the
    * ScalaTest suite instead). */
  def heavy(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None, inBench = false)
  /** Bench-excluded (iterative ML fit in the plan) but still
    * oracle-paired: the non-ML tail of the query is SQL-expressible. */
  def heavySql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle), inBench = false)
}
