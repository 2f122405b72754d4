package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-layout scale techniques the query inventory can't carry
  * (they live on the write path): bucketed co-located joins and
  * partition-pruned scans — asserted at the plan level, the same way a
  * 100 TB deployment would validate its table layout. Plus the sketch
  * error bound for q63. */
class ScaleSpec extends AnyFunSuite {
  import TestSpark._

  private def formatted(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("bucketed tables join with ZERO exchange (co-located shuffle-free join)") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // the in-memory catalog forgets tables across JVMs but their
    // managed locations persist on disk — remove them or CTAS refuses
    Seq("b_orders", "b_lineitem").foreach { t =>
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete()); dir.delete()
      }
    }
    Tables.orders(spark, Sf0001).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.lineitem(spark, Sf0001).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    val joined = spark.table("b_orders")
      .join(spark.table("b_lineitem"), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
    val plan = formatted(joined)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    // and it still computes the right thing
    val viaBuckets = joined.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = Tables.orders(spark, Sf0001)
      .join(Tables.lineitem(spark, Sf0001), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaBuckets == plain)
  }

  test("partitioned layout prunes non-matching partitions at the scan") {
    val path = "target/fixtures/events_by_type"
    Tables.events(spark, Sf0001).write
      .partitionBy("event_type").mode("overwrite").parquet(path)
    val pruned = spark.read.parquet(path)
      .filter(col("event_type") === "click")
      .agg(count(lit(1)))
    val plan = formatted(pruned)
    assert(plan.contains("PartitionFilters:"), plan)
    assert(plan.contains("event_type"), plan)
    // pruned read must equal the filtered full read
    val n = pruned.head.getLong(0)
    val expected = Tables.events(spark, Sf0001)
      .filter(col("event_type") === "click").count()
    assert(n == expected)
  }

  test("dynamic partition pruning: a filtered dim prunes the partitioned fact at RUNTIME") {
    // the 100 TB star-join staple: the fact is partitioned on the join
    // key, the dim filter is only known at runtime — DPP turns the full
    // fact scan into a subquery-driven partition scan. Static pruning
    // (test above) can't do this: the pruning values come from a JOIN,
    // not a literal.
    val path = "target/fixtures/orders_by_priority"
    Tables.orders(spark, Sf0001).write
      .partitionBy("o_orderpriority").mode("overwrite").parquet(path)
    val dim = Tables.orders(spark, Sf0001)
      .select(col("o_orderpriority").as("p")).distinct()
      .filter(col("p") <= "2") // runtime-filtered dim (priorities 1-2 of 5)
    val joined = spark.read.parquet(path)
      .join(dim, col("o_orderpriority") === col("p"))
      .agg(count(lit(1)))
    val plan = formatted(joined)
    assert(plan.contains("dynamicpruning"), plan)
    val expected = Tables.orders(spark, Sf0001)
      .filter(col("o_orderpriority") <= "2").count()
    assert(joined.head.getLong(0) == expected)
  }

  test("approx_count_distinct stays within its 2% rsd band (q63)") {
    // the internal frame keeps the raw estimate; registered q63
    // publishes (exact, approx_ok) — the envelope boolean the oracle
    // gates as literal TRUE
    val rows = ops.Skew.approxDistinctOf(Tables.lineitem(spark, Sf001))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (flag, exact, approx, ok) =>
      val err = math.abs(approx - exact).toDouble / exact
      assert(err < 0.1, s"$flag: exact=$exact approx=$approx err=$err")
      assert(ok, s"$flag: approx_ok boolean disagrees with the envelope")
    }
  }

  test("salted join/agg match their plain equivalents (beyond the oracle, at sf0.001)") {
    val saltedAgg = SparkEntry.queries("q61_salted_agg")(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val plainAgg = Tables.orders(spark, Sf0001)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        .cast("double").as("t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(saltedAgg == plainAgg)
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the adaptive plan)") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 50k rows of one hot key vs uniform keys: the hot post-shuffle
      // partition dwarfs the advisory size, so AQE must mark it skewed
      // and split it instead of letting one task carry the whole key.
      val left = spark.range(60000)
        .select(when($"id" < 50000, 7L).otherwise($"id").as("k"),
          concat(lit("padpadpadpadpadpadpadpad-"), $"id").as("payload"))
      val right = spark.range(2000).select(($"id" % 100).as("k"), $"id".as("v"))
      // inspect the SAME query execution that runs: a count() on the
      // join would plan its own (different) adaptive query
      val counted = left.join(right, "k").groupBy().count()
      counted.collect() // materialize so AQE finalizes the adaptive plan
      val finalPlan = counted.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected AQE skew-join split in final plan:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("z-ordered layout clusters BOTH dims; single-dim sort abandons the other dim") {
    import spark.implicits._
    // 256×256 grid, one row per cell — file-touch counts are then pure
    // geometry: 16 z-range files ≈ the 4×4 quadrant grid, so a 1/8-range
    // filter on EITHER coordinate lives in ~one quadrant row/column
    // (≈4 files), while an x-sorted layout spreads any y-filter over
    // every file.
    val grid = spark.range(65536).select(
      ($"id" % 256).as("x"), ($"id" / 256).cast("long").as("y"))
    val zPath = "target/fixtures/grid_zorder"
    val xPath = "target/fixtures/grid_xsort"
    ops.ZOrder.zorderBy(grid, $"x", $"y", partitions = 16)
      .write.mode("overwrite").parquet(zPath)
    grid.repartitionByRange(16, $"x").sortWithinPartitions($"x")
      .write.mode("overwrite").parquet(xPath)
    def touched(path: String, cond: org.apache.spark.sql.Column): Long =
      spark.read.parquet(path).filter(cond)
        .select(input_file_name()).distinct().count()
    def total(path: String): Long =
      spark.read.parquet(path).select(input_file_name()).distinct().count()
    assert(total(zPath) == 16 && total(xPath) == 16)
    // z-layout: both dims cluster (≤ half the files for a 1/8 range)
    assert(touched(zPath, $"x" < 32) <= 8, "z-order must cluster x")
    assert(touched(zPath, $"y" < 32) <= 8, "z-order must cluster y")
    // x-sorted layout: x clusters tightly, y touches (nearly) everything
    assert(touched(xPath, $"x" < 32) <= 4)
    assert(touched(xPath, $"y" < 32) >= 12,
      "an x-sorted layout cannot cluster y — if this fails the comparison is vacuous")
  }

  test("range-partitioned sorted layout: rangepartitioning exchange + partition-local sort, no global sort") {
    // the write-side layout for ordered parquet (min/max zone-map
    // friendly): repartitionByRange clusters key ranges per file,
    // sortWithinPartitions orders inside each — crucially WITHOUT a
    // global sort barrier
    val df = Tables.lineitem(spark, Sf0001)
      .repartitionByRange(8, col("l_shipdate"))
      .sortWithinPartitions(col("l_shipdate"), col("l_orderkey"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
    assert(plan.contains("Sort [l_shipdate"), plan)
    assert(plan.contains("false, 0") || !plan.contains("Sort [l_shipdate#_ global=true"),
      "sort must be partition-local (global=false)")
    val sortLine = plan.linesIterator.find(_.trim.startsWith("+- Sort")).getOrElse("")
    assert(!sortLine.contains("true"), s"global sort leaked into the layout plan: $sortLine")
  }

  test("runtime bloom filter from a selective dim filter prunes the fact scan side") {
    // Spark's runtime row-level filtering: a selective filter on the
    // creation (dim) side injects bloom_filter_might_contain onto the
    // application (fact) side BEFORE its shuffle — at 100 TB this is
    // the difference between shuffling the whole fact table and
    // shuffling the ~1% that can join. Local fixtures sit under the
    // 10 GB application-side default, so lower that threshold (a size
    // gate, not a semantics switch) and pin a shuffle join the way the
    // big-fact plan would be.
    val conf = spark.conf
    val savedApp = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val savedBc = conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val l = Tables.lineitem(spark, Sf001)
      val o = Tables.orders(spark, Sf001).filter(col("o_totalprice") > 400000)
      val j = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") && optimized.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected:\n$optimized")
      // the filter is a pruning hint, never a semantics change
      val n = j.collect().map(_.getLong(1)).sum
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        savedApp)
      conf.set("spark.sql.autoBroadcastJoinThreshold", savedBc)
      val plainN = Tables.lineitem(spark, Sf001)
        .join(Tables.orders(spark, Sf001).filter(col("o_totalprice") > 400000),
          col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(n == plainN)
    } finally {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        savedApp)
      conf.set("spark.sql.autoBroadcastJoinThreshold", savedBc)
    }
  }
}
