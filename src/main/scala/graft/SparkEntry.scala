package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the training-data
  * pipeline extensions) is a named entry in [[queries]]; SQL-expressible
  * ones carry a DuckDB oracle in [[oracleSql]] that the driver
  * hash-compares on sf0.01.
  */
object SparkEntry {

  /** All registered queries, in registration order. */
  def registry: Seq[Q] =
    ops.Relational.all ++ ops.Dedup.all ++ ops.Similarity.all ++
      ops.TextAnalysis.all ++ allergen.Labels.all ++ allergen.Train.all ++
      ops.Sampling.all ++ ops.Text.all ++ ops.RelationalExt.all ++
      restaurants.Recommend.all ++ ops.Sources.all ++ ops.Multimodal.all ++
      streaming.Streaming.all ++ ops.Skew.all ++ recipes.Prep.all ++
      ops.AsOf.all ++ ops.Quantiles.all ++ ops.Components.all ++ ops.Packing.all ++
      ops.Curate.all ++ ops.Analytics.all ++ ops.Linkage.all ++ ops.Profile.all ++
      ops.HeavyHitters.all ++ ops.ZOrder.all ++ ops.Quality.all ++
      ops.Decontam.all ++ ops.Quantize.all ++ ops.Merge.all ++ ops.Encoding.all ++
      ops.Eval.all ++ ops.Bpe.all ++ ops.Chat.all ++ ops.Retrieval.all ++
      ops.Mixture.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The reference's signature computation (MLP.ipynb:44-49): lowercase an
    * array column, intersect with a keyword list, derive a binary label,
    * count per class — here over the documents table.
    */
  def entry(spark: SparkSession): DataFrame =
    entry(spark, "/root/testdata/sf0.001") // driver contract: sf0.001 default

  /** sfDir-parameterized flagship, sharing the same loader path as every
    * [[queries]] entry (the 1-arg overload above keeps the driver's exact
    * signature). */
  def entry(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("tokens", split(lower(col("text")), " "))
      .withColumn("label",
        when(size(array_intersect(col("tokens"), lit(Array("hash", "join", "merge")))) > 0, 1)
          .otherwise(0))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("label"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
