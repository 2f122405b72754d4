package graft.allergen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** W1 label derivation (SURVEY.md §2.2/§2.7): the reference's signature
  * idiom — lowercase token arrays intersected with per-category keyword
  * lists, first match wins (MLP.ipynb:44-49 binary; :504-509 chained
  * multiclass `when`; :780-790 multilabel one-hots). Keyword sets are
  * drawn from the synthetic documents vocabulary so the derived labels
  * are non-degenerate on the driver's testdata.
  *
  * Everything here is pure column expressions — row-local, codegen-able,
  * no UDF (the reference's cell-6 Python UDF rewritten natively per
  * SURVEY §2.8) — so label derivation runs at scan speed at any scale.
  */
object Labels {

  /** Category → keyword list, in first-match priority order
    * (reference shape: allergen_categories dict, MLP.ipynb:607-615). */
  val Categories: Seq[(String, Seq[String])] = Seq(
    "joins"  -> Seq("hash", "join", "merge"),
    "scan"   -> Seq("scan", "filter", "table"),
    "window" -> Seq("window", "stream", "group"),
    "sort"   -> Seq("sort", "order", "key"))

  /** Binary-label keywords (reference: `allergens` list, MLP.ipynb:47). */
  val BinaryKeywords: Seq[String] = Categories.head._2

  /** Lowercased whitespace tokens of a text column
    * (reference: transform(ingredients, x -> lower(x)), MLP.ipynb:44). */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** 0/1 label: any keyword present
    * (when(size(array_intersect(..))>0,1), MLP.ipynb:47-49). */
  def binaryLabel(toks: Column): Column =
    when(size(array_intersect(toks, lit(BinaryKeywords.toArray))) > 0, 1).otherwise(0)

  /** First-match category name, 'none' if nothing matches
    * (chained when, MLP.ipynb:504-509). */
  def multiclassLabel(toks: Column): Column =
    Categories.foldRight(lit("none"): Column) { case ((cat, kws), els) =>
      when(size(array_intersect(toks, lit(kws.toArray))) > 0, lit(cat)).otherwise(els)
    }

  /** One 0/1 column per category (multilabel one-hots,
    * MLP.ipynb:780-790). */
  def multilabelCols(toks: Column): Seq[(String, Column)] =
    Categories.map { case (cat, kws) =>
      s"is_$cat" ->
        when(size(array_intersect(toks, lit(kws.toArray))) > 0, 1).otherwise(0)
    }

  /** documents with tokens + all derived labels. */
  def labeled(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir)
      .withColumn("tokens", tokens(col("text")))
    multilabelCols(col("tokens")).foldLeft(
      base
        .withColumn("label", binaryLabel(col("tokens")))
        .withColumn("category", multiclassLabel(col("tokens")))
    ) { case (df, (name, c)) => df.withColumn(name, c) }
  }

  private def kwSql(kws: Seq[String]): String =
    kws.map(k => s"'$k'").mkString("[", ", ", "]")

  /** Multiclass first-match label distribution — the W1 class-balance
    * check (counts.show(), MLP.ipynb:53-54) over the chained-when label. */
  val q35LabelMulticlass: Q = {
    val caseSql = Categories.map { case (cat, kws) =>
      s"WHEN len(list_intersect(toks, ${kwSql(kws)})) > 0 THEN '$cat'"
    }.mkString("CASE ", " ", " ELSE 'none' END")
    Q.sql(
      "q35_label_multiclass",
      s"""SELECT category, COUNT(*) AS n FROM (
         |  SELECT $caseSql AS category
         |  FROM (SELECT string_split(lower(text), ' ') AS toks FROM documents))
         |GROUP BY category
         |ORDER BY category""".stripMargin
    ) { (s, dir) =>
      labeled(s, dir)
        .groupBy(col("category")).agg(count(lit(1)).as("n"))
        .orderBy(col("category"))
    }
  }

  /** Multilabel one-hot prevalence: per-category positive counts — a
    * horizontal aggregate over the derived is_* columns (the reference
    * prints this per category before each CV fit, MLP.ipynb:833-846). */
  val q36LabelMultilabel: Q = {
    val sums = Categories.map { case (cat, kws) =>
      s"CAST(SUM(CASE WHEN len(list_intersect(toks, ${kwSql(kws)})) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_$cat"
    }.mkString(", ")
    Q.sql(
      "q36_label_multilabel",
      s"""SELECT COUNT(*) AS n_docs, $sums
         |FROM (SELECT string_split(lower(text), ' ') AS toks FROM documents)""".stripMargin
    ) { (s, dir) =>
      labeled(s, dir)
        .agg(
          count(lit(1)).as("n_docs"),
          Categories.map { case (cat, _) =>
            sum(col(s"is_$cat")).as(s"n_$cat")
          }: _*)
    }
  }

  val all: Seq[Q] = Seq(q35LabelMulticlass, q36LabelMultilabel)
}
