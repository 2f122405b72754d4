package graft.recipes

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** W2 recipe-generation data pipeline to the fit boundary
  * (model.py:39-122, SURVEY §3 E2): the reference's eager pandas chain —
  * read → parse stringified lists → clean → prompt/target format →
  * train/val/test split → tokenize — as ONE lazy Spark plan. Everything
  * through formatting is deterministic column algebra (oracle-paired,
  * q64); the split + token-length accounting entry (q65) mirrors the
  * reference's max_length 128/256 truncation bookkeeping
  * (model.py:103-117) with a deterministic hash-bucket split in place
  * of the seeded sampler. The fit itself is out of Spark scope (§2.10);
  * the engine's neural stand-in is allergen.Train's MLP.
  *
  * "Recipes" are synthesized deterministically from `documents`: first
  * 3 tokens = title, tokens 4-10 = ingredients, the rest = directions —
  * the same structural shape as RecipeNLG rows (title/ingredients/
  * directions lists) without inventing data.
  */
object Prep {

  /** documents → (doc_id, title, ingredients: array, directions: array).
    * No array_distinct anywhere: first-occurrence dedup order is not
    * portable across engines (DuckDB list_distinct is unordered), and
    * the reference keeps list order too. */
  def recipes(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 4)
      .select(
        col("doc_id"),
        concat_ws(" ", slice(col("w"), 1, 3)).as("title"),
        slice(col("w"), 4, 7).as("ingredients"),
        slice(col("w"), lit(11), greatest(size(col("w")) - 10, lit(0))).as("directions"))

  /** Prompt + structured target (model.py:74-78): bulleted ingredients,
    * numbered directions (indexed transform lambda — 0-based in Spark,
    * 1-based in DuckDB, aligned via i+1). */
  def formatted(s: SparkSession, dir: String): DataFrame =
    recipes(s, dir).select(
      col("doc_id"),
      format_string("Generate a structured recipe for: %s", col("title")).as("prompt"),
      concat(
        lit("Title: "), col("title"),
        lit("\nIngredients:\n"),
        array_join(transform(col("ingredients"), x => concat(lit("- "), x)), "\n"),
        lit("\nDirections:\n"),
        array_join(transform(col("directions"),
          (x, i) => concat((i + 1).cast("string"), lit(". "), x)), "\n")).as("target"))

  /** DuckDB replay of [[formatted]] (no ORDER BY — shared by q64/q65). */
  private val formattedSql =
    """SELECT doc_id,
      |  printf('Generate a structured recipe for: %s', title) AS prompt,
      |  'Title: ' || title || chr(10) || 'Ingredients:' || chr(10) ||
      |    array_to_string(list_transform(ingredients, x -> '- ' || x), chr(10)) ||
      |    chr(10) || 'Directions:' || chr(10) ||
      |    coalesce(array_to_string(
      |      list_transform(directions, (x, i) -> i || '. ' || x), chr(10)), '')
      |    AS target
      |FROM (
      |  SELECT doc_id,
      |    array_to_string(w[1:3], ' ') AS title,
      |    w[4:10] AS ingredients,
      |    CASE WHEN len(w) >= 11 THEN w[11:len(w)] ELSE CAST([] AS VARCHAR[]) END AS directions
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      |  WHERE len(w) >= 4)""".stripMargin

  /** The oracle-paired formatting stage. */
  val q64RecipeFormat: Q = Q.sql(
    "q64_recipe_format",
    formattedSql + "\nORDER BY doc_id"
  ) { (s, dir) => formatted(s, dir).orderBy(col("doc_id")) }

  /** Split + tokenize accounting (model.py:90-122): the reference's
    * two-stage seeded split (0.9/0.1 then 0.85/0.15 of the rest →
    * 76.5/13.5/10), BPE-ish regex token counts, truncation at the
    * reference's max_length 128 (prompt) / 256 (target).
    *
    * Split mechanism: a DETERMINISTIC hash-bucket tag —
    * `graft_md5long64(doc_id) % 1000` banded at 765/900 — computed in
    * the same pass as the token counts. One scan of documents total;
    * the previous union-of-`randomSplit` form evaluated the formatted()
    * subtree once per split branch (3 full scans at 100 TB) and was
    * seed-bound to Spark's sampler, so it could carry no oracle. The
    * md5-derived tag is cross-engine reproducible → oracle-paired, and
    * at scale it is also what a real corpus pipeline wants: membership
    * is a pure function of doc_id, stable across reruns, cluster
    * topologies, and engines. */
  val q65RecipeSplits: Q = Q.sql(
    "q65_recipe_splits",
    s"""SELECT split, COUNT(*) AS n,
       |  MAX(pt) AS max_prompt_tokens, MAX(tt) AS max_target_tokens,
       |  MAX(LEAST(pt, 128)) AS max_prompt_trunc128,
       |  MAX(LEAST(tt, 256)) AS max_target_trunc256
       |FROM (
       |  SELECT
       |    CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 < 765
       |           THEN '1_train'
       |         WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 < 900
       |           THEN '2_val'
       |         ELSE '3_test' END AS split,
       |    len(regexp_extract_all(prompt, '[a-z0-9]+')) AS pt,
       |    len(regexp_extract_all(target, '[a-z0-9]+')) AS tt
       |  FROM ($formattedSql))
       |GROUP BY split
       |ORDER BY split""".stripMargin
  ) { (s, dir) =>
    def toks(c: org.apache.spark.sql.Column) =
      size(regexp_extract_all(c, lit("[a-z0-9]+"), lit(0)))
    val bucket = call_function("graft_md5long64", col("doc_id").cast("string")) % 1000
    formatted(s, dir)
      .select(
        when(bucket < 765, "1_train")
          .when(bucket < 900, "2_val")
          .otherwise("3_test").as("split"),
        toks(col("prompt")).as("pt"),
        toks(col("target")).as("tt"))
      .groupBy(col("split"))
      .agg(
        count(lit(1)).as("n"),
        max(col("pt")).as("max_prompt_tokens"),
        max(col("tt")).as("max_target_tokens"),
        max(least(col("pt"), lit(128))).as("max_prompt_trunc128"),
        max(least(col("tt"), lit(256))).as("max_target_trunc256"))
      .orderBy(col("split"))
  }

  val all: Seq[Q] = Seq(q64RecipeFormat, q65RecipeSplits)
}
