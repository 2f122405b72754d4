package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Fuzzy record linkage — entity resolution over STRUCTURED records, the
  * fourth near-dup family beside n-gram Jaccard (q25), MinHash-LSH (q26)
  * and SimHash (q70): match records whose join key is dirty (typos,
  * variant spellings) via blocking + bounded edit distance. No analog in
  * the reference (whose joins are all exact); standard warehouse/MDM
  * operator.
  *
  * Scale design: edit distance admits no equi-join key, so the classic
  * trap is a per-block O(rows²) compare — blocks grow linearly with the
  * corpus, so record-level comparing is quadratic at 100 TB. This
  * implementation compares DISTINCT (block, value) pairs instead:
  * value-level candidates are quadratic only in the distinct dirty-value
  * vocabulary per block (bounded by the value domain, not the corpus),
  * and the small matched-value-pair set then broadcasts back onto the
  * records with two exact equi-joins. Records never self-join.
  */
object Linkage {

  /** Generic blocked fuzzy-match: record pairs from `records` whose
    * `value` columns are within `maxDist` edit distance (≥1 — exact
    * duplicates are exact dedup's job, q24) inside the same `block`.
    * Output: (i, j, block, va, vb, d) with (i, j) the `id` values of the
    * matched records, va < vb lexically. */
  def fuzzyPairs(records: DataFrame, id: Column, block: Column, value: Column,
      maxDist: Int): DataFrame = {
    val recs = records.select(id.as("rid"), block.as("blk"), value.as("v"))
    val names = recs.select(col("blk"), col("v")).distinct()
    // value-level candidates: block equi-join + lexical dedup + edit
    // distance as the post-join filter (Spark plans the block key as the
    // hash-join key; levenshtein runs only within blocks)
    val np = names.as("a")
      .join(names.as("b"),
        col("a.blk") === col("b.blk") && col("a.v") < col("b.v") &&
          levenshtein(col("a.v"), col("b.v")) <= maxDist)
      .select(col("a.blk").as("blk"), col("a.v").as("va"), col("b.v").as("vb"),
        levenshtein(col("a.v"), col("b.v")).as("d"))
    // fan matched value pairs back out to records: np is vocabulary-sized
    // → BROADCAST it; the first record pass streams map-side, the second
    // is one equi-shuffle on (block, value)
    recs.select(col("blk").as("ba"), col("v").as("na"), col("rid").as("i"))
      .join(broadcast(np), col("ba") === col("blk") && col("na") === col("va"))
      .join(recs.select(col("blk").as("bb"), col("v").as("nb"), col("rid").as("j")),
        col("blk") === col("bb") && col("vb") === col("nb"))
      .select(col("i"), col("j"), col("blk"), col("va"), col("vb"), col("d"))
  }

  /** Blocked fuzzy part-name linkage: parts in the same brand whose names
    * are within edit distance 2 (typo/variant matches; d ≥ 1 by the
    * lexical dedup — exact-equal names are exact dedup's territory). */
  val q88FuzzyLinkage: Q = Q.sql(
    "q88_fuzzy_linkage",
    """WITH names AS (SELECT DISTINCT p_brand, p_name FROM part),
      |np AS (
      |  SELECT a.p_brand AS blk, a.p_name AS va, b.p_name AS vb,
      |    levenshtein(a.p_name, b.p_name) AS d
      |  FROM names a JOIN names b
      |    ON a.p_brand = b.p_brand AND a.p_name < b.p_name
      |  WHERE levenshtein(a.p_name, b.p_name) <= 2)
      |SELECT pa.p_partkey AS i, pb.p_partkey AS j, np.blk, np.va, np.vb, np.d
      |FROM np
      |JOIN part pa ON pa.p_brand = np.blk AND pa.p_name = np.va
      |JOIN part pb ON pb.p_brand = np.blk AND pb.p_name = np.vb
      |ORDER BY i, j""".stripMargin
  ) { (s, dir) =>
    fuzzyPairs(Tables.part(s, dir),
      col("p_partkey"), col("p_brand"), col("p_name"), maxDist = 2)
      .orderBy(col("i"), col("j"))
  }

  val all: Seq[Q] = Seq(q88FuzzyLinkage)
}
