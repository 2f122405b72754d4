package graft.ops

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.{Q, Tables}

/** Non-parquet sources (SURVEY §2.1): multiline-JSON and CSV readers —
  * the only two formats the reference actually ingests (MLP.ipynb:34
  * `multiline=true` JSON; model.py:39 / category_model.ipynb:30 CSV with
  * quoted fields). The driver's testdata is parquet-only, so each query
  * materializes a fixture in the repo build dir (target/fixtures) from
  * the documents table, reads it back through the format under test with
  * an EXPLICIT schema, and aggregates; the DuckDB oracle computes the
  * same aggregate straight off the parquet — any reader defect
  * (quoting, escaping, header, multiline array parsing, type coercion)
  * breaks the hash match.
  *
  * Scale notes: the CSV fixture is written by a normal distributed
  * `df.write.csv` and read by Spark's splittable CSV scan. The JSON
  * fixture must be a single array-of-objects document (that is what
  * `multiline=true` means — MLP.ipynb's test.json shape), which is
  * inherently non-splittable: one file = one task, the documented cost
  * of that format at scale (prefer JSON Lines for bulk data). Fixture
  * generation collects one small table on the driver — test scaffolding
  * only, NOT an engine pattern.
  */
object Sources {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private[graft] def fixtureRoot(dir: String): String =
    s"/root/repo/target/fixtures/${Paths.get(dir).getFileName}"

  /** Shared oracle: per-language counts + exact char sum + a quote-
    * sensitive concat check (the text field roundtrips verbatim). */
  private val oracleAgg =
    """SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  MIN(md5(text)) AS min_text_hash
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  private def agg(df: DataFrame): DataFrame =
    df.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("n_chars")).as("sum_chars"),
        min(md5(col("text"))).as("min_text_hash"))
      .orderBy(col("lang"))

  /** CSV roundtrip: header + quote/escape options exercised with a text
    * field (commas impossible in the corpus, so quoting is additionally
    * forced via quoteAll). */
  val q53CsvScan: Q = Q.sql("q53_csv_scan", oracleAgg) { (s, dir) =>
    val path = s"${fixtureRoot(dir)}/documents_csv"
    // Always rewrite: a Files.exists early-exit would serve a stale fixture
    // the first time the testdata generator changes across rounds, turning a
    // data refresh into a false oracle failure. 500 rows at sf0.01 — cheap.
    Tables.documents(s, dir).write
      .option("header", "true").option("quoteAll", "true")
      .option("quote", "\"").option("escape", "\"")
      .mode("overwrite").csv(path)
    agg(s.read
      .schema(docSchema)
      .option("header", "true").option("quote", "\"").option("escape", "\"")
      .csv(path))
  }

  /** Multiline JSON roundtrip: a single array-of-objects file, read with
    * multiline=true + explicit schema (MLP.ipynb:34 parity — the
    * reference relies on inference; we pin the schema per SURVEY §1.3). */
  val q54JsonMultiline: Q = Q.sql("q54_json_multiline", oracleAgg) { (s, dir) =>
    val path = s"${fixtureRoot(dir)}/documents_json/docs.json"
    // Always rewrite — same staleness rationale as the CSV fixture above.
    Files.createDirectories(Paths.get(path).getParent)
    val rows = Tables.documents(s, dir).orderBy(col("doc_id"))
      .toJSON.collect() // fixture scaffolding: one small table, driver-side
    Files.writeString(Paths.get(path), rows.mkString("[\n", ",\n", "\n]"))
    agg(s.read
      .schema(docSchema)
      .option("multiline", "true")
      .json(path))
  }

  val all: Seq[Q] = Seq(q53CsvScan, q54JsonMultiline)
}
