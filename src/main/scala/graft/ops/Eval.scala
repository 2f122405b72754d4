package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q

/** Ranking-metric evaluation — exact distributed ROC-AUC and the
  * precision/recall curve over (score, label) frames: how a quality
  * classifier (the reference's model.eval.py territory, re-expressed at
  * corpus scale) is actually judged before its threshold gates a 100 TB
  * filter. The reference evaluates with sklearn's single-process
  * roc_auc_score / classification_report (model.eval.py); here both
  * metrics are exact integer rank statistics that distribute.
  *
  * Scale design:
  *  - Both metrics reduce the corpus to DISTINCT-SCORE grain first (one
  *    map-side-combined aggregation — ties MUST merge for the rank math
  *    anyway), so all downstream work is |distinct scores| ≤ |corpus|.
  *  - The cumulative-over-scores step is the scalable-global-rank
  *    pattern (q166's): range-repartition on the score, per-partition
  *    prefix via an ordinary partitioned window, then broadcast
  *    ≤|partitions|-row offsets — never a one-partition window.
  *  - All arithmetic is int64 until the single final division (two
  *    exact integers in IEEE double — correctly rounded, so the 9-dp
  *    rounded result is bit-identical cross-engine; the q161 family's
  *    discipline without its libm caveat, since no transcendental is
  *    involved).
  *
  * AUC uses the Mann–Whitney identity with average-rank tie handling:
  *   2·U = Σ_g (2·pos_g·neg_lt_g + pos_g·neg_g),  AUC = 2U / (2·P·N)
  * where g ranges over distinct scores and neg_lt_g counts negatives
  * strictly below g — the exact value sklearn's roc_auc_score computes.
  */
object Eval {

  /** Exclusive running sums of each `(value, out)` in `order`, appended
    * as the `out` columns — scalable: range repartition on the sort
    * key, local window prefixes, broadcast per-partition offsets.
    * Exactly the one-partition `sum(value) OVER (ORDER BY order ROWS
    * UNBOUNDED PRECEDING AND 1 PRECEDING)` without the one-partition
    * funnel; all requested prefixes ride ONE repartition (the local
    * windows and the offsets aggregation share the ranged exchange, so
    * ReuseExchange keeps it a single shuffle of the data). Values must
    * be int64-safe (counts). */
  private[graft] def withExclusivePrefix(df: DataFrame, order: Seq[Column],
                                         values: Seq[(Column, String)]): DataFrame = {
    val ranged = df.repartitionByRange(order: _*)
      .withColumn("__graft_pid", spark_partition_id())
    val local = Window.partitionBy(col("__graft_pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = values.foldLeft(ranged) { case (acc, (value, out)) =>
      acc.withColumn(s"__graft_lpre_$out",
        coalesce(sum(value).over(local), lit(0L)))
    }
    // ≤|partitions| rows; pmod(pid,1)=0 keeps WindowExec from flagging a
    // global window (same trick as curriculumOf)
    val offsets = ranged.groupBy(col("__graft_pid"))
      .agg(sum(values.head._1).as(s"__graft_pn_${values.head._2}"),
        values.tail.map { case (value, out) => sum(value).as(s"__graft_pn_$out") }: _*)
    val offW = Window.partitionBy(pmod(col("__graft_pid"), lit(1)))
      .orderBy(col("__graft_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withOff = values.foldLeft(offsets) { case (acc, (_, out)) =>
      acc.withColumn(s"__graft_off_$out",
        coalesce(sum(col(s"__graft_pn_$out")).over(offW), lit(0L)))
    }.select(col("__graft_pid") +: values.map { case (_, out) =>
      col(s"__graft_off_$out")
    }: _*)
    val joined = withLocal.join(broadcast(withOff), Seq("__graft_pid"))
    values.foldLeft(joined) { case (acc, (_, out)) =>
      acc.withColumn(out, col(s"__graft_off_$out") + col(s"__graft_lpre_$out"))
    }.drop("__graft_pid" +: values.flatMap { case (_, out) =>
      Seq(s"__graft_lpre_$out", s"__graft_off_$out")
    }: _*)
  }

  /** (score, cnt, pos, neg) at distinct-score grain from a (score, y)
    * frame — y ∈ {0, 1}; null scores/labels are out of the metric's
    * domain and dropped. */
  private def scoreGroups(scored: DataFrame): DataFrame =
    scored.filter(col("score").isNotNull && col("y").isNotNull)
      .groupBy(col("score"))
      .agg(count(lit(1)).as("cnt"), sum(col("y").cast("long")).as("pos"))
      .withColumn("neg", col("cnt") - col("pos"))

  /** Exact ROC-AUC of `scored` (score: orderable numeric, y: 0/1) with
    * average-rank ties — one row (n, n_pos, n_neg, auc). AUC is null
    * for a single-class input (undefined, not 0). */
  private[graft] def aucOf(scored: DataFrame): DataFrame = {
    val g = scoreGroups(scored)
    val pre = withExclusivePrefix(g, Seq(col("score").asc),
      Seq(col("neg") -> "neg_lt"))
    pre.agg(
      sum(col("pos")).as("np"), sum(col("neg")).as("nn"),
      sum(lit(2L) * col("pos") * col("neg_lt") + col("pos") * col("neg")).as("num2"))
      .select(
        (col("np") + col("nn")).as("n"), col("np").as("n_pos"), col("nn").as("n_neg"),
        when(col("np") > 0 && col("nn") > 0,
          round(col("num2").cast("double") / (lit(2L) * col("np") * col("nn")), 9))
          .as("auc"))
  }

  /** Precision/recall curve of `scored` at every distinct-score
    * threshold t (predict positive iff score ≥ t), descending:
    * (score, tp, fp, fn, precision, recall). The operating-point table
    * a threshold gate is chosen from. */
  private[graft] def prCurveOf(scored: DataFrame): DataFrame = {
    val g = scoreGroups(scored)
    val totals = g.agg(coalesce(sum(col("pos")), lit(0L)).as("np"))
    val pre2 = withExclusivePrefix(g, Seq(col("score").desc),
      Seq(col("pos") -> "pos_gt", col("cnt") -> "cnt_gt"))
    pre2.crossJoin(broadcast(totals))
      .select(col("score"),
        (col("pos_gt") + col("pos")).as("tp"),
        (col("cnt_gt") + col("cnt") - col("pos_gt") - col("pos")).as("fp"),
        (col("np") - col("pos_gt") - col("pos")).as("fn"),
        col("np"))
      .select(col("score"), col("tp"), col("fp"), col("fn"),
        round(col("tp").cast("double") / (col("tp") + col("fp")), 9).as("precision"),
        when(col("np") > 0, round(col("tp").cast("double") / col("np"), 9))
          .as("recall"))
  }

  /** Calibration (reliability) table of a (score ∈ [0,1], y ∈ {0,1})
    * frame over `bins` equal-width score buckets: (bin, n, pos,
    * mean_score, frac_pos) — a well-calibrated scorer has mean_score ≈
    * frac_pos per bin. One map-side-combined aggregation at bin grain;
    * mean_score sums exact nano-unit integers (scores are 9-dp data, so
    * round(score·1e9) is lossless), both divisions are exact-int ÷
    * exact-int in IEEE double — bit-stable cross-engine. */
  private[graft] def calibrationOf(scored: DataFrame, bins: Int): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    scored.filter(col("score").isNotNull && col("y").isNotNull)
      .select(
        least(floor(col("score") * bins), lit(bins - 1)).cast("int").as("bin"),
        col("y").cast("long").as("y"),
        round(col("score") * 1e9).cast("long").as("s9"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"), sum(col("s9")).as("ss9"))
      .select(col("bin"), col("n"), col("pos"),
        round(col("ss9").cast("double") / (col("n") * 1e9), 9).as("mean_score"),
        round(col("pos").cast("double") / col("n"), 9).as("frac_pos"))
  }

  /** Cumulative-Poisson(1) thresholds in nano-units: u9 < t(k) ⇒ weight
    * k. Constants of e⁻¹/k! — hardcoded so BOTH engines compare the
    * same integers (no transcendental evaluated in either plan). */
  private[graft] val PoissonCumNano: Seq[Long] = Seq(
    367879441L, 735758882L, 919698603L, 981011843L,
    996340153L, 999405815L, 999916759L, 999989751L)

  private def poissonWeight(u9: Column): Column =
    PoissonCumNano.zipWithIndex.foldRight(lit(PoissonCumNano.length): Column) {
      case ((t, k), acc) => when(u9 < t, lit(k)).otherwise(acc)
    }

  /** Poisson bootstrap of a mean (the MapReduce-native bootstrap: per
    * replicate each row gets an independent Poisson(1) multiplicity, so
    * resampling is a row-local weight — no sampling pass per replicate,
    * no global state). `rows` carries (id: any castable-to-string unique
    * key, cents: int64 fixed-point values); returns one row (n, mean,
    * ci_lo, ci_hi) where the CI brackets are the 2nd-smallest /
    * 2nd-largest of the `b` replicate means (≈ the 94% interval at
    * b = 32).
    *
    * Determinism: weights are a pure md5 function of (id, replicate) —
    * integer nano-unit uniform against integer thresholds, so
    * membership is bit-exact in both engines; replicate sums are int64.
    *
    * Scale: the explode is b× COMPUTE but the aggregation is
    * map-side-combined to ≤b rows per partition — shuffle volume is
    * b × |partitions| rows, independent of data size; the b-row ranking
    * window is constant-sized. */
  private[graft] def bootstrapMeanOf(rows: DataFrame, b: Int): DataFrame = {
    require(b >= 4, s"need at least 4 replicates for the 2nd/2nd-last CI, got $b")
    val px = rows.select(col("id").cast("string").as("id"), col("cents"))
    val rep = px.withColumn("r", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("u9",
        call_function("graft_md5long64",
          concat_ws(":", col("id"), col("r").cast("string"))) % 1000000000L)
      .withColumn("wgt", poissonWeight(col("u9")))
    val m = rep.groupBy(col("r"))
      .agg(sum(col("wgt")).as("nr"), sum(col("wgt") * col("cents")).as("sr"))
      .select(col("r"),
        round(col("sr").cast("double") / (col("nr") * 100.0), 6).as("mean_r"))
    // b-row constant frame; pmod(r,1)=0 partition keeps WindowExec quiet
    val mw = Window.partitionBy(pmod(col("r"), lit(1)))
      .orderBy(col("mean_r"), col("r"))
    val ranked = m.withColumn("rn", row_number().over(mw))
    val lo = ranked.filter(col("rn") === 2).select(col("mean_r").as("ci_lo"))
    val hi = ranked.filter(col("rn") === b - 1).select(col("mean_r").as("ci_hi"))
    val pt = px.agg(count(lit(1)).as("n"),
      round(sum(col("cents")).cast("double") / (count(lit(1)) * 100.0), 6).as("mean"))
    pt.crossJoin(broadcast(lo)).crossJoin(broadcast(hi))
  }

  /** The shared benchmark task both queries evaluate: the composite
    * quality score as a detector of English documents — exactly the
    * score→binary-gate shape a curation threshold is tuned on. */
  private def qualityVsEnglish(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.textStats(s, dir)
      .select(col("quality").as("score"),
        when(col("lang") === "en", 1).otherwise(0).as("y"))

  private val oracleScored: String =
    s"""sc AS (
       |  SELECT quality AS score, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
       |  FROM (${TextAnalysis.oracleTextStats.replace("\n", "\n  ")})),
       |g AS (
       |  SELECT score, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(y) AS BIGINT) AS pos,
       |    CAST(count(*) - sum(y) AS BIGINT) AS neg
       |  FROM sc GROUP BY score)""".stripMargin

  /** Exact ROC-AUC of the quality score as an English-detector (the
    * synthetic corpus draws vocabulary uniformly, so the measured AUC is
    * near chance — the computation, not the classifier, is under
    * test). */
  val q180Auc: Q = Q.sql(
    "q180_auc",
    s"""WITH $oracleScored,
       |p AS (
       |  SELECT pos, neg,
       |    CAST(coalesce(sum(neg) OVER (ORDER BY score
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS neg_lt
       |  FROM g),
       |t AS (
       |  SELECT CAST(sum(pos) AS BIGINT) AS np, CAST(sum(neg) AS BIGINT) AS nn,
       |    CAST(sum(2 * pos * neg_lt + pos * neg) AS BIGINT) AS num2
       |  FROM p)
       |SELECT np + nn AS n, np AS n_pos, nn AS n_neg,
       |  CASE WHEN np > 0 AND nn > 0
       |       THEN round(CAST(num2 AS DOUBLE) / (2 * np * nn), 9) END AS auc
       |FROM t""".stripMargin
  ) { (s, dir) => aucOf(qualityVsEnglish(s, dir)) }

  /** The quality-threshold operating-point table for the same task —
    * every (threshold, tp, fp, fn, precision, recall) row a gate could
    * run at. */
  val q181PrCurve: Q = Q.sql(
    "q181_pr_curve",
    s"""WITH $oracleScored,
       |c AS (
       |  SELECT score,
       |    CAST(sum(pos) OVER w AS BIGINT) AS tp,
       |    CAST(sum(cnt - pos) OVER w AS BIGINT) AS fp,
       |    CAST((SELECT sum(pos) FROM g) - sum(pos) OVER w AS BIGINT) AS fn
       |  FROM g
       |  WINDOW w AS (ORDER BY score DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT score, tp, fp, fn,
       |  round(CAST(tp AS DOUBLE) / (tp + fp), 9) AS precision,
       |  round(CAST(tp AS DOUBLE) / (tp + fn), 9) AS recall
       |FROM c
       |ORDER BY score DESC""".stripMargin
  ) { (s, dir) =>
    prCurveOf(qualityVsEnglish(s, dir)).orderBy(col("score").desc)
  }

  /** Calibration of the quality score against the English label over 10
    * equal-width bins — the reliability diagram's data. */
  val q183Calibration: Q = Q.sql(
    "q183_calibration",
    s"""WITH $oracleScored,
       |b AS (
       |  SELECT least(CAST(floor(score * 10) AS INT), 9) AS bin, y,
       |    CAST(round(score * 1e9) AS BIGINT) AS s9
       |  FROM sc)
       |SELECT bin, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos,
       |  round(CAST(sum(s9) AS DOUBLE) / (count(*) * 1e9), 9) AS mean_score,
       |  round(CAST(sum(y) AS DOUBLE) / count(*), 9) AS frac_pos
       |FROM b GROUP BY bin
       |ORDER BY bin""".stripMargin
  ) { (s, dir) =>
    calibrationOf(qualityVsEnglish(s, dir), 10).orderBy(col("bin"))
  }

  private def oracleThresholdCase: String =
    ("CASE " + PoissonCumNano.zipWithIndex
      .map { case (t, k) => s"WHEN u9 < $t THEN $k" }
      .mkString(" ") + s" ELSE ${PoissonCumNano.length} END")

  /** Poisson-bootstrap CI for the mean order value: 32 deterministic
    * md5-keyed Poisson(1)-weighted replicates — the error bar a metric
    * pipeline reports next to every point estimate, computed without a
    * per-replicate sampling pass. */
  val q184BootstrapCi: Q = Q.sql(
    "q184_bootstrap_ci",
    s"""WITH px AS (
       |  SELECT o_orderkey AS id, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
       |  FROM orders),
       |rep AS (
       |  SELECT id, cents, r,
       |    CAST(concat('0x', substr(md5(concat(id, ':', r)), 1, 15)) AS BIGINT)
       |      % 1000000000 AS u9
       |  FROM px, (SELECT unnest(range(0, 32)) AS r)),
       |m AS (
       |  SELECT r,
       |    CAST(sum($oracleThresholdCase) AS BIGINT) AS nr,
       |    CAST(sum(($oracleThresholdCase) * cents) AS BIGINT) AS sr
       |  FROM rep GROUP BY r),
       |mm AS (
       |  SELECT round(CAST(sr AS DOUBLE) / (nr * 100.0), 6) AS mean_r,
       |    ROW_NUMBER() OVER (ORDER BY round(CAST(sr AS DOUBLE) / (nr * 100.0), 6), r) AS rn
       |  FROM m),
       |pt AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    round(CAST(sum(cents) AS DOUBLE) / (count(*) * 100.0), 6) AS mean
       |  FROM px)
       |SELECT pt.n, pt.mean,
       |  (SELECT mean_r FROM mm WHERE rn = 2) AS ci_lo,
       |  (SELECT mean_r FROM mm WHERE rn = 31) AS ci_hi
       |FROM pt""".stripMargin
  ) { (s, dir) =>
    bootstrapMeanOf(
      graft.Tables.orders(s, dir)
        .select(col("o_orderkey").as("id"),
          round(col("o_totalprice") * 100).cast("long").as("cents")),
      32)
      .orderBy(col("n"))
  }

  val all: Seq[Q] = Seq(q180Auc, q181PrCurve, q183Calibration, q184BootstrapCi)
}
