package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Column profiling — the data-quality summary a pipeline runs before
  * trusting a new 100 TB drop: per-column null counts, exact distinct
  * cardinality, min/max. (The reference's nearest idiom is ad-hoc
  * df.count/df.distinct inspection, MLP.ipynb:53-63; this is that as one
  * operator.)
  *
  * Scale: TWO narrow passes, not one wide one. Putting every
  * COUNT(DISTINCT) plus 3×cols plain aggregates into a single
  * aggregation plans an Expand(cols+1) feeding one 4×cols-buffer
  * hash aggregate — measured 8.7 s at sf0.1 vs 1.7 s for the distincts
  * alone (the fused operator is too wide for effective codegen). Split
  * instead: pass A computes nulls/min/max in one ordinary aggregation
  * (no Expand, 1 output row); pass B melts rows to (col_name, value)
  * via `stack` and counts distincts two-level, so its shuffle carries
  * one row per DISTINCT (column, value) after map-side combine —
  * 1.0 s total at sf0.1, and at 100 TB each pass is a plain scan with
  * vocabulary-sized shuffle, no wide-buffer aggregate anywhere.
  */
object Profile {

  /** Long-format profile of `cols`: one output row per column with
    * (col_name, n_rows, n_nulls, n_distinct, min_v, max_v); min/max are
    * rendered to strings so heterogeneous column types share one schema.
    * Column names are embedded in generated SQL — callers pass trusted
    * identifiers. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    // pass A: nulls + native-typed min/max (rendered to string only at
    // the end — melting first would min/max lexicographically)
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
      (count(lit(1)) - count(col(c))).as(s"nn_$c"),
      min(col(c)).cast("string").as(s"mn_$c"),
      max(col(c)).cast("string").as(s"mx_$c")))
    val stackArgs = cols.map(c => s"'$c', `nn_$c`, `mn_$c`, `mx_$c`").mkString(", ")
    val meta = df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(
        s"stack(${cols.size}, $stackArgs) AS (col_name, n_nulls, min_v, max_v)",
        "n_rows")
    // pass B: melt to (col_name, value-as-string) — injective per column
    // type — then two-level exact distinct: the (col_name, v) distinct is
    // map-side combined, the per-column count is a tiny second shuffle
    val meltArgs = cols.map(c => s"'$c', cast(`$c` AS string)").mkString(", ")
    val distincts = df
      .selectExpr(s"stack(${cols.size}, $meltArgs) AS (col_name, v)")
      .filter(col("v").isNotNull)
      .distinct()
      .groupBy(col("col_name")).agg(count(lit(1)).as("n_distinct"))
    // all-null columns vanish from pass B → left join, distinct count 0
    meta.join(distincts, Seq("col_name"), "left")
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_v"), col("max_v"))
  }

  /** Profile of lineitem's integer/string columns (doubles and
    * timestamps are excluded from THIS oracle-paired query only because
    * double→string rendering differs between engines — the operator
    * itself profiles any type; ProfileSpec covers a double column). */
  val q89Profile: Q = {
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_returnflag", "l_linestatus")
    val arms = cols.map { c =>
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
         |  COUNT(*) - COUNT($c) AS n_nulls,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(MIN($c) AS VARCHAR) AS min_v, CAST(MAX($c) AS VARCHAR) AS max_v
         |FROM lineitem""".stripMargin
    }
    Q.sql(
      "q89_profile",
      arms.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    ) { (s, dir) =>
      profile(Tables.lineitem(s, dir), cols).orderBy(col("col_name"))
    }
  }

  /** Equi-width histogram of `cols` (melted long-format, `nb` buckets
    * per column): (col_name, bucket, b_lo, b_hi, n). TWO narrow passes
    * by construction — global min/max must exist before any row can be
    * bucketed — mirroring [[profile]]'s split-pass design: pass A is a
    * per-column min/max aggregate (|cols| output rows, broadcast back),
    * pass B buckets each row against its column's range and hash-aggs
    * (col_name, bucket) with map-side combine, so the shuffle carries at
    * most |cols|×`nb` rows per mapper. All bucket arithmetic is the same
    * left-associated IEEE double expression in both engines (subtract,
    * multiply, divide, floor) → bit-identical bucket ids and bounds.
    * Column names are embedded in generated SQL — trusted identifiers. */
  def histogram(df: DataFrame, cols: Seq[String], nb: Int): DataFrame = {
    require(cols.nonEmpty && nb > 0, "histogram needs columns and buckets")
    val meltArgs = cols.map(c => s"'$c', CAST(`$c` AS DOUBLE)").mkString(", ")
    val melt = df
      .selectExpr(s"stack(${cols.size}, $meltArgs) AS (col_name, v)")
      .filter(col("v").isNotNull)
    val ranges = melt.groupBy(col("col_name"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    melt.join(broadcast(ranges), "col_name")
      .select(col("col_name"), col("lo"), col("hi"),
        when(col("hi") === col("lo"), 0)
          .otherwise(least(lit(nb - 1),
            floor((col("v") - col("lo")) * nb / (col("hi") - col("lo")))).cast("int"))
          .as("bucket"))
      .groupBy(col("col_name"), col("bucket"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n"))
      .select(col("col_name"), col("bucket"),
        (col("lo") + col("bucket") * (col("hi") - col("lo")) / nb).as("b_lo"),
        (col("lo") + (col("bucket") + 1) * (col("hi") - col("lo")) / nb).as("b_hi"),
        col("n"))
  }

  /** 16-bucket histograms of lineitem's two measure columns — the
    * distribution half of the profiling family (q89 covers counts and
    * extrema). Doubles stay doubles end-to-end: the driver hashes
    * VALUES, and every b_lo/b_hi is the identical IEEE expression in
    * both engines, so no string rendering is involved. */
  val q111Histogram: Q = Q.sql(
    "q111_histogram",
    """WITH melt AS (
      |  SELECT col_name, v FROM (
      |    SELECT 'l_extendedprice' AS col_name, CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
      |    UNION ALL
      |    SELECT 'l_quantity', CAST(l_quantity AS DOUBLE) FROM lineitem)
      |  WHERE v IS NOT NULL),
      |r AS (SELECT col_name, MIN(v) AS lo, MAX(v) AS hi FROM melt GROUP BY col_name),
      |b AS (
      |  SELECT m.col_name,
      |    CASE WHEN r.hi = r.lo THEN 0
      |         ELSE CAST(LEAST(15, FLOOR((m.v - r.lo) * 16 / (r.hi - r.lo))) AS INTEGER)
      |    END AS bucket
      |  FROM melt m JOIN r USING (col_name)),
      |g AS (SELECT col_name, bucket, COUNT(*) AS n FROM b GROUP BY 1, 2)
      |SELECT g.col_name, g.bucket,
      |  r.lo + g.bucket * (r.hi - r.lo) / 16 AS b_lo,
      |  r.lo + (g.bucket + 1) * (r.hi - r.lo) / 16 AS b_hi,
      |  g.n
      |FROM g JOIN r USING (col_name)
      |ORDER BY col_name, bucket""".stripMargin
  ) { (s, dir) =>
    histogram(Tables.lineitem(s, dir), Seq("l_extendedprice", "l_quantity"), 16)
      .orderBy(col("col_name"), col("bucket"))
  }

  /** Per-group Pearson correlation (quantity vs price per returnflag)
    * from EXACT moments — the q107 determinism recipe applied to a
    * second statistic: built-in corr()/covar aggregates accumulate
    * floating co-moments whose value depends on evaluation order (and
    * differs between engines), so instead the five sums n, Σx, Σy, Σx²,
    * Σy², Σxy are taken over DECIMAL(18,2) inputs (exact, order-free,
    * map-side combinable), cast to double ONCE, and r is one fixed
    * IEEE expression over those six doubles — bit-identical anywhere.
    * One ordinary hash agg at scan speed; the moment table is |groups|
    * rows. */
  val q119GroupedCorr: Q = Q.sql(
    "q119_grouped_corr",
    """WITH m AS (
      |  SELECT l_returnflag AS flag, COUNT(*) AS n,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
      |  FROM lineitem GROUP BY 1)
      |SELECT flag, n,
      |  (n * sxy - sx * sy) /
      |    (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qp
      |FROM m
      |ORDER BY flag""".stripMargin
  ) { (s, dir) =>
    val dx = col("l_quantity").cast("decimal(18,2)")
    val dy = col("l_extendedprice").cast("decimal(18,2)")
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag").as("flag"))
      .agg(
        count(lit(1)).as("n"),
        sum(dx).cast("double").as("sx"),
        sum(dy).cast("double").as("sy"),
        sum(dx * dx).cast("double").as("sxx"),
        sum(dy * dy).cast("double").as("syy"),
        sum(dx * dy).cast("double").as("sxy"))
      .select(col("flag"), col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
            sqrt(col("n") * col("syy") - col("sy") * col("sy")))).as("corr_qp"))
      .orderBy(col("flag"))
  }

  /** Chi-square test of independence between two categorical columns —
    * the association/drift audit for corpus metadata (is `source`
    * independent of `lang`? did the crawl mix shift?). Per cell the
    * contribution (O−E)²/E is computed as (n·O − r·c)²/(n·r·c) — all
    * operands exact int64, one correctly-rounded IEEE division — then
    * rounded to integer micro-units BEFORE summing, so the statistic is
    * a sum of integers: partition- and order-independent, bit-identical
    * cross-engine (the discipline that keeps a Σ-of-doubles from
    * drifting on a 1000-executor shuffle).
    *
    * Scale: one scan to cell grain; rows/cols/total derive from the
    * CELL frame (≤ |A|·|B| rows — categorical by assumption) and
    * broadcast back; everything after the first aggregate is
    * cell-grain. */
  private[graft] def chi2Of(df: DataFrame, a: String, b: String): DataFrame = {
    val cells = df.select(col(a).as("va"), col(b).as("vb"))
      .filter(col("va").isNotNull && col("vb").isNotNull)
      .groupBy(col("va"), col("vb")).agg(count(lit(1)).as("o"))
    val rows = cells.groupBy(col("va")).agg(sum(col("o")).as("r"))
    val cols = cells.groupBy(col("vb")).agg(sum(col("o")).as("c"))
    val tot = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("va")).as("na"), countDistinct(col("vb")).as("nb"))
    cells
      .join(broadcast(rows), Seq("va"))
      .join(broadcast(cols), Seq("vb"))
      .crossJoin(broadcast(tot))
      .select(col("n"), col("na"), col("nb"),
        round(pow(col("n") * col("o") - col("r") * col("c"), 2) * 1e6
          / (col("n") * col("r") * col("c"))).cast("long").as("cm"))
      .groupBy(col("n"), col("na"), col("nb"))
      .agg(sum(col("cm")).as("chi2_micro"))
      .select(col("n"),
        ((col("na") - 1) * (col("nb") - 1)).as("dof"),
        col("chi2_micro"),
        round(col("chi2_micro") / 1e6, 6).as("chi2"))
  }

  /** Is document `source` independent of `lang`? The categorical-
    * association audit as one exact-integer statistic. */
  val q185Chi2Assoc: Q = Q.sql(
    "q185_chi2_assoc",
    """WITH cells AS (
      |  SELECT lang AS va, source AS vb, CAST(count(*) AS BIGINT) AS o
      |  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
      |  GROUP BY 1, 2),
      |rws AS (SELECT va, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY va),
      |cls AS (SELECT vb, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY vb),
      |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
      |  CAST(count(DISTINCT va) AS BIGINT) AS na,
      |  CAST(count(DISTINCT vb) AS BIGINT) AS nb FROM cells),
      |contrib AS (
      |  SELECT n, na, nb,
      |    CAST(round(pow(n * o - r * c, 2) * 1e6 / (n * r * c)) AS BIGINT) AS cm
      |  FROM cells JOIN rws USING (va) JOIN cls USING (vb), tot)
      |SELECT n, (na - 1) * (nb - 1) AS dof,
      |  CAST(sum(cm) AS BIGINT) AS chi2_micro,
      |  round(CAST(sum(cm) AS BIGINT) / 1e6, 6) AS chi2
      |FROM contrib GROUP BY n, na, nb
      |ORDER BY n""".stripMargin
  ) { (s, dir) =>
    chi2Of(Tables.documents(s, dir), "lang", "source").orderBy(col("n"))
  }

  // ---------------------------------------------- corpus checksums (q234/5)

  /** Per-group corpus CHECKSUM manifest — the reproducibility artifact a
    * pipeline stamps next to every published shard so a re-read (or a
    * re-build on different hardware / partitioning) can prove
    * byte-identity without comparing text: per `group`,
    * (n_docs, xsum, hsum_hi/hsum_lo) where xsum = bit_xor of the 60-bit
    * content hashes and hsum is their exact integer sum. Both aggregates
    * are commutative/associative (layout-independent by construction)
    * AND invertible — XOR is self-inverse, the decimal sum subtracts
    * exactly — which is what makes [[refreshCorpusChecksum]] the rare
    * stored artifact with EXACT remove support. A multiset subtlety is
    * inherent to XOR (two identical docs cancel); the (n_docs, hsum)
    * pair is what catches pair-cancellation, and the scaladoc contract
    * is the triple, never xsum alone.
    *
    * The exact sum is carried as DECIMAL(38,0) internally but PUBLISHED
    * as two int64-safe BIGINT limbs `hsum_hi`/`hsum_lo` (DIV / MOD 2^32
    * of the decimal intermediate): the sum of 60-bit hashes exceeds
    * signed-int64 range already at ~10 docs per group, and a manifest
    * column that no int64 reader (or typed hash gate — the r12 lesson,
    * CORRECTNESS_r12 q234/q235) can represent is a bad artifact shape.
    * The split is exactly invertible (hi·2^32 + lo reconstructs the
    * decimal), so [[refreshCorpusChecksum]]'s exact-subtract contract
    * is untouched; hsum_hi stays below 2^63 while a group holds fewer
    * than 2^35 ≈ 3.4e10 docs (n·2^60 / 2^32 = n·2^28).
    *
    * Scale: one scan, hashes at the scan (text never shuffles), one
    * map-side-combined aggregate at |groups| grain. */
  def corpusChecksum(docs: DataFrame, group: org.apache.spark.sql.Column): DataFrame =
    docs.select(group.as("source"), Hashes.hexLong(col("text")).as("h"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        expr("bit_xor(h)").as("xsum"),
        sum(col("h").cast("decimal(38,0)")).as("__hsum"))
      .select(col("source"), col("n_docs"), col("xsum"),
        expr("CAST(__hsum DIV 4294967296 AS BIGINT)").as("hsum_hi"),
        expr("CAST(__hsum % 4294967296 AS BIGINT)").as("hsum_lo"))

  val q234CorpusChecksum: Q = Q.sql(
    "q234_corpus_checksum",
    // the exact sum lives in a HUGEINT intermediate; only int64-safe
    // BIGINT limbs reach the output (the driver gate hashes a TYPED
    // representation — DECIMAL(38,0)/HUGEINT outputs burn it, r12)
    """WITH m AS (
      |  SELECT source,
      |    CAST(count(*) AS BIGINT) AS n_docs,
      |    bit_xor(CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT)) AS xsum,
      |    sum(CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT)) AS hsum
      |  FROM documents GROUP BY source)
      |SELECT source, n_docs, xsum,
      |  CAST(hsum // 4294967296 AS BIGINT) AS hsum_hi,
      |  CAST(hsum % 4294967296 AS BIGINT) AS hsum_lo
      |FROM m ORDER BY source""".stripMargin
  ) { (s, dir) =>
    corpusChecksum(Tables.documents(s, dir), col("source"))
      .orderBy(col("source"))
  }

  /** Incremental [[corpusChecksum]] maintenance from a before/after-image
    * change feed (`delta`: doc_id, status ∈ added|removed|changed,
    * source, text_old, text_new): removed/changed XOR-out and subtract
    * the OLD hash, added/changed XOR-in and add the NEW one — all three
    * statistics are exactly invertible, so the refreshed manifest is
    * bit-equal to a from-scratch rebuild (q235's gate). Groups whose
    * count reaches zero drop; a count below zero raise_errors — feed
    * corruption, not a guess (q224's discipline). Work ∝ |delta|
    * aggregated map-side, then one full-outer join at |groups| grain. */
  def refreshCorpusChecksum(state: DataFrame, delta: DataFrame): DataFrame = {
    val oldSide = delta.filter(col("status").isin("removed", "changed"))
      .select(col("source"), Hashes.hexLong(col("text_old")).as("h"), lit(-1L).as("dn"))
    val newSide = delta.filter(col("status").isin("added", "changed"))
      .select(col("source"), Hashes.hexLong(col("text_new")).as("h"), lit(1L).as("dn"))
    val d = oldSide.unionByName(newSide)
      .groupBy(col("source"))
      .agg(sum(col("dn")).as("dnn"),
        expr("bit_xor(h)").as("dx"),
        sum((col("h") * col("dn")).cast("decimal(38,0)")).as("dh"))
    // reconstruct the exact decimal sum from the published limbs
    // (hi·2^32 + lo — exact, both limbs nonneg for a well-formed state),
    // apply the signed decimal delta, then re-split for output
    val st = state.select(col("source"), col("n_docs"), col("xsum"),
      (col("hsum_hi").cast("decimal(38,0)") * lit(4294967296L) +
        col("hsum_lo")).cast("decimal(38,0)").as("__hsum"))
    st.join(d, Seq("source"), "full_outer")
      .select(col("source"),
        (coalesce(col("n_docs"), lit(0L)) + coalesce(col("dnn"), lit(0L))).as("n_docs"),
        expr("coalesce(xsum, 0L) ^ coalesce(dx, 0L)").as("xsum"),
        (coalesce(col("__hsum"), lit(0L).cast("decimal(38,0)")) +
          coalesce(col("dh"), lit(0L).cast("decimal(38,0)"))).as("__hsum"))
      .select(col("source"),
        when(col("n_docs") < 0, raise_error(concat(
          lit("refreshCorpusChecksum: count below zero for group "),
          col("source").cast("string"),
          lit(" — the delta removed docs the manifest never saw"))))
          .otherwise(col("n_docs")).as("n_docs"),
        col("xsum"),
        // a negative refreshed sum is the same feed corruption in the
        // other algebra (an old-image hash the manifest never absorbed)
        // — fail loud before the limb split would silently wrap
        when(col("__hsum") < 0, raise_error(concat(
          lit("refreshCorpusChecksum: hash sum below zero for group "),
          col("source").cast("string"),
          lit(" — the delta's old images disagree with the manifest"))))
          .otherwise(col("__hsum")).as("__hsum"))
      .filter(col("n_docs") > 0)
      .select(col("source"), col("n_docs"), col("xsum"),
        expr("CAST(__hsum DIV 4294967296 AS BIGINT)").as("hsum_hi"),
        expr("CAST(__hsum % 4294967296 AS BIGINT)").as("hsum_lo"))
  }

  /** q235: [[refreshCorpusChecksum]] oracle-gated — the ENGINE builds the
    * gen-1 manifest, refreshes it through the q207-convention change
    * feed (gen 1 lacks every 7th doc → added; gen 2 drops every 6th →
    * removed; every 5th's text gains a suffix → changed, with before
    * AND after images); the ORACLE computes the gen-2 manifest from
    * scratch. A stale hash, a missed removal, a changed doc refreshed
    * from the wrong text generation, or a dead group surviving all
    * break the hash — and the hsum/xsum pair means even compensating
    * errors must cancel in two unrelated algebras at once to slip by. */
  val q235ChecksumRefresh: Q = Q.sql(
    "q235_checksum_refresh",
    """WITH g2 AS (
      |  SELECT source,
      |    CASE WHEN doc_id % 5 = 0 THEN text || ' changed suffix' ELSE text END AS text
      |  FROM documents WHERE doc_id % 6 <> 0),
      |m AS (
      |  SELECT source,
      |    CAST(count(*) AS BIGINT) AS n_docs,
      |    bit_xor(CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT)) AS xsum,
      |    sum(CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT)) AS hsum
      |  FROM g2 GROUP BY source)
      |SELECT source, n_docs, xsum,
      |  CAST(hsum // 4294967296 AS BIGINT) AS hsum_hi,
      |  CAST(hsum % 4294967296 AS BIGINT) AS hsum_lo
      |FROM m ORDER BY source""".stripMargin
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val g1 = docs.filter(col("doc_id") % 7 =!= 0)
    val state1 = corpusChecksum(g1, col("source"))
    val changedText = concat(col("text"), lit(" changed suffix"))
    val delta = docs
      .withColumn("status",
        when(col("doc_id") % 7 === 0 && col("doc_id") % 6 =!= 0, lit("added"))
          .when(col("doc_id") % 6 === 0 && col("doc_id") % 7 =!= 0, lit("removed"))
          .when(col("doc_id") % 6 =!= 0 && col("doc_id") % 5 === 0, lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("status") =!= "unchanged")
      .select(col("doc_id"), col("status"), col("source"),
        col("text").as("text_old"),
        when(col("doc_id") % 5 === 0, changedText).otherwise(col("text")).as("text_new"))
    refreshCorpusChecksum(state1, delta)
      .orderBy(col("source"))
  }

  val all: Seq[Q] = Seq(q89Profile, q111Histogram, q119GroupedCorr, q185Chi2Assoc,
    q234CorpusChecksum, q235ChecksumRefresh)
}
