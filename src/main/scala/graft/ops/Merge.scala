package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Changelog compaction / CDC upsert — merge an update batch into a base
  * snapshot with latest-wins semantics per entity key, the maintenance
  * operation every incrementally-ingested corpus needs (SCD type 1; no
  * analog in the reference, which reloads from scratch). The base/update
  * split here is the deterministic `event_id % 5` partition of the
  * events changelog standing in for two ingest generations.
  *
  * Scale: one shuffle on the entity key, one sort per key group, and the
  * row_number filter evaluates inside that single window pass — the same
  * shape Delta/Iceberg MERGE compaction lowers to. Version order is
  * total ((t, event_id) is unique per key), so the survivor set is
  * partitioning-independent — the determinism a 1000-executor compaction
  * job needs.
  */
object Merge {

  /** Latest-wins compaction of any changelog: keep, per distinct value
    * of `keys`, the single row that sorts FIRST under `version` (pass
    * descending columns for newest-wins). `version` must be a total
    * order within each key group or the survivor is nondeterministic.
    * The rank rides in a graft-prefixed temp column so a user changelog
    * that already carries an `rn` column passes through untouched. */
  private[graft] def upsertLatest(changelog: DataFrame, keys: Seq[String],
                                  version: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(version: _*)
    changelog
      .withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** Latest-wins merge of the `upd` batch over the `base` snapshot,
    * keyed by (user_id, event_type), version-ordered by (t, event_id)
    * ([[upsertLatest]]). `src` tags which generation won — the audit
    * column an upsert job publishes. The value column is carried
    * through unchanged (no arithmetic → exact in both engines). */
  val q103MergeUpsert: Q = Q.sql(
    "q103_merge_upsert",
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS t, value, event_id,
      |    CASE WHEN event_id % 5 = 0 THEN 'upd' ELSE 'base' END AS src
      |  FROM events),
      |ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |    ORDER BY t DESC, event_id DESC) AS rn
      |  FROM ev)
      |SELECT user_id, event_type, t, value, event_id, src
      |FROM ranked WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin
  ) { (s, dir) =>
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t"), col("value"), col("event_id"),
        when(col("event_id") % 5 === 0, lit("upd")).otherwise(lit("base")).as("src"))
    upsertLatest(ev, Seq("user_id", "event_type"),
      Seq(col("t").desc, col("event_id").desc))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** SCD type 2 — the history-preserving complement of [[q103MergeUpsert]]:
    * every change event becomes a validity interval [effective_from,
    * effective_to) per entity key, closed by the NEXT version's timestamp
    * (lead), open (NULL + is_current) for the latest. Same single
    * window pass / one shuffle as the compaction; downstream as-of reads
    * become a plain range predicate on the interval columns. */
  val q104Scd2History: Q = Q.sql(
    "q104_scd2_history",
    """WITH ev AS (
      |  SELECT user_id, event_type, event_id, epoch_us(ts) AS effective_from, value
      |  FROM events),
      |h AS (
      |  SELECT *, LEAD(effective_from) OVER (PARTITION BY user_id, event_type
      |    ORDER BY effective_from, event_id) AS effective_to
      |  FROM ev)
      |SELECT user_id, event_type, event_id, effective_from, effective_to, value,
      |  effective_to IS NULL AS is_current
      |FROM h
      |ORDER BY user_id, event_type, effective_from, event_id""".stripMargin
  ) { (s, dir) =>
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("effective_from"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("effective_from"), col("value"))
      .withColumn("effective_to", lead(col("effective_from"), 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
      .orderBy(col("user_id"), col("event_type"), col("effective_from"), col("event_id"))
  }

  /** Incremental materialized-view maintenance — the partial-aggregate
    * merge identity every warehouse MV engine relies on: COUNT and
    * DECIMAL-SUM are algebraic, so per-customer state computed on the
    * base generation and on a delta batch can be merged AT STATE GRAIN
    * (sum the counts, sum the sums) without rescanning base raw data,
    * and derived metrics (avg) are recomputed from merged state. Both
    * generations here come from one fixture table split on
    * `o_orderkey % 8` — in production the base arm is the STORED state
    * table, so refresh cost is O(delta + |state|), not O(base).
    *
    * Scale: each arm is an ordinary map-side-combined hash agg; the
    * merge shuffles only state rows (one per customer per arm). The
    * sums stay DECIMAL(18,2)→DECIMAL sums end to end — merge order
    * can't perturb them — and avg divides the exact decimal (cast to
    * double) by the exact count, the same IEEE operation in both
    * engines. */
  val q112ViewMerge: Q = Q.sql(
    "q112_view_merge",
    """WITH base AS (
      |  SELECT o_custkey, COUNT(*) AS cnt,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s
      |  FROM orders WHERE o_orderkey % 8 <> 0 GROUP BY o_custkey),
      |delta AS (
      |  SELECT o_custkey, COUNT(*) AS cnt,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s
      |  FROM orders WHERE o_orderkey % 8 = 0 GROUP BY o_custkey),
      |merged AS (
      |  SELECT o_custkey, CAST(SUM(cnt) AS BIGINT) AS n_orders, SUM(s) AS s2
      |  FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)
      |  GROUP BY o_custkey)
      |SELECT o_custkey, n_orders,
      |  CAST(s2 AS DOUBLE) AS sum_price,
      |  CAST(s2 AS DOUBLE) / n_orders AS avg_price
      |FROM merged
      |ORDER BY o_custkey""".stripMargin
  ) { (s, dir) =>
    def state(df: DataFrame): DataFrame =
      df.groupBy(col("o_custkey")).agg(
        count(lit(1)).as("cnt"),
        sum(Relational.dec(col("o_totalprice"))).as("s"))
    val orders = Tables.orders(s, dir)
    mergeStates(
      state(orders.filter(col("o_orderkey") % 8 =!= 0)),
      state(orders.filter(col("o_orderkey") % 8 === 0)),
      Seq("o_custkey"))
      .orderBy(col("o_custkey"))
  }

  /** Merge two keyed (keys…, cnt, s) partial-aggregate states and
    * publish (n_orders, sum_price, avg_price) per key. Exposed through
    * the facade: callers hand the STORED state plus a freshly
    * aggregated delta batch — neither arm's raw rows are touched. */
  private[graft] def mergeStates(base: DataFrame, delta: DataFrame,
                                 keys: Seq[String]): DataFrame =
    base.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).as("n_orders"), sum(col("s")).as("s2"))
      .select(keys.map(col) ++ Seq(col("n_orders"),
        col("s2").cast("double").as("sum_price"),
        (col("s2").cast("double") / col("n_orders")).as("avg_price")): _*)

  /** Snapshot delta detection — the change-data feed for incremental
    * corpus maintenance: classify every key as added / removed /
    * changed / unchanged between two ingest generations by comparing a
    * content fingerprint column, so downstream recompute (re-banding
    * via q83's incremental MinHash, re-tokenization, manifest refresh)
    * touches ONLY the delta instead of the whole corpus. The old side
    * needs nothing but its stored (key, fingerprint) manifest — tens of
    * bytes per document, not the old corpus — so a 100 TB refresh is
    * one co-partitioned join of the new generation against a manifest
    * orders of magnitude smaller. Both sides hash-partition on the key
    * (Spark cannot broadcast a full outer join's build side, and at
    * corpus scale both sides are large anyway); output carries the
    * new-side payload columns, falling back to the old side's value
    * ONLY on removed rows (a matched row keeps the new side verbatim —
    * a null new value is data, not a signal to resurrect stale bytes)
    * for columns the two frames share.
    *
    * `oldSnap`/`newSnap` must both contain `key` and `fp`; a null
    * fingerprint on a present side FAILS FAST (`raise_error` inside
    * the status classifier) — a null would otherwise make
    * changed-vs-unchanged undecidable and `=!=` would silently file
    * the row under `unchanged`. */
  private[graft] def snapshotDeltaOf(oldSnap: DataFrame, newSnap: DataFrame,
                                     key: String, fp: String): DataFrame = {
    require(oldSnap.columns.contains(fp) && newSnap.columns.contains(fp),
      s"fingerprint column '$fp' must exist in both snapshots")
    val oldCols = oldSnap.columns.filterNot(_ == key)
    val o = oldSnap.select(col(key).as("__graft_k_old") +:
      oldCols.map(c => col(c).as(s"__graft_old_$c")): _*)
    val n = newSnap.select(col(key).as("__graft_k_new") +:
      newSnap.columns.filterNot(_ == key).map(col): _*)
    val joined = o.join(n, col("__graft_k_old") === col("__graft_k_new"), "full_outer")
    // the null-fp check runs BEFORE the added/removed branches, so a
    // present side with a null fingerprint fails fast in EVERY status —
    // an added row stored with a null fp would poison the manifest the
    // NEXT refresh joins against (ADVICE r9: the earlier ordering let
    // added/removed rows slip past the check)
    val status = when(
        (col("__graft_k_new").isNotNull && col(fp).isNull) ||
          (col("__graft_k_old").isNotNull && col(s"__graft_old_$fp").isNull),
        raise_error(concat(lit("snapshotDelta: null fingerprint for key "),
          coalesce(col("__graft_k_new").cast("string"),
            col("__graft_k_old").cast("string"), lit("?")))))
      .when(col("__graft_k_old").isNull, lit("added"))
      .when(col("__graft_k_new").isNull, lit("removed"))
      .when(col(s"__graft_old_$fp") =!= col(fp), lit("changed"))
      .otherwise(lit("unchanged"))
    val attrs = newSnap.columns.filterNot(_ == key).map { c =>
      if (oldCols.contains(c))
        when(col("__graft_k_new").isNull, col(s"__graft_old_$c"))
          .otherwise(col(c)).as(c)
      else col(c)
    }
    joined.select(coalesce(col("__graft_k_old"), col("__graft_k_new")).as(key) +:
      status.as("status") +: attrs: _*)
  }

  /** q205: delta detection between two simulated ingest generations of
    * the documents corpus — the old generation lacks every 11th doc
    * (those read as `added`), carries stale text for every 7th
    * (`changed`), and the new generation dropped every 13th
    * (`removed`); fingerprints are md5(text), identical bytes in both
    * engines. Rolled up to the (source, status) audit a refresh job
    * publishes before deciding what to recompute. */
  val q205SnapshotDelta: Q = Q.sql(
    "q205_snapshot_delta",
    """WITH oldsnap AS (
      |  SELECT doc_id, source,
      |    md5(text || CASE WHEN doc_id % 7 = 2 THEN ' legacy' ELSE '' END) AS fp
      |  FROM documents WHERE doc_id % 11 <> 3),
      |newsnap AS (
      |  SELECT doc_id, source, md5(text) AS fp
      |  FROM documents WHERE doc_id % 13 <> 5),
      |delta AS (
      |  SELECT coalesce(n.source, o.source) AS source,
      |    CASE WHEN o.doc_id IS NULL THEN 'added'
      |         WHEN n.doc_id IS NULL THEN 'removed'
      |         WHEN o.fp <> n.fp THEN 'changed'
      |         ELSE 'unchanged' END AS status
      |  FROM oldsnap o FULL OUTER JOIN newsnap n ON o.doc_id = n.doc_id)
      |SELECT source, status, COUNT(*) AS n_docs
      |FROM delta GROUP BY source, status
      |ORDER BY source, status""".stripMargin
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val old = docs.filter(col("doc_id") % 11 =!= 3)
      .select(col("doc_id"), col("source"),
        md5(concat(col("text"),
          when(col("doc_id") % 7 === 2, lit(" legacy")).otherwise(lit("")))).as("fp"))
    val neu = docs.filter(col("doc_id") % 13 =!= 5)
      .select(col("doc_id"), col("source"), md5(col("text")).as("fp"))
    snapshotDeltaOf(old, neu, "doc_id", "fp")
      .groupBy(col("source"), col("status"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("source"), col("status"))
  }

  val all: Seq[Q] = Seq(q103MergeUpsert, q104Scd2History, q112ViewMerge,
    q205SnapshotDelta)
}
