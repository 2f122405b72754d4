package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.types.DecimalType
import graft.{Q, Tables}

/** Structured Streaming surface (SURVEY §2.11 — an extension beyond the
  * reference, which has no streaming; the driver's `events` table is the
  * designated target). Every transform here is defined once against a
  * DataFrame and works identically for a batch read and a readStream —
  * the streaming twin of q21's hourly rollup, session windows, and a
  * custom-state counter via mapGroupsWithState.
  *
  * Scale design: all aggregations key on (window/session, group) so
  * state is bounded per key; the watermark bounds total state by evicting
  * windows older than the lateness horizon — without it a 100 TB/day
  * stream accretes state forever. session_window merges are Spark-native
  * (no per-event driver work).
  */
object Streaming {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class UserRunningCount(user_id: Long, n_events: Long)

  /** Hourly tumbling-window counts — q21's streaming twin. On an
    * unbounded source the 2h watermark finalizes each hour window once
    * events 2h past its end arrive. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(
        unix_micros(col("window.start")).as("hour_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Per-user session windows with a 1-day inactivity gap: Spark's
    * session_window merges events whose [ts, ts+gap) extents overlap —
    * a new session starts exactly when the inter-event gap is ≥ the
    * configured gap. Works identically in batch and streaming. */
  def userSessions(events: DataFrame, gap: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(
        col("user_id"),
        unix_micros(col("session_window.start")).as("session_start"),
        unix_micros(col("session_window.end")).as("session_end"),
        col("n_events"), col("sum_value"))

  /** Custom keyed state via mapGroupsWithState: a running per-user event
    * counter (the KeyValueGroupedDataset custom-state path for semantics
    * session_window can't express). Update-mode output: one row per
    * user per micro-batch. */
  def runningUserCounts(events: Dataset[Event]): Dataset[UserRunningCount] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, batch: Iterator[Event], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + batch.size
          state.update(total)
          UserRunningCount(user, total)
      }
  }

  final case class Doc(doc_id: Long, content_hash: String)

  /** Streaming exact dedup: first occurrence of each content hash wins,
    * later copies are dropped — the incremental twin of q24's batch
    * dedup (a corpus that arrives as a stream dedups as it lands instead
    * of in a nightly batch). Keyed state via flatMapGroupsWithState is
    * one boolean per DISTINCT hash; emission happens at most once per
    * key, so output volume equals the deduped corpus. State never
    * expires here (exact dedup is unbounded by definition); a production
    * variant bounds it with a TTL timeout, trading exactness past the
    * horizon — same contract as every windowed-state operator. */
  def dedupStream(docs: Dataset[Doc]): Dataset[Doc] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.content_hash)
      .flatMapGroupsWithState[Boolean, Doc](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (_: String, batch: Iterator[Doc], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            // keep the smallest doc_id in this first batch for the key —
            // deterministic across arrival interleavings within a batch
            Iterator.single(batch.minBy(_.doc_id))
          }
      }
  }

  /** Watermark-bounded streaming dedup — the production complement of
    * [[dedupStream]]: duplicates of a (user_id, event_type) key are
    * dropped only while the key's state is younger than the watermark
    * horizon, after which the state is EVICTED and the key can be
    * emitted again. Bounded state is the whole point at 100 TB/day:
    * unbounded exact dedup state grows with distinct keys forever,
    * while this holds at most (keys active within `delay`) entries —
    * the contract of `dropDuplicatesWithinWatermark`, which (unlike
    * plain streaming `dropDuplicates`) guarantees eviction. Dedup
    * within the horizon is exact: events deduplicate against state even
    * when their own event time trails the current watermark. */
  def dedupWithinWatermark(events: Dataset[Event], delay: String): Dataset[Event] =
    events
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Sliding-window counts (2h windows every 1h): each event lands in
    * exactly two windows. The overlap is computed by Spark's window
    * expansion BEFORE the partial aggregate, so the shuffle carries
    * pre-aggregated (window, type) rows — 2× the tumbling rollup's
    * groups, never 2× the events. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(
        unix_micros(col("window.start")).as("win_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Stream-stream event-time interval join: each `first`-type event
    * joined to the same user's `second`-type events within `gapHours`
    * AFTER it (funnel/attribution shape: click → purchase). In
    * streaming both sides carry watermarks and the join condition
    * time-bounds state, so Spark evicts buffered rows once the watermark
    * passes ts+gap — bounded state on an unbounded stream. */
  def followWithin(events: DataFrame, first: String, second: String,
                   gapHours: Int = 1): DataFrame = {
    val a = events.filter(col("event_type") === first)
      .select(col("user_id").as("a_user"), col("event_id").as("a_id"), col("ts").as("a_ts"))
      .withWatermark("a_ts", "2 hours")
    val b = events.filter(col("event_type") === second)
      .select(col("user_id").as("b_user"), col("event_id").as("b_id"), col("ts").as("b_ts"))
      .withWatermark("b_ts", "2 hours")
    a.join(b,
      col("a_user") === col("b_user") &&
        col("b_ts") >= col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr(s"INTERVAL $gapHours HOUR"))
      .select(col("a_user").as("user_id"), col("a_id"), col("b_id"),
        (unix_micros(col("b_ts")) - unix_micros(col("a_ts"))).as("gap_us"))
  }

  /** LEFT OUTER stream-stream interval join — [[followWithin]] plus the
    * unmatched side: every `first`-type event eventually emits, matched
    * rows as they pair, unmatched rows with NULL b_id/gap once the
    * watermark passes their join horizon (ts + gap + delay) and Spark
    * can PROVE no future match exists. That deferred-null emission is
    * the semantics batch left joins get for free and streams must buy
    * with the watermark — the funnel-with-dropouts shape (clicks that
    * never purchased), with the same bounded state as the inner form. */
  def followWithinOuter(events: DataFrame, first: String, second: String,
                        gapHours: Int = 1): DataFrame = {
    val a = events.filter(col("event_type") === first)
      .select(col("user_id").as("a_user"), col("event_id").as("a_id"), col("ts").as("a_ts"))
      .withWatermark("a_ts", "2 hours")
    val b = events.filter(col("event_type") === second)
      .select(col("user_id").as("b_user"), col("event_id").as("b_id"), col("ts").as("b_ts"))
      .withWatermark("b_ts", "2 hours")
    a.join(b,
      col("a_user") === col("b_user") &&
        col("b_ts") >= col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr(s"INTERVAL $gapHours HOUR"),
      "leftOuter")
      .select(col("a_user").as("user_id"), col("a_id"), col("b_id"),
        (unix_micros(col("b_ts")) - unix_micros(col("a_ts"))).as("gap_us"))
  }

  /** Stream-static enrichment join: the unbounded stream joined to a
    * static dimension (type → weight). The static side broadcasts and is
    * re-read per micro-batch; the join keeps NO streaming state — each
    * stream row enriches and leaves. The standard dimension-lookup shape
    * for a 100 TB/day stream with slowly-changing reference data. */
  def enrichTypes(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("event_type"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        (col("value") * col("weight")).as("weighted_value"))

  /** Idempotent parquet sink via foreachBatch: each micro-batch
    * OVERWRITES its own `batch_id=N` partition directory, so replaying
    * a batch after a failure/restart rewrites the same data instead of
    * appending duplicates — exactly-once OUTPUT from Spark's
    * at-least-once batch replay, the standard recipe for sinks without
    * transactional append. Readers take `spark.read.parquet(path)` and
    * see each batch once, whatever the retry history.
    *
    * Scale: the partition column doubles as the retention/compaction
    * unit; the write itself is the ordinary distributed parquet path
    * (splittable, columnar, no driver funnel). */
  def sinkIdempotent(events: org.apache.spark.sql.Dataset[Event], path: String,
                     checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Event], id: Long) =>
        batch.write.mode("overwrite").parquet(s"$path/batch_id=$id")
      }
      .start()

  /** Batch registry entry for [[slidingCounts]]: the oracle replays the
    * two-windows-per-event expansion with exact integer-microsecond
    * window arithmetic. */
  val q92SlidingWindow: Q = Q.sql(
    "q92_sliding_window",
    """WITH e AS (
      |  SELECT event_type, value,
      |    epoch_us(ts) // 3600000000 AS k
      |  FROM events),
      |w AS (SELECT event_type, value, unnest([k-1, k]) AS s FROM e)
      |SELECT s * 3600000000 AS win_start, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM w
      |GROUP BY s, event_type
      |ORDER BY win_start, event_type""".stripMargin
  ) { (s, dir) =>
    slidingCounts(Tables.events(s, dir))
      .orderBy(col("win_start"), col("event_type"))
  }

  /** Batch registry entry for [[followWithin]] (click → purchase within
    * 1h) — the same plan the streaming join runs, oracle-checked. */
  val q93FollowWithin: Q = Q.sql(
    "q93_follow_within",
    """SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
      |  epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id
      | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
      |WHERE a.event_type = 'click' AND b.event_type = 'purchase'
      |ORDER BY a_id, b_id""".stripMargin
  ) { (s, dir) =>
    followWithin(Tables.events(s, dir), "click", "purchase")
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Batch registry entry for the session-window operator — oracle-able
    * because session windows are gaps-and-islands in SQL: a session
    * breaks where the inter-event gap ≥ 1 day; session_end is
    * last_event + gap. All comparisons in exact integer microseconds. */
  val q57SessionWindow: Q = Q.sql(
    "q57_session_window",
    """WITH m AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN LAG(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= 86400000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |, s AS (
      |  SELECT user_id, ts, value,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM m)
      |SELECT user_id,
      |  MIN(epoch_us(ts)) AS session_start,
      |  MAX(epoch_us(ts)) + 86400000000 AS session_end,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM s
      |GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin
  ) { (s, dir) =>
    userSessions(Tables.events(s, dir))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** Batch registry entry for [[followWithinOuter]] — the
    * funnel-with-dropouts report: every click, paired if a purchase
    * followed within 1h, NULL-joined if not. The oracle checks both the
    * matched pairs AND the dropout rows, the semantics the streaming
    * spec proves emit after watermark passage. */
  val q146FunnelDropouts: Q = Q.sql(
    "q146_funnel_dropouts",
    """SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
      |  epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
      |FROM (SELECT * FROM events WHERE event_type = 'click') a
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
      |  ON a.user_id = b.user_id
      | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
      |ORDER BY a_id, b_id NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    followWithinOuter(Tables.events(s, dir), "click", "purchase")
      .orderBy(col("a_id"), col("b_id").asc_nulls_first)
  }

  /** Hourly approximate distinct users — the HLL sketch INSIDE a
    * streaming aggregation: per tumbling hour, the
    * [[graft.functions.HllDistinct]] estimate of distinct user_ids.
    * The sketch's register-max merge is exactly what incremental
    * micro-batch aggregation needs (state = one 4 KB sketch per open
    * window, merged as batches arrive — never a distinct-user set), so
    * streaming-vs-batch equality is structural, not approximate: the
    * same input set always produces the same sketch. Works identically
    * as a batch plan (the registry twin below). */
  def hourlyDistinctUsers(events: DataFrame): DataFrame =
    events
      .filter(col("user_id").isNotNull)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(graft.functions.HllDistinct.udaf(
        call_function("graft_md5long64", col("user_id").cast("string"))).as("est_users"))
      .select(unix_micros(col("window.start")).as("hour_start"), col("est_users"))

  /** Batch registry twin of [[hourlyDistinctUsers]] — oracle-paired
    * since r13 on the estimate's envelope (the q63/q182 discipline):
    * the gate joins the streaming plan's per-hour sketch estimate to
    * the exact per-hour distinct and publishes (hour_start, exact_users,
    * approx_ok) where approx_ok asserts |est − exact|·10 ≤ exact + 10.
    * The +10 absolute floor covers tiny hours: at single-digit
    * cardinalities the linear-counting estimate is exact-in-expectation
    * but integer-rounded, so a pure relative envelope would flip on an
    * off-by-one at exact < 10 while a drifting sketch still can't hide
    * (10% + 1 user of slack). Deterministic — the sketch is a pure
    * function of each hour's user set. The oracle computes the exact
    * hourly distinct and emits literal TRUE; StreamingSpec keeps the
    * micro-batched == batch equality and the numeric accuracy pin. */
  val q188StreamDistinct: Q = Q.sql(
    "q188_stream_distinct",
    """SELECT epoch_us(date_trunc('hour', ts)) AS hour_start,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
      |  TRUE AS approx_ok
      |FROM events WHERE user_id IS NOT NULL
      |GROUP BY 1 ORDER BY hour_start""".stripMargin
  ) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val exact = ev.filter(col("user_id").isNotNull)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
      .select(unix_micros(col("window.start")).as("hour_start"), col("exact_users"))
    hourlyDistinctUsers(ev).join(exact, Seq("hour_start"))
      .select(col("hour_start"), col("exact_users"),
        (abs(col("est_users") - col("exact_users")) * lit(10L)
          <= col("exact_users") + lit(10L)).as("approx_ok"))
      .orderBy(col("hour_start"))
  }

  final case class ChatTurn(conv_id: Long, rn: Long, role: String, content: String)
  /** Internal running state for [[chatShapeStream]] (public only
    * because the state encoder's generated code instantiates it). */
  final case class ChatShapeState(
      nTurns: Long, nUser: Long, nAssistant: Long, firstRole: String,
      lastRole: String, nBreaks: Long, nEmpty: Long)
  final case class ChatShape(conv_id: Long, n_turns: Long, n_user: Long,
                             n_assistant: Long, first_role: String, last_role: String,
                             n_breaks: Long, n_empty: Long, valid: Boolean)

  /** Streaming SFT chat-shape validation — q194's batch battery as
    * incremental keyed state: per conversation, the running turn
    * counts, boundary roles, alternation breaks and empty-content
    * count, re-emitted (update mode) as turns arrive. State is one
    * fixed-size record per OPEN conversation (the counts — never the
    * turns themselves), so a firehose of live chats validates with
    * per-conversation O(1) memory; the `valid` flag converges to the
    * batch value once the conversation stops.
    *
    * Ordering contract: turns must arrive in nondecreasing `rn` order
    * per conversation ACROSS micro-batches (within a batch they are
    * sorted here) — the same per-key order the batch window assumes. */
  def chatShapeStream(turns: Dataset[ChatTurn]): Dataset[ChatShape] = {
    import turns.sparkSession.implicits._
    turns
      .groupByKey(_.conv_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (conv: Long, batch: Iterator[ChatTurn], state: GroupState[ChatShapeState]) =>
          var st = state.getOption.getOrElse(
            ChatShapeState(0L, 0L, 0L, null, null, 0L, 0L))
          batch.toSeq.sortBy(_.rn).foreach { t =>
            val empty = t.content == null || t.content.isEmpty
            st = ChatShapeState(
              st.nTurns + 1,
              st.nUser + (if (t.role == "user") 1L else 0L),
              st.nAssistant + (if (t.role == "assistant") 1L else 0L),
              if (st.nTurns == 0L) t.role else st.firstRole,
              t.role,
              st.nBreaks + (if (st.nTurns > 0L && st.lastRole == t.role) 1L else 0L),
              st.nEmpty + (if (empty) 1L else 0L))
          }
          state.update(st)
          ChatShape(conv, st.nTurns, st.nUser, st.nAssistant, st.firstRole,
            st.lastRole, st.nBreaks, st.nEmpty,
            st.firstRole == "user" && st.lastRole == "assistant" &&
              st.nBreaks == 0L && st.nEmpty == 0L)
      }
  }

  /** Per-hour Misra-Gries candidate sketch over user ids — the
    * STREAMING pass of windowed heavy hitters: state per open window is
    * O(width) counters however many distinct users the hour holds
    * (an exact per-(window, user) streaming count would carry the full
    * per-hour user domain as state). Candidate weights are partition-
    * dependent; only the candidate SET is contracted (every user with
    * true in-window frequency > N/(width+1) survives — MisraGries
    * scaladoc), which is why [[hourlyTopUsers]] recounts. */
  def hourlyUserSketch(events: DataFrame, width: Int): DataFrame =
    events
      .filter(col("user_id").isNotNull)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(graft.functions.MisraGries.udaf(width)(col("user_id").cast("string"))
        .as("cand"))
      .select(unix_micros(col("window.start")).as("hour_start"),
        map_keys(col("cand")).as("cand_users"))

  /** Windowed heavy hitters, two-pass and DETERMINISTIC: per hour, the
    * users with frequency strictly above N_hour/(width+1) and their
    * EXACT counts. Pass 1 is [[hourlyUserSketch]]; pass 2 recounts the
    * candidates exactly and keeps those above the threshold — the MG
    * set guarantee makes the final output exactly the true
    * above-threshold set for ANY partitioning/merge order, so the
    * result is oracle-able even though intermediate sketch weights are
    * not. The threshold compare is integer cross-multiplication
    * (n·(width+1) > N — no division anywhere).
    *
    * Scale: the streaming pass bounds state at O(width)/window; the
    * recount is a (window, user) aggregate semi-joined to ≤ width
    * candidates per window (broadcast), so the heavy recount grain is
    * |windows|·width, not |windows|·|users|. In production the sketch
    * runs in the streaming job and the recount in the batch refresh —
    * the q193 sketch-state division of labor. */
  def hourlyTopUsers(events: DataFrame, width: Int = 8): DataFrame = {
    require(width >= 1, s"width must be >= 1, got $width")
    val e = events.filter(col("user_id").isNotNull)
    val cands = hourlyUserSketch(e, width)
      .select(col("hour_start"), explode(col("cand_users")).as("uid_str"))
    val exact = e
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("hour_start"), col("user_id"), col("n"))
    // totals re-aggregate the (hour, user) counts — already shuffled and
    // orders of magnitude smaller than the event scan they'd otherwise
    // repeat (and ReuseExchange can serve both from one exchange)
    val totals = exact
      .groupBy(col("hour_start"))
      .agg(sum(col("n")).as("n_hour"))
    exact
      .join(broadcast(cands),
        exact("hour_start") === cands("hour_start") &&
          col("user_id").cast("string") === col("uid_str"), "left_semi")
      .join(broadcast(totals), "hour_start")
      .filter(col("n") * (width + 1) > col("n_hour"))
      .select(col("hour_start"), col("user_id"), col("n"), col("n_hour"))
  }

  /** q198: hourly heavy-hitter users (width 8) with exact counts. The
    * oracle needs no sketch — the MG set contract reduces the output to
    * "exact counts above the cross-multiplied threshold". */
  val q198StreamTopk: Q = Q.sql(
    "q198_stream_topk",
    """WITH e AS (
      |  SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS hour_start, user_id
      |  FROM events WHERE user_id IS NOT NULL),
      |exact AS (
      |  SELECT hour_start, user_id, COUNT(*) AS n
      |  FROM e GROUP BY 1, 2),
      |tot AS (
      |  SELECT hour_start, COUNT(*) AS n_hour
      |  FROM e GROUP BY 1)
      |SELECT exact.hour_start, exact.user_id, exact.n, tot.n_hour
      |FROM exact JOIN tot USING (hour_start)
      |WHERE exact.n * 9 > tot.n_hour
      |ORDER BY hour_start, user_id""".stripMargin
  ) { (s, dir) =>
    hourlyTopUsers(Tables.events(s, dir), 8)
      .orderBy(col("hour_start"), col("user_id"))
  }

  /** Streaming ingest near-dup gate — q83's incremental matcher as a
    * stream-static join, the continuous-ingestion complement of the
    * daily-batch path: each arriving (doc_id, text) micro-batch is
    * MinHash-signed ROW-LOCALLY (no pre-join aggregation, so append
    * mode needs no watermark), its 4 LSH band keys joined against the
    * STANDING corpus's band rows, and every candidate verified with
    * exact Jaccard — emitting (incoming_id, existing_id, jaccard)
    * duplicate alerts as they arrive.
    *
    * Exactly-once per pair WITHOUT streaming state: a pair colliding in
    * k bands would surface k times from the band join, and the batch
    * path's `distinct()` is unavailable pre-watermark — instead both
    * sides carry their full 4-slot band-key array, and the join keeps
    * only the row whose band is the FIRST slot where the two arrays
    * agree. Row-local arithmetic replaces state: stateless, bounded
    * memory, no late-data semantics to reason about.
    *
    * Scale: the standing side is re-evaluated per micro-batch (Spark
    * stream-static semantics) — this convenience form re-shingles and
    * re-bands the raw corpus every batch, which is fine for a small or
    * slowly-read static side but wrong at 100 TB. There, materialize
    * the band index ONCE with [[standingBandIndex]] (write it out
    * bucketed on (b, bkey) so each micro-batch's join probes only
    * matching buckets — it pairs naturally with q83's incremental
    * manifest and q205's delta feed for keeping it current) and run
    * the gate through [[nearDupStreamIndexed]], which accepts the
    * prebuilt frame and touches no text. Re-deliveries of the same
    * incoming doc across micro-batches are the source's concern —
    * compose with [[dedupWithinWatermark]] upstream for at-least-once
    * sources.
    *
    * `incoming` is a streaming (or batch — same plan) (doc_id, text)
    * frame; `standing` a static (doc_id, text) corpus. */
  def nearDupStream(incoming: DataFrame, standing: DataFrame,
                    minJaccard: Double = 0.8): DataFrame =
    nearDupStreamIndexed(incoming, standingBandIndex(standing), minJaccard)

  /** Segment-dedup INGEST GATE — the streaming face of the q221 family:
    * flag every `width`-word segment of an incoming doc whose content
    * already exists in the standing corpus, as (doc_id, k, h) alert
    * rows (k the segment ordinal). Stateless and append-mode-safe: the
    * stream side is one row-local segment projection
    * ([[graft.ops.Dedup.segRowsOf]]), the probe a stream-static
    * left-semi join against the STORED counted index
    * ([[graft.ops.Dedup.segmentIndex]] → (h, n), persisted once and
    * kept current by `refreshSegmentIndex` — which, uniquely among the
    * stored artifacts, handles REMOVALS exactly, since counts decrement
    * where registers and band rows cannot). Within-batch duplicates
    * (two new docs sharing a fresh segment) are invisible to the gate
    * by design — they are the BATCH keeper election's job (q221) on the
    * next corpus refresh; the gate's contract is "not already standing".
    *
    * Scale: alert volume ∝ duplicated segments only; the index is
    * vocabulary-sized at hash grain, so the per-trigger join probes
    * (and with a bucketed-on-h index, only matching buckets). */
  def segmentDedupStream(incoming: DataFrame, segmentIndex: DataFrame,
                         width: Int = 8): DataFrame =
    graft.ops.Dedup.segRowsOf(incoming, width)
      .join(segmentIndex.select(col("h")), Seq("h"), "left_semi")
      .select(col("doc_id"), col("k"), col("h"))

  final case class Vec(vec_id: Long, v: Seq[Double])

  /** IVF-PQ INGEST path — the streaming face of the q231 index: assign
    * each incoming vector to its coarse list and PQ-encode its residual
    * against the FROZEN quantizers, emitting the (vec_id, list_id,
    * codes) rows the stored index appends. Both quantizers enter as
    * stored artifacts (`centroids` = (list_id, centroid), `cbRow` = the
    * 1-row nested codebook) and broadcast; the gate is stateless
    * map-only work — append mode, no watermark, no state store,
    * per-trigger cost ∝ batch size. Identical rows to the batch encode
    * by construction (StreamingSpec asserts it): production appends
    * micro-batch output straight into the q231 posting-list table. */
  def ivfPqEncodeStream(incoming: DataFrame, centroids: DataFrame,
                        cbRow: DataFrame): DataFrame =
    graft.ops.Quantize.ivfPqEncode(
      graft.ops.Quantize.ivfResiduals(incoming, centroids), cbRow)

  /** IVF-PQ SEMANTIC ALERT gate — flag incoming vectors whose
    * asymmetric distance to ANY standing vector in their own coarse
    * list is ≤ `maxAdc` (the streaming dual of SemDeDup's batch sweep,
    * at 10 bytes/standing-vector instead of raw embeddings): the
    * incoming residual builds its m × k distance table row-locally;
    * the probe is a stream-static equi-join on list_id against the
    * STORED (vec_id, list_id, codes) table, then the 8-term ADC sum
    * and the threshold. nProbe is pinned to 1 (the vector's own list)
    * — an ingest gate trades recall at list boundaries for a single
    * bounded probe, exactly like the segment gate trades within-batch
    * visibility. No ranking window (append-mode-safe); emits
    * (vec_id, neighbor_id, adc) per hit, volume ∝ semantic collisions. */
  def ivfPqStreamAlerts(incoming: DataFrame, centroids: DataFrame,
                        cbRow: DataFrame, standingCodes: DataFrame,
                        maxAdc: Double): DataFrame = {
    import graft.ops.Quantize
    val dt = transform(col("cb"), (cbS, i) =>
      transform(cbS, c => Quantize.l2x(
        slice(col("v"), i * Quantize.PqSubDim + 1, lit(Quantize.PqSubDim)), c)))
    val probes = Quantize.ivfResiduals(incoming, centroids)
      .crossJoin(broadcast(cbRow))
      .select(col("vec_id"), col("list_id"), dt.as("dt"))
    // No broadcast hint on the standing side: it is the BIG side at
    // scale (persist it bucketed on list_id so per-trigger probes read
    // matching buckets only); the bounded per-trigger probe side is
    // what the planner should build against.
    probes
      .join(standingCodes.select(col("vec_id").as("neighbor_id"),
        col("list_id"), col("codes")), Seq("list_id"))
      .filter(col("neighbor_id") =!= col("vec_id"))
      .select(col("vec_id"), col("neighbor_id"),
        round(Quantize.adcSum(col("dt"), col("codes")), 9).as("adc"))
      .filter(col("adc") <= maxAdc)
  }

  /** The materialized standing-corpus band index for
    * [[nearDupStreamIndexed]]: one row per (doc, band) — (doc_id, hs,
    * bkeys, b, bkey), the exact frame the gate's join probes. Compute
    * once per corpus refresh, persist (bucketed on (b, bkey)), and
    * reuse across every micro-batch instead of re-shingling 100 TB of
    * standing text per trigger. */
  def standingBandIndex(standing: DataFrame): DataFrame =
    bandRows(graft.ops.Dedup.hashedShinglesOf(standing))

  /** INCREMENTAL band-index maintenance — the q205 pairing the
    * [[nearDupStream]] scaladoc promises: instead of re-deriving the
    * full [[standingBandIndex]] on every corpus refresh (re-shingling
    * 100 TB of standing text to pick up a per-mille delta), apply a
    * snapshot delta ([[graft.ops.Merge.snapshotDeltaOf]]'s (key,
    * status, text, …) output shape) to the stored index: band rows of
    * `removed`/`changed` docs are anti-joined out, band rows for
    * `added`/`changed` docs are derived from their NEW text only, and
    * `unchanged` rows pass through untouched. Work is ∝ |delta|
    * (shingling the added/changed text + one anti-join whose build
    * side is the delta's id set — AQE broadcasts it when small), never
    * ∝ |corpus|. StreamingSpec proves refreshed == rebuilt-from-
    * scratch row-for-row, and that the gate alerts identically through
    * either index. `delta` must carry (`doc_id`, `status`, `text`). */
  def refreshBandIndex(index: DataFrame, delta: DataFrame): DataFrame = {
    val drop = delta.filter(col("status").isin("removed", "changed"))
      .select(col("doc_id"))
    val fresh = delta.filter(col("status").isin("added", "changed"))
      .select(col("doc_id"), col("text"))
    index.join(drop, Seq("doc_id"), "left_anti")
      .unionByName(standingBandIndex(fresh))
  }

  /** Persist the standing-corpus near-dup index — the writeAnnIndex /
    * writeBm25Index discipline for the LSH family, NORMALIZED so the
    * heavy per-doc shingle arrays are stored once, not once per band:
    * docs/ ((doc_id, hs, bkeys) — the verify-side state, partitioned by
    * doc_id so candidate fetches hash-prune) and bands/ ((doc_id, b,
    * bkey) — the probe rows, partitioned by band key so a micro-batch's
    * probe join reads matching buckets only; at real scale both become
    * bucketed tables). Raw TEXT is never stored — shingle hashes and
    * band keys are the dedup-sufficient statistic. The corpus is
    * shingled ONCE: bands/ derives from docs/ as persisted (one
    * posexplode of stored arrays), so the pieces can never disagree. */
  def writeBandIndex(standing: DataFrame, path: String): Unit = {
    // no repartition(doc_id) before the docs/ write (r15, guide §2.4):
    // hashedShinglesOf ends in a groupBy(doc_id) aggregation, so the
    // frame is ALREADY hash-partitioned by doc_id — the explicit
    // repartition re-shuffled the heaviest payload in the index (the
    // per-doc shingle arrays) a second time for an identical layout.
    docBands(graft.ops.Dedup.hashedShinglesOf(standing))
      .write.mode("overwrite").parquet(s"$path/docs")
    standing.sparkSession.read.parquet(s"$path/docs")
      .select(col("doc_id"), posexplode(col("bkeys")).as(Seq("b", "bkey")))
      .repartition(col("b"), col("bkey"))
      .write.mode("overwrite").parquet(s"$path/bands")
  }

  /** Re-open a [[writeBandIndex]] artifact: (bands, docs). */
  def readBandIndex(s: SparkSession, path: String): (DataFrame, DataFrame) =
    (s.read.parquet(s"$path/bands"), s.read.parquet(s"$path/docs"))

  /** [[nearDupStream]] served from a STORED [[writeBandIndex]] artifact
    * — identical alerts to the inline gate (StreamingSpec proves the
    * row sets equal), with the candidate-bounded join order the
    * normalized layout buys: the incoming batch's band rows probe
    * bands/ first (rows ∝ LSH collisions), and only the CANDIDATES
    * fetch their heavy (hs, bkeys) state from docs/ — at 100 TB the
    * shingle arrays of non-colliding docs are never read, which the
    * denormalized in-memory frame cannot promise. Both joins are
    * stream-static equi-joins, append-mode-safe, no state store. */
  def nearDupServeStored(incoming: DataFrame, index: (DataFrame, DataFrame),
                         minJaccard: Double = 0.8): DataFrame = {
    val (bands, docs) = index
    val n = bandRows(graft.ops.Dedup.hashedShinglesRowLocal(incoming))
      .select(col("doc_id").as("incoming_id"), col("hs").as("nhs"),
        col("bkeys").as("nbkeys"), col("b"), col("bkey"))
    val cand = n.join(bands
        .select(col("doc_id").as("existing_id"), col("b"), col("bkey")),
        Seq("b", "bkey"))
      .filter(col("incoming_id") =!= col("existing_id"))
    val withState = cand.join(docs
        .select(col("doc_id").as("existing_id"), col("hs").as("ehs"),
          col("bkeys").as("ebkeys")), Seq("existing_id"))
    // same exactly-once-per-pair rule as the inline gate: keep only the
    // row whose band is the FIRST slot where the two key arrays agree
    val firstMatch = array_position(
      zip_with(col("nbkeys"), col("ebkeys"), (x, y) => x === y), true)
    val inter = size(array_intersect(col("nhs"), col("ehs")))
    val jac = inter.cast("double") /
      (size(col("nhs")) + size(col("ehs")) - inter)
    withState
      .filter(col("b") + 1 === firstMatch)
      .select(col("incoming_id"), col("existing_id"), jac.as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Refresh a STORED [[writeBandIndex]] artifact from a snapshot delta
    * ([[refreshBandIndex]]'s contract: (doc_id, status, text)) — work ∝
    * |delta|: removed/changed ids anti-join out of both pieces, only
    * the added/changed TEXT is shingled, and the fresh rows append.
    * Writes a NEW artifact generation at `outPath` (never in-place).
    * StreamingSpec proves refreshed == rebuilt piece-for-piece. */
  def refreshStoredBandIndex(s: SparkSession, path: String,
                             delta: DataFrame, outPath: String): Unit = {
    require(outPath != path,
      "refreshStoredBandIndex writes a new generation: outPath must differ from path")
    val (bands, docs) = readBandIndex(s, path)
    val drop = delta.filter(col("status").isin("removed", "changed"))
      .select(col("doc_id"))
    val freshDocs = docBands(graft.ops.Dedup.hashedShinglesOf(
      delta.filter(col("status").isin("added", "changed"))
        .select(col("doc_id"), col("text"))))
    docs.join(drop, Seq("doc_id"), "left_anti").unionByName(freshDocs)
      .repartition(col("doc_id"))
      .write.mode("overwrite").parquet(s"$outPath/docs")
    bands.join(drop, Seq("doc_id"), "left_anti")
      .unionByName(freshDocs
        .select(col("doc_id"), posexplode(col("bkeys")).as(Seq("b", "bkey"))))
      .repartition(col("b"), col("bkey"))
      .write.mode("overwrite").parquet(s"$outPath/bands")
  }

  /** q207: [[refreshBandIndex]] oracle-gated — the ENGINE builds the
    * gen-2 index INCREMENTALLY (gen-1 index + a [[graft.ops.Merge
    * .snapshotDeltaOf]] change feed), while the ORACLE replays a full
    * gen-2 rebuild from scratch in SQL (shingles → minhash sigs → band
    * keys, the q26-proven pipeline). The two only hash-match if the
    * incremental path is exact: a stale band row surviving the
    * anti-join, a removed doc leaking through, or an added/changed doc
    * banded from the wrong text generation all break the compare.
    * Generations are derived deterministically from `documents`: gen 1
    * lacks every 7th doc (→ `added`), gen 2 drops every 6th
    * (→ `removed`) and appends a clause to every 5th's text
    * (→ `changed`); everything else is `unchanged` and must pass
    * through untouched. One (doc_id, band) row each, with the band key
    * pinning all four minhash slots and n_shingles pinning the
    * re-shingle. */
  val q207BandIndexRefresh: Q = Q.sql(
    "q207_band_index_refresh",
    s"""WITH g2 AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 5 = 0 THEN text || ' freshly appended refresh clause'
       |         ELSE text END AS text
       |  FROM documents WHERE doc_id % 6 <> 0),
       |${graft.ops.Dedup.oracleDocs.replace("FROM documents", "FROM g2")},
       |${graft.ops.Dedup.oracleHashed},
       |${graft.ops.Dedup.oracleSigsBandsPairs}
       |SELECT b.doc_id, b.b, b.bkey, len(h.hs) AS n_shingles
       |FROM bands b JOIN hashed h ON h.doc_id = b.doc_id
       |ORDER BY b.doc_id, b.b""".stripMargin
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val g1 = docs.filter(col("doc_id") % 7 =!= 0)
    val g2 = docs.filter(col("doc_id") % 6 =!= 0)
      .withColumn("text", when(col("doc_id") % 5 === 0,
        concat(col("text"), lit(" freshly appended refresh clause")))
        .otherwise(col("text")))
    val delta = graft.ops.Merge.snapshotDeltaOf(
        g1.withColumn("fp", md5(col("text"))),
        g2.withColumn("fp", md5(col("text"))), "doc_id", "fp")
      .select(col("doc_id"), col("status"), col("text"))
    refreshBandIndex(standingBandIndex(g1), delta)
      .select(col("doc_id"), col("b"), col("bkey"),
        size(col("hs")).as("n_shingles"))
      .orderBy(col("doc_id"), col("b"))
  }

  /** q239: the STORED band-index serve path oracle-gated end to end —
    * the engine WRITES the [[writeBandIndex]] artifact (normalized
    * docs/ + bands/ parquet on disk), re-opens it cold, and serves the
    * near-dup ingest gate from the stored pieces against an incoming
    * batch of re-keyed standing docs (doc_id + 1e6 — identical text, so
    * the alert set is non-trivially large and every jaccard double gets
    * hash-compared). The ORACLE replays the WHOLE pipeline in SQL over
    * the union relation — shingles → minhash sigs → band keys → cross-
    * side band collisions → exact jaccard ≥ 0.8 — so a match proves the
    * round-trip (shingle once, persist normalized, probe bands/, fetch
    * candidate state from docs/) loses nothing to parquet, partitioning
    * or the candidates-only join order. The engine's first-agreeing-
    * band filter emits exactly one row per colliding pair; the oracle's
    * DISTINCT is the same set. Fixture path FIXED
    * (target/fixtures/q239_band_idx) — the q58/q59 single-Verify
    * caveat. */
  val q239StoredNearDupServe: Q = Q.sql(
    "q239_stored_neardup_serve",
    s"""WITH rel AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 13 = 0),
       |${graft.ops.Dedup.oracleDocsOver("rel")},
       |${graft.ops.Dedup.oracleHashed},
       |${graft.ops.Dedup.oracleSigsBandsPairs},
       |xpairs AS (
       |  SELECT DISTINCT a.doc_id AS incoming_id, c.doc_id AS existing_id
       |  FROM bands a JOIN bands c ON a.b = c.b AND a.bkey = c.bkey
       |  WHERE a.doc_id >= 1000000 AND c.doc_id < 1000000)
       |SELECT p.incoming_id, p.existing_id,
       |  CAST(len(list_intersect(di.hs, de.hs)) AS DOUBLE)
       |    / (len(di.hs) + len(de.hs) - len(list_intersect(di.hs, de.hs))) AS jaccard
       |FROM xpairs p
       |JOIN hashed di ON di.doc_id = p.incoming_id
       |JOIN hashed de ON de.doc_id = p.existing_id
       |WHERE CAST(len(list_intersect(di.hs, de.hs)) AS DOUBLE)
       |    / (len(di.hs) + len(de.hs) - len(list_intersect(di.hs, de.hs))) >= 0.8
       |ORDER BY incoming_id, existing_id""".stripMargin
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val incoming = docs.filter(col("doc_id") % 13 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val path = "target/fixtures/q239_band_idx"
    writeBandIndex(docs, path)
    nearDupServeStored(incoming, readBandIndex(s, path), 0.8)
      .orderBy(col("incoming_id"), col("existing_id"))
  }

  /** [[nearDupStream]] over a PREBUILT standing band index (the
    * [[standingBandIndex]] schema: doc_id, hs, bkeys, b, bkey) — the
    * 100 TB form: the static side is a stored table scan, bucketed on
    * the join key, re-read but never re-derived per micro-batch. */
  def nearDupStreamIndexed(incoming: DataFrame, standingIndex: DataFrame,
                           minJaccard: Double = 0.8): DataFrame = {
    val e = standingIndex
    val n = bandRows(graft.ops.Dedup.hashedShinglesRowLocal(incoming))
    val joined = n.as("n").join(e.as("e"),
      col("n.b") === col("e.b") && col("n.bkey") === col("e.bkey") &&
        col("n.doc_id") =!= col("e.doc_id"))
    // 1-based slot of the first agreeing band vs the join row's 0-based b
    val firstMatch = array_position(
      zip_with(col("n.bkeys"), col("e.bkeys"), (x, y) => x === y), true)
    val inter = size(array_intersect(col("n.hs"), col("e.hs")))
    val jac = inter.cast("double") /
      (size(col("n.hs")) + size(col("e.hs")) - inter)
    joined
      .filter(col("n.b") + 1 === firstMatch)
      .select(col("n.doc_id").as("incoming_id"),
        col("e.doc_id").as("existing_id"), jac.as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Streaming ingest DECONTAMINATION gate — q213's Bloom-pre-filtered
    * membership probe as a stream-static flow: each arriving (doc_id,
    * text) micro-batch is shingled ROW-LOCALLY (append-mode-safe, no
    * watermark), pre-filtered against the broadcast Bloom bitmap (the
    * same k map-side probe joins as the batch path — streaming-legal:
    * broadcast joins only), and the survivors exact-verified with a
    * stream-static left-semi join against the stored eval shingle
    * table. Emits one ALERT ROW per verified contaminated shingle:
    * (doc_id, n_shingles, h) — shingle grain, STATELESS. Per-doc
    * fraction thresholding is an aggregation (needs a watermark in
    * append mode), deliberately left to the consumer: roll up
    * `sum(1)/first(n_shingles)` per doc downstream, or compare against
    * the batch report offline (StreamingSpec proves the alert multiset
    * equals q101's per-doc n_hit counts exactly).
    *
    * The stored-state pair is [[graft.Graft.bloomEvalIndex]] (the
    * bitmap) + the distinct eval shingle table — both persisted once
    * per eval-suite release, refreshed via
    * [[graft.Graft.refreshBloomIndex]]; a STALE superset bitmap only
    * costs false-positive probes the verify join removes (BloomSpec).
    * `bloomBits`/`bloomHashes` must match the index build — the index
    * carries them as format columns and the probe raises on mismatch. */
  def decontamStreamIndexed(incoming: DataFrame, bloomIndex: DataFrame,
                            evalShingles: DataFrame,
                            bloomBits: Long = graft.ops.Decontam.DefaultBloomBits,
                            bloomHashes: Int = graft.ops.Decontam.DefaultBloomHashes): DataFrame =
    graft.ops.Decontam.bloomFilterCandidates(
        graft.ops.Dedup.hashedShinglesRowLocal(incoming)
          .select(col("doc_id"), size(col("hs")).cast("long").as("n_shingles"),
            explode(col("hs")).as("h")),
        bloomIndex, bloomBits, bloomHashes)
      .join(evalShingles.select(col("h")), Seq("h"), "left_semi")
      .select(col("doc_id"), col("n_shingles"), col("h"))

  /** Convenience form of [[decontamStreamIndexed]] deriving both stored
    * frames from a static (doc_id, text) eval set — fine for tests and
    * small suites; at scale persist the two index frames and pass them
    * to the indexed form. */
  def decontamStream(incoming: DataFrame, evalSet: DataFrame,
                     bloomBits: Long = graft.ops.Decontam.DefaultBloomBits,
                     bloomHashes: Int = graft.ops.Decontam.DefaultBloomHashes): DataFrame =
    decontamStreamIndexed(incoming,
      graft.ops.Decontam.bloomEvalIndex(evalSet, bloomBits, bloomHashes),
      graft.ops.Dedup.hashedShinglesOf(evalSet)
        .select(explode(col("hs")).as("h")).distinct(),
      bloomBits, bloomHashes)

  /** (doc_id, hs) → one row per LSH band: (doc_id, hs, bkeys, b, bkey),
    * the full 4-slot key array carried for the first-match filter.
    * Same signatures/banding as the batch q26/q83 path. */
  /** Doc-grain signature frame: (doc_id, hs, bkeys) — one row per doc,
    * the 4 LSH band keys as an array. The band-EXPLODED probe rows are
    * [[bandRows]]; the stored index keeps THIS grain for the verify
    * side (hs arrays once per doc, not once per band). */
  private def docBands(hs: DataFrame): DataFrame = {
    import graft.ops.Dedup.{MinhashAB, P}
    val aLit = array(MinhashAB.map(ab => lit(ab._1)): _*)
    val bLit = array(MinhashAB.map(ab => lit(ab._2)): _*)
    hs
      .select(col("doc_id"), col("hs"),
        call_function("graft_minhash", col("hs"), aLit, bLit, lit(P)).as("sig"))
      .select(col("doc_id"), col("hs"),
        transform(sequence(lit(0), lit(3)), b =>
          concat_ws(",", slice(col("sig"), b * 4 + 1, lit(4))
            .cast("array<string>"))).as("bkeys"))
  }

  private def bandRows(hs: DataFrame): DataFrame =
    docBands(hs)
      .select(col("doc_id"), col("hs"), col("bkeys"),
        posexplode(col("bkeys")).as(Seq("b", "bkey")))

  val all: Seq[Q] = Seq(q57SessionWindow, q92SlidingWindow, q93FollowWithin,
    q146FunnelDropouts, q188StreamDistinct, q198StreamTopk,
    q207BandIndexRefresh, q239StoredNearDupServe)
}
