package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming faces of the event-time operators (SURVEY.md §2.C
  * streaming row — the reference is strictly batch; this is the ➕ extension
  * that makes the same queries incremental).
  *
  * Each transform takes the (streaming or batch) events DataFrame — schema
  * `(event_id long, ts timestamp, user_id long, event_type string,
  * value double)` — and returns the transformed frame; identical code runs
  * in both modes, which is how the batch EventQueries oracle-check the
  * streaming semantics. Watermarks bound state: at scale the window state
  * store holds only (watermark horizon / slide) panes per key.
  */
object StreamingOps {

  /** Tumbling 10-minute counts with a 30-minute watermark (late events
    * beyond the watermark are dropped instead of growing state forever).
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** CHAINED stateful aggregations in one streaming query (Spark 4
    * multiple-stateful-operator support, 3.4+): tumbling 10-minute counts
    * per (window, event_type), re-aggregated per window downstream — the
    * "aggregate of an aggregate" every rollup dashboard needs, expressed
    * as ONE query instead of two jobs with an intermediate topic. Append
    * mode: the first aggregate emits a (window, type) row only when the
    * watermark closes the window; the second aggregate receives those
    * finalized rows (the window struct carries event-time through) and
    * closes its own per-window groups on the same watermark. Zero-delay
    * watermark: every window strictly before max(ts) flushes; the
    * still-open trailing window correctly stays in state — the oracle
    * mirrors that with an explicit end ≤ watermark filter.
    */
  def chainedWindowAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("window"))
      .agg(count(lit(1)).as("n_types"), sum(col("cnt")).as("n_events"))
      .select(col("window.start").as("win_start"), col("n_types"),
        col("n_events"))

  /** Sliding 10/5-minute windowed sums. */
  def slidingSums(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"))
      .select(col("window.start").as("win_start"), col("cnt"), col("sum_value"))

  /** Event-time session windows (30-minute gap) per user — the incremental
    * form of EventQueries.sessionize's gaps-and-islands.
    */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("n_events"), col("sum_value"))

  /** Input record type for the stateful operators. */
  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** Running per-user totals via custom state — the
    * `mapGroupsWithState` surface (arbitrary stateful processing, the hook
    * the reference's ReduceFn could never express because it only sees one
    * key's batch at a time).
    */
  case class UserTotal(user_id: Long, n_events: Long, total_value: Double)

  def runningUserTotals(events: Dataset[Event]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserTotal, UserTotal](GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          batch.foreach { e => n += 1; tot += e.value }
          val next = UserTotal(uid, n, tot)
          state.update(next)
          next
      }
  }

  /** Running per-user totals via `transformWithState` — Spark 4's
    * arbitrary-state API (SPARK-49585; successor to *GroupsWithState):
    * named typed state handles (`ValueState`/`ListState`/`MapState`) with
    * optional TTL and timers, backed by the RocksDB state store (the only
    * provider the operator supports — the caller must set
    * `spark.sql.streaming.stateStore.providerClass` before starting the
    * query; the bridge does this with save/restore). Same semantics as
    * `runningUserTotals`, deliberately: the two APIs are oracle-checked
    * against the same batch aggregate.
    */
  class UserTotalProcessor extends org.apache.spark.sql.streaming
      .StatefulProcessor[Long, Event, UserTotal] {
    @transient private var totals:
      org.apache.spark.sql.streaming.ValueState[UserTotal] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      totals = getHandle.getValueState[UserTotal]("totals",
        org.apache.spark.sql.Encoders.product[UserTotal],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[UserTotal] = {
      val prev =
        if (totals.exists()) totals.get() else UserTotal(key, 0L, 0.0)
      var n = prev.n_events
      var tot = prev.total_value
      rows.foreach { e => n += 1; tot += e.value }
      val next = UserTotal(key, n, tot)
      totals.update(next)
      Iterator.single(next)
    }
  }

  def runningUserTotalsTws(events: Dataset[Event]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new UserTotalProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  case class TopEntry(user_id: Long, value_c: Long, event_id: Long)
  case class TopKRow(user_id: Long, rank: Int, value_c: Long, event_id: Long)

  /** Per-user running top-k via `transformWithState` with a LIST state
    * handle — the other typed-state shape (UserTotalProcessor covers
    * ValueState): state is the current top-k entries per user, merged
    * with each batch's arrivals and truncated back to k, so state size is
    * O(k) per key no matter how long the stream runs. Emits the updated
    * ranking (rank 1..k) on every batch that touches the key.
    */
  class UserTopKProcessor(k: Int) extends org.apache.spark.sql.streaming
      .StatefulProcessor[Long, TopEntry, TopKRow] {
    @transient private var top:
      org.apache.spark.sql.streaming.ListState[TopEntry] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      top = getHandle.getListState[TopEntry]("top",
        org.apache.spark.sql.Encoders.product[TopEntry],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TopEntry],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[TopKRow] = {
      val merged = (top.get().toSeq ++ rows)
        .sortBy(e => (-e.value_c, e.event_id)).take(k)
      top.put(merged.toArray)
      merged.iterator.zipWithIndex.map { case (e, i) =>
        TopKRow(key, i + 1, e.value_c, e.event_id)
      }
    }
  }

  case class TimerFire(user_id: Long, n_events: Long, timer_ms: Long)

  /** EVENT-TIME TIMER surface of `transformWithState`: every key counts
    * its rows in ValueState and registers one absolute event-time timer;
    * NOTHING is emitted from the data path — output exists only because
    * `handleExpiredTimer` fires once the watermark passes the timer, so
    * an empty result means the timer machinery (registration, watermark
    * propagation, the trailing no-data micro-batch) broke somewhere. The
    * scheduled-callback primitive under session timeouts, SLA alerts, and
    * TTL evictions.
    */
  class TimerCountProcessor(fireAtMs: Long) extends org.apache.spark.sql
      .streaming.StatefulProcessor[Long, Event, TimerFire] {
    @transient private var counts:
      org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      counts = getHandle.getValueState[Long]("counts",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[TimerFire] = {
      val prev = if (counts.exists()) counts.get() else 0L
      counts.update(prev + rows.size)
      getHandle.registerTimer(fireAtMs) // same-ts re-registration is a no-op
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[TimerFire] =
      Iterator.single(
        TimerFire(key, counts.get(), expiredTimerInfo.getExpiryTimeInMs()))
  }

  def timerCounts(events: Dataset[Event], fireAtMs: Long): Dataset[TimerFire] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .transformWithState(new TimerCountProcessor(fireAtMs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(), OutputMode.Append())
  }

  def runningTopKTws(entries: Dataset[TopEntry], k: Int = 3): Dataset[TopKRow] = {
    import entries.sparkSession.implicits._
    entries
      .groupByKey(_.user_id)
      .transformWithState(new UserTopKProcessor(k),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  /** Session-START detection via `flatMapGroupsWithState` — the 0..N
    * emission surface (mapGroupsWithState is exactly-1): emits one record
    * per event that opens a new session (first event, or gap > 30 min from
    * the previous). State carries the user's last event time across
    * batches; within a batch events are sorted by (ts, event_id) because
    * the group iterator has no order guarantee.
    */
  case class SessionStart(user_id: Long, session_start: Long)

  def sessionStarts(events: Dataset[Event]): Dataset[SessionStart] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, SessionStart](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[Long]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var last = state.getOption.getOrElse(Long.MinValue)
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionStart]
          sorted.foreach { e =>
            val sec = e.ts.getTime / 1000L // epoch seconds, truncated
            if (last == Long.MinValue || sec - last > 1800L)
              out += SessionStart(uid, sec)
            last = sec
          }
          if (last != Long.MinValue) state.update(last)
          out.iterator
      }
  }

  /** Stream-stream INTERVAL join: each signup joined to the same user's
    * purchases within the following hour. Both sides carry watermarks and
    * the join condition bounds event-time distance, so the state store
    * evicts rows once the watermark passes their join horizon — the
    * pattern that keeps stream-stream join state finite at scale (an
    * unconstrained join would buffer both streams forever). Inner joins
    * emit matches eagerly (no watermark wait), so the settled result
    * equals the batch range join.
    */
  def purchasesAfterSignup(events: DataFrame): DataFrame = {
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("event_id").as("signup_id"),
        col("ts").as("s_ts"))
      .withWatermark("s_ts", "30 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"), col("value"))
      .withWatermark("p_ts", "30 minutes")
    signups.join(purchases,
      col("s_user") === col("p_user") &&
        col("p_ts") >= col("s_ts") &&
        col("p_ts") <= col("s_ts") + expr("INTERVAL 1 HOUR"))
  }

  /** Stream-stream LEFT OUTER interval join — the semantically distinct
    * sibling of [[purchasesAfterSignup]]: signups with NO purchase in the
    * following hour must still emit (with nulls), and that emission is
    * WATERMARK-DRIVEN — an outer row is only provably unmatched once the
    * watermark passes its join horizon, so this query genuinely needs the
    * trailing watermark micro-batch that inner joins can skip. Two bounds
    * keep it oracle-equal and state-light: the left side stops at a fixed
    * cutoff 2 days before the fixture's last event (every outer row's
    * horizon closes before the final watermark — without this the last
    * ~1.5 h of signups would sit in state forever and the settled result
    * would disagree with the batch left join), and both sides restrict to
    * a deterministic third of users (`user_id % 3 = 0`, a bounded-universe
    * demo like the dedup queries — state is what this shape pays for).
    */
  def purchasesAfterSignupOuter(events: DataFrame,
      cutoff: String = "2024-01-28"): DataFrame = {
    val third = events.filter(col("user_id") % 3 === 0)
    // Caller must run with spark.sql.streaming.multipleWatermarkPolicy=max:
    // the default (min) global watermark stalls 30 min before the
    // cutoff-bounded signup stream's end, stranding the final ~1.5 h of
    // signups in state un-emitted (observed: exactly the boundary rows
    // missing vs the batch oracle). With max policy the global watermark
    // follows the purchase stream — the documented Spark answer for joined
    // streams progressing at different rates — so every signup's join
    // window provably closes. (Dropping the signup watermark instead kills
    // outer emission entirely: outer-side state needs its own event-time
    // watermark column to be eviction-eligible.)
    val signups = third.filter(col("event_type") === "signup" &&
        col("ts") < lit(cutoff).cast("timestamp"))
      .select(col("user_id").as("s_user"), col("event_id").as("signup_id"),
        col("ts").as("s_ts"))
      .withWatermark("s_ts", "30 minutes")
    val purchases = third.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"), col("value"))
      .withWatermark("p_ts", "30 minutes")
    signups.join(purchases,
      col("s_user") === col("p_user") &&
        col("p_ts") >= col("s_ts") &&
        col("p_ts") <= col("s_ts") + expr("INTERVAL 1 HOUR"),
      "left_outer")
  }

  /** FULL OUTER stream-stream interval join — completes the interval-join
    * family (inner emits eagerly, left adds signup-side eviction; full
    * adds PURCHASE-side eviction too): unmatched signups AND unmatched
    * purchases each emit when the watermark closes their window. The
    * join condition bounds both sides' state symmetrically (p_ts within
    * [s_ts, s_ts+1h] ⟺ s_ts within [p_ts−1h, p_ts]), which is what makes
    * both eviction directions well-defined. Same max-watermark-policy
    * requirement as the left-outer form — and BOTH sides are
    * cutoff-bounded: an outer side only emits its unmatched rows when the
    * watermark closes their window, so a side extending to the end of the
    * bounded stream would strand its tail (final horizon+delay) in state
    * un-emitted, exactly the boundary-row loss the left form's
    * signup-side cutoff already prevents (observed: the first full-outer
    * run dropped precisely the tail purchases vs the batch oracle).
    */
  def purchasesAfterSignupFull(events: DataFrame,
      cutoff: String = "2024-01-28"): DataFrame = {
    val third = events.filter(col("user_id") % 3 === 0)
    val signups = third.filter(col("event_type") === "signup" &&
        col("ts") < lit(cutoff).cast("timestamp"))
      .select(col("user_id").as("s_user"), col("event_id").as("signup_id"),
        col("ts").as("s_ts"))
      .withWatermark("s_ts", "30 minutes")
    val purchases = third.filter(col("event_type") === "purchase" &&
        col("ts") < lit(cutoff).cast("timestamp"))
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"), col("value"))
      .withWatermark("p_ts", "30 minutes")
    signups.join(purchases,
      col("s_user") === col("p_user") &&
        col("p_ts") >= col("s_ts") &&
        col("p_ts") <= col("s_ts") + expr("INTERVAL 1 HOUR"),
      "full_outer")
  }

  /** Stream-static enrichment join: each streaming event picks up its
    * dimension attributes from a BATCH table. The static side is planned
    * per micro-batch as an ordinary broadcast hash join — no streaming
    * state at all, which is why dimension enrichment is free at scale
    * (contrast purchasesAfterSignup's stream-stream state store).
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame, eventKey: String,
      dimKey: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim),
      col(eventKey) === col(dimKey))

  /** Streaming exact dedup on event_id within the watermark horizon —
    * `dropDuplicates` backed by the state store.
    */
  def streamingDedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming NEAR-dup dedup: drop any document whose 64-bit SimHash
    * signature was already seen within the watermark horizon — the
    * in-flight analog of the batch `dedup_simhash` family (same signature
    * expression, see DedupQueries.simhashCol). State is one row per
    * distinct signature inside the horizon; the watermark bounds it the
    * same way it bounds the exact-dedup state above. Expects (ts,
    * simhash, ...) columns on the input. */
  def streamingSimhashDedup(docs: DataFrame): DataFrame =
    docs
      .withWatermark("ts", "60 minutes")
      .dropDuplicatesWithinWatermark("simhash")

  /** Complete-mode streaming leaderboard: per-user event counts kept
    * globally sorted in the sink (sorting is legal on streaming frames
    * only after aggregation in Complete mode — this exercises exactly
    * that carve-out). The sink table is the always-current ranking; state
    * is one row per user (bounded by the key universe, not the stream).
    */
  def userLeaderboard(events: DataFrame): DataFrame =
    events.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("n_events").desc, col("user_id").asc)

  /** One per-user state snapshot of a micro-batch: event count + the
    * latest (ts, event_id, value) struct — struct max IS the max_by with
    * total tie order. The per-batch half of the foreachBatch upsert. */
  def userSnapshot(batch: DataFrame): DataFrame =
    batch.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        max(struct(col("ts"), col("event_id"), col("value"))).as("latest"))

  /** Merge a micro-batch snapshot into the accumulated store — the MERGE
    * step a foreachBatch sink runs per batch against Delta/JDBC in
    * production: counts add, latest-struct takes the greater. Both sides
    * are keyed aggregates (≤ one row per user), so at scale this is a
    * key-partitioned join of two bounded state tables, never of streams.
    */
  def mergeUserSnapshots(store: DataFrame, batch: DataFrame): DataFrame =
    store.select(col("user_id"), col("n_events").as("n_a"), col("latest").as("l_a"))
      .join(batch.select(col("user_id"), col("n_events").as("n_b"),
        col("latest").as("l_b")), Seq("user_id"), "full_outer")
      .select(col("user_id"),
        (coalesce(col("n_a"), lit(0L)) + coalesce(col("n_b"), lit(0L)))
          .as("n_events"),
        // greatest skips nulls, so the one-sided cases need no guards
        greatest(col("l_a"), col("l_b")).as("latest"))

  /** Canonical sink wiring (memory sink for tests, any sink in prod).
    * `singleBatch = true` runs with Trigger.Once — the batch-over-streaming
    * trigger for run-to-completion jobs. Unlike AvailableNow (its official
    * successor) it does NOT schedule the trailing no-data micro-batch whose
    * only work is watermark-driven state eviction — useless for a job about
    * to stop, and measured at ~40% of the interval join's wall time (state
    * commits across 4 stores × partitions). Long-lived queries (the
    * StreamingSpec semantics tests) keep the default multi-batch trigger.
    */
  def toMemorySink(df: DataFrame, name: String, mode: OutputMode,
      singleBatch: Boolean = false)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = df.writeStream.format("memory").queryName(name).outputMode(mode)
    (if (singleBatch)
      w.trigger(org.apache.spark.sql.streaming.Trigger.Once()): @annotation.nowarn("cat=deprecation")
    else w).start()
  }

  /** Trigger.AvailableNow sink: run-to-completion like Once, but honoring
    * source read limits (maxFilesPerTrigger etc.) so bounded input
    * processes in MULTIPLE micro-batches with state carried between them
    * — the trigger a production backfill uses, and the only bounded one
    * that exercises cross-batch state commit/restore.
    */
  def toMemorySinkAvailableNow(df: DataFrame, name: String, mode: OutputMode)
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream.format("memory").queryName(name).outputMode(mode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
}
