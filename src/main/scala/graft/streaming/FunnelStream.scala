package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming surface of the engine (Structured Streaming).
  *
  * The reference is a daily t-1 batch (`run_reports.py:183`) — its
  * daily-partition pull is the batch analogue of a tumbling 1-day
  * window. This module expresses the same funnel aggregations over a
  * STREAM of events: `readStream` → watermarked windowed aggregation →
  * any sink; plus a `mapGroupsWithState` sessionizer for the per-user
  * state the batch engine gets for free from its per-user fact table.
  * Batch parity: every aggregate here reuses the same expressions as
  * the batch path, so a windowed streaming result for a closed day
  * equals the batch result for that day's partition.
  */
object FunnelStream {

  /** Tumbling daily stage counts with late-data tolerance: the
    * streaming analogue of one `{date}/` directory of the reference's
    * layout. Watermark bounds state: windows close `lateness` after
    * their end and their state is evicted — mandatory at 100 TB/day.
    */
  def dailyEventCounts(events: DataFrame, lateness: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 day").as("day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("day.start").as("day_start"), col("event_type"), col("cnt"))

  /** Streaming FI status counts — same status mapping as the batch
    * funnel's S4 aggregation, per day.
    */
  def dailyFiStatusCounts(events: DataFrame, lateness: String = "1 day"): DataFrame = {
    val status = when(col("event_type") === "purchase", "Success")
      .when(col("event_type") === "error", "Failed")
      .when(col("event_type") === "view", "Not Attempted")
    events
      .withColumn("fetch_status", status)
      .filter(col("fetch_status").isNotNull)
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 day").as("day"), col("fetch_status"))
      .agg(count(lit(1)).as("Count"))
      .select(col("day.start").as("day_start"), col("fetch_status"), col("Count"))
  }

  /** Stream-static enrichment: join the event stream against a STATIC
    * dimension (per-user segment) and aggregate per (day, segment).
    * The static side broadcasts into every micro-batch — no stream
    * state beyond the windowed aggregate itself, and no watermark
    * requirement on the dimension (it has no event time). This is the
    * canonical "enrich the firehose with a profile table" shape: at
    * 100 TB/day the stream never shuffles for the join, only for the
    * windowed rollup.
    */
  def enrichedDailyCounts(events: DataFrame, userDim: DataFrame,
      lateness: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .join(broadcast(userDim), "user_id")
      .groupBy(window(col("ts"), "1 day").as("day"), col("segment"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("day.start").as("day_start"), col("segment"), col("cnt"))

  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  final case class UserFunnelState(events: Long, purchases: Long)
  final case class UserFunnelUpdate(user_id: Long, events: Long, purchases: Long,
      converted: Boolean)

  /** Streaming exact dedup: drop events whose id was already seen,
    * with the dedup state BOUNDED by the watermark. The variant
    * matters: plain `dropDuplicates("event_id")` NEVER evicts state
    * unless the watermarked column is part of the key — the classic
    * unbounded-state bug at 100 TB/day —
    * `dropDuplicatesWithinWatermark` expires each key once the
    * watermark passes its event time. At-least-once upstream delivery
    * becomes exactly-once rows downstream within the lateness horizon.
    */
  def dedupedEvents(events: DataFrame, lateness: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("event_id")

  final case class SessionState(
      start: java.sql.Timestamp, last: java.sql.Timestamp, events: Long)
  final case class ClosedSession(user_id: Long,
      session_start: java.sql.Timestamp, session_end: java.sql.Timestamp,
      events: Long)

  /** Session windows via `flatMapGroupsWithState` with EVENT-TIME
    * timeout: a user's events within `gapMinutes` of each other form one
    * session; a longer gap (or the watermark passing the timeout) closes
    * the session and emits it. This is the 0..N-outputs stateful shape
    * `mapGroupsWithState` can't express (a batch may close several
    * sessions for one key, or none), and the state per key is one small
    * case class — bounded by the watermark, which is what keeps a
    * 100 TB/day stream's state store finite.
    */
  def userSessions(events: Dataset[UserEvent], gapMinutes: Int = 30,
      lateness: String = "1 hour"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    val gapUs = gapMinutes * 60000000L
    // exact µs of a Timestamp (getTime alone truncates to ms, which
    // would merge a 30min+400µs gap the batch sessionizer breaks)
    def us(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[UserEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(userId, s.start, s.last, s.events))
          } else {
            // Interval-sweep merge over (open session ∪ this batch's
            // events), sorted by start: any two items within the gap
            // fuse — late events inside the watermark merge with EACH
            // OTHER and with the open session symmetrically, widening
            // but never shrinking intervals; the latest merged interval
            // stays open in state, everything earlier closes. (Late
            // events split ACROSS batches can still land in separate
            // sessions — that's inherent to bounded-lateness streaming,
            // not to this merge.)
            val items =
              (state.getOption.toSeq.map(s => (s.start, s.last, s.events)) ++
                batch.map(e => (e.ts, e.ts, 1L)))
                .sortBy { case (st, en, _) => (us(st), us(en)) }
            val merged = scala.collection.mutable.ArrayBuffer
              .empty[(java.sql.Timestamp, java.sql.Timestamp, Long)]
            items.foreach { case (st, en, c) =>
              merged.lastOption match {
                case Some((ps, pe, pc)) if us(st) - us(pe) <= gapUs =>
                  merged(merged.length - 1) =
                    (ps, if (en.after(pe)) en else pe, pc + c)
                case _ => merged += ((st, en, c))
              }
            }
            val open = merged.last
            state.update(SessionState(open._1, open._2, open._3))
            state.setTimeoutTimestamp(open._2.getTime + gapMs)
            merged.dropRight(1).iterator
              .map { case (st, en, c) => ClosedSession(userId, st, en, c) }
          }
      }
  }

  /** Custom per-key state via `mapGroupsWithState`: running per-user
    * funnel position (event count, purchase count, converted flag).
    * State is one small case class per user — KV-store-backed,
    * partition-parallel.
    */
  def userFunnelState(events: Dataset[UserEvent]): Dataset[UserFunnelUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserFunnelState, UserFunnelUpdate] {
        (userId: Long, batch: Iterator[UserEvent], state: GroupState[UserFunnelState]) =>
          val prev = state.getOption.getOrElse(UserFunnelState(0L, 0L))
          var ev = prev.events
          var pur = prev.purchases
          batch.foreach { e =>
            ev += 1
            if (e.event_type == "purchase") pur += 1
          }
          state.update(UserFunnelState(ev, pur))
          UserFunnelUpdate(userId, ev, pur, pur > 0)
      }
  }

  /** The same per-user funnel tracker on the arbitrary-stateful v2 API
    * (`transformWithState`): typed ValueState behind a
    * StatefulProcessor, RocksDB-required by design — per-key state
    * lives off-heap and spills to local disk, the posture an unbounded
    * user space needs. The optional TTL evicts idle users' state
    * declaratively (the mapGroupsWithState version above keeps state
    * until an explicit timeout callback), which is how a 100 TB/day
    * stream keeps its state store from accreting every user ever seen.
    * Note: TTL implies TimeMode.ProcessingTime, under which the engine
    * self-triggers batches to advance the eviction clock — pair it
    * with a real trigger interval in production; `processAllAvailable`
    * never quiesces under it, so tests drive the TTL-less mode.
    */
  final class FunnelProcessor(ttlMillis: Long)
      extends StatefulProcessor[Long, UserEvent, UserFunnelUpdate] {
    @transient private var st: ValueState[UserFunnelState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val cfg =
        if (ttlMillis <= 0L) TTLConfig.NONE
        else TTLConfig(java.time.Duration.ofMillis(ttlMillis))
      st = getHandle.getValueState[UserFunnelState]("funnel",
        org.apache.spark.sql.Encoders.product[UserFunnelState], cfg)
    }

    override def handleInputRows(userId: Long, rows: Iterator[UserEvent],
        timers: TimerValues): Iterator[UserFunnelUpdate] = {
      val prev = if (st.exists()) st.get() else UserFunnelState(0L, 0L)
      var ev = prev.events
      var pur = prev.purchases
      rows.foreach { e =>
        ev += 1
        if (e.event_type == "purchase") pur += 1
      }
      st.update(UserFunnelState(ev, pur))
      Iterator.single(UserFunnelUpdate(userId, ev, pur, pur > 0))
    }
  }

  def userFunnelStateV2(events: Dataset[UserEvent],
      ttlMillis: Long = 0L): Dataset[UserFunnelUpdate] = {
    import events.sparkSession.implicits._
    // TTL state is clocked by processing time, so the engine rejects
    // TTLConfig under TimeMode.None — pick the mode the TTL implies
    val mode = if (ttlMillis > 0L) TimeMode.ProcessingTime() else TimeMode.None()
    events
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor(ttlMillis),
        mode, OutputMode.Update())
  }
}
