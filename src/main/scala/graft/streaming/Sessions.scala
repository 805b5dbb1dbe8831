package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** True gap-based sessionization (the round-3 verdict's #2 gap): events
  * split into sessions wherever a user's inter-event gap reaches the
  * threshold. Three surfaces over one semantics:
  *
  *  - [[gapSessions]]      batch, native `session_window` groupBy;
  *  - [[gapSessionsStream]] the same aggregation under Structured
  *    Streaming with a watermark (Spark merges/finalizes windows in the
  *    state store; append mode emits a session once the watermark passes
  *    its end — RocksDB-backed at scale like every windowed agg here);
  *  - [[gapSessionsState]] the custom-state form: per-user
  *    flatMapGroupsWithState with an EVENT-TIME TIMEOUT (not NoTimeout —
  *    state for an idle user is reaped and its final session emitted as
  *    soon as the watermark passes last_ts + gap, so state is bounded by
  *    ACTIVE users, not ever-seen users).
  *
  * All three emit (user_id, s_start, s_end, n_events, n_types, total)
  * with s_end = last event + gap (the `session_window` contract).
  * StreamingSpec proves both streaming forms equal the batch run; the
  * batch form is DuckDB-oracled as q76 (lag + cumulative-sum session
  * ids — gap sessionization is fully deterministic).
  *
  * No reference analogue (the reference is batch-only, SURVEY.md §2.11);
  * this is the builder-brief streaming/window surface for webtext event
  * feeds.
  */
object Sessions {

  /** The session row shape shared by all three surfaces. */
  final case class SessionRow(user_id: Long, s_start: Long, s_end: Long,
      n_events: Long, n_types: Long, total: Double)

  private def finish(
      grouped: org.apache.spark.sql.RelationalGroupedDataset): DataFrame =
    grouped
      // size(collect_set) not countDistinct: distinct aggregations are
      // unsupported on streaming frames, and batch shares this body
      .agg(count(lit(1)).as("n_events"),
        size(collect_set("event_type")).cast("long").as("n_types"),
        round(sum("value"), 4).as("total"))
      .select(col("user_id"),
        col("session_window.start").cast("long").as("s_start"),
        col("session_window.end").cast("long").as("s_end"),
        col("n_events"), col("n_types"), col("total"))

  /** Batch gap sessionization. `events` needs (user_id, ts, event_type,
    * value); a session ends when the next event is >= `gap` away, and
    * s_end = last event ts + gap.
    */
  def gapSessions(events: DataFrame, gap: String = "8 hours"): DataFrame =
    finish(events
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(col("user_id"), session_window(col("ts"), gap)))

  /** Streaming form of [[gapSessions]]: identical aggregation with a
    * watermark bounding session state; run in Append mode so only
    * finalized sessions emit.
    */
  def gapSessionsStream(events: DataFrame, gap: String = "8 hours",
      watermark: String = "1 hour"): DataFrame =
    finish(events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap)))

  /** Open-session accumulator for [[gapSessionsState]]. `types` is
    * bounded by event-type cardinality (small by contract).
    */
  final case class OpenSession(startMs: Long, lastMs: Long, n: Long,
      types: Set[String], total: Double)

  /** Custom-state gap sessionization: flatMapGroupsWithState keyed on
    * user with an event-time timeout of `gapMs` past the last event.
    * Sessions close (and emit) either when a later in-stream event
    * arrives past the gap, or when the WATERMARK passes last + gap
    * (the timeout path — an idle user's state is removed, unlike the
    * NoTimeout running-aggregate in [[StreamOps.sessionize]]).
    *
    * Contract: within a micro-batch events are sorted by ts here;
    * across batches events may arrive out of order only within the
    * watermark, and an event older than the current open session's tail
    * merges forward (the standard mapGroupsWithState sessionization
    * semantics). The caller must `withWatermark` the input; StreamingSpec
    * proves equality with [[gapSessions]] on an in-order replay.
    */
  def gapSessionsState(events: Dataset[StreamOps.Event],
      gapMs: Long = 8L * 3600 * 1000): Dataset[SessionRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[StreamOps.Event],
         state: GroupState[OpenSession]) =>
          def emit(s: OpenSession) = SessionRow(uid,
            s.startMs / 1000, (s.lastMs + gapMs) / 1000,
            s.n, s.types.size.toLong,
            BigDecimal(s.total).setScale(4, BigDecimal.RoundingMode.HALF_UP)
              .toDouble)
          if (!rows.hasNext) {
            // timeout fired: watermark passed last + gap -> final session
            val out = state.getOption.map(emit).iterator
            state.remove()
            out
          } else {
            val sorted = rows.toArray.sortBy(_.ts.getTime)
            val closed = Seq.newBuilder[SessionRow]
            var cur = state.getOption.orNull
            sorted.foreach { e =>
              val t = e.ts.getTime
              if (cur == null) {
                cur = OpenSession(t, t, 1L, Set(e.event_type), e.value)
              } else if (t - cur.lastMs >= gapMs) {
                closed += emit(cur)
                cur = OpenSession(t, t, 1L, Set(e.event_type), e.value)
              } else {
                // min start: a cross-batch late event (within the
                // watermark) earlier than the open session's first event
                // must extend the session backwards, as the batch
                // session_window merge does
                cur = OpenSession(math.min(cur.startMs, t),
                  math.max(cur.lastMs, t),
                  cur.n + 1, cur.types + e.event_type, cur.total + e.value)
              }
            }
            state.update(cur)
            // clamp above the watermark: with allowed lateness > gap, a
            // legal late event can leave last+gap behind the watermark,
            // and setTimeoutTimestamp rejects non-future timestamps —
            // the clamped session then times out on the next trigger
            state.setTimeoutTimestamp(
              math.max(cur.lastMs + gapMs, state.getCurrentWatermarkMs() + 1))
            closed.result().iterator
          }
      }
  }
}
