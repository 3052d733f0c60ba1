package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event row as consumed by the streaming operators (ts_ms = event
  * time in epoch millis, the engine-wide representation).
  */
case class Ev(user_id: Long, event_id: Long, ts_ms: Long, value: Double)

/** A closed session — same shape as the batch Analytics.sessionize
  * output (SURVEY.md §2.G).
  */
case class SessionOut(user_id: Long, session_id: Long, start_ms: Long,
    end_ms: Long, n_events: Long, session_value: Double)

private[streaming] case class OpenSession(sessionIdx: Long, startMs: Long,
    endMs: Long, n: Long, value: Double)

/** Per-user state: the open session (if any) plus the count of
  * sessions already numbered — the counter must survive session
  * flushes so ids keep matching the batch numbering.
  */
private[streaming] case class UserSessions(lastIdx: Long, open: Option[OpenSession])

/** Streaming twin of the batch gap-sessionization
  * (operators/Analytics.sessionize): the reference tracks live
  * sessions by mutating `last_activity` rows and expiring them after
  * a 30-minute gap (core/session_utils.py:200, session_models.py);
  * here the same semantics run as `flatMapGroupsWithState` keyed by
  * user with an event-time watermark — one state row per live user,
  * sessions emitted exactly once when the gap (or the watermark)
  * closes them. Scale shape: state is O(live users), shuffle is the
  * single groupBy(user) exchange, and late events inside the
  * watermark merge correctly.
  */
object Sessionize {

  val GapMs = 30L * 60 * 1000

  def sessionize(spark: SparkSession, events: Dataset[Ev]): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", "30 minutes")
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserSessions, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[UserSessions]) =>
          def emit(s: OpenSession) =
            SessionOut(userId, s.sessionIdx, s.startMs, s.endMs, s.n, s.value)
          if (evs.isEmpty && state.hasTimedOut) {
            // watermark passed the gap: flush the open session but keep
            // the counter so later sessions continue the numbering
            val st = state.get
            st.open match {
              case Some(s) =>
                state.update(UserSessions(s.sessionIdx, None))
                Iterator.single(emit(s))
              case None => Iterator.empty
            }
          } else {
            val sorted = evs.toSeq.sortBy(e => (e.ts_ms, e.event_id))
            val st = state.getOption.getOrElse(UserSessions(0L, None))
            var lastIdx = st.lastIdx
            var open = st.open
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              open match {
                case Some(s) if e.ts_ms - s.endMs <= GapMs =>
                  // min/max, never assignment: a late event (cross-batch,
                  // inside the watermark) must not drag the session end
                  // backwards — that would make the next on-time event
                  // look > GapMs away and wrongly split the session
                  open = Some(s.copy(
                    startMs = math.min(s.startMs, e.ts_ms),
                    endMs = math.max(s.endMs, e.ts_ms),
                    n = s.n + 1, value = s.value + e.value))
                case Some(s) =>
                  closed += emit(s)
                  lastIdx = s.sessionIdx
                  open = Some(OpenSession(s.sessionIdx + 1, e.ts_ms, e.ts_ms, 1, e.value))
                case None =>
                  open = Some(OpenSession(lastIdx + 1, e.ts_ms, e.ts_ms, 1, e.value))
              }
            }
            state.update(UserSessions(lastIdx, open))
            // flush when the watermark passes the open session's gap
            open.foreach(s => state.setTimeoutTimestamp(s.endMs + GapMs))
            closed.result().iterator
          }
      }
  }

  /** Streaming exactly-once event dedup: drops event_id replays
    * inside the watermark window — the stream-side twin of
    * Dedup.dedupExact for at-least-once sources.
    */
  def dedupStream(spark: SparkSession, events: Dataset[Ev]): Dataset[Ev] = {
    import spark.implicits._
    events
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .drop("ts")
      .as[Ev]
  }

  /** Streaming mirror of Analytics.liveUsers: per sliding 30-minute
    * window, the (approximate) number of distinct active users.
    * Exact distinct is unsupported in streaming append mode;
    * approx_count_distinct is the scale answer on a cluster too.
    */
  def liveUserCounts(spark: SparkSession, events: Dataset[Ev]) = {
    events
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "30 minutes", "10 minutes"))
      .agg(approx_count_distinct(col("user_id")).as("live_users"),
        count(lit(1)).as("n_events"))
      .select(unix_millis(col("window.start")).as("window_start_ms"),
        col("live_users"), col("n_events"))
  }
}
