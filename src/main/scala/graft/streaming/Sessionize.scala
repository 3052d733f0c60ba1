package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event row as consumed by the streaming operators (ts_ms = event
  * time in epoch millis, the engine-wide representation).
  */
case class Ev(user_id: Long, event_id: Long, ts_ms: Long, value: Double)

/** Event row with its type — consumed by the streaming operators
  * whose batch twins group or filter on event_type.
  */
case class EvT(user_id: Long, event_id: Long, event_type: String,
    ts_ms: Long, value: Double)

/** A closed session — same shape as the batch Analytics.sessionize
  * output (SURVEY.md §2.G).
  */
case class SessionOut(user_id: Long, session_id: Long, start_ms: Long,
    end_ms: Long, n_events: Long, session_value: Double)

/** `valueCents`: the session value accumulated as exact integer
  * cents (DECIMAL(18,2) semantics) — double addition would drift
  * from the batch twin's decimal-exact sum with arrival order.
  */
private[streaming] case class OpenSession(sessionIdx: Long, startMs: Long,
    endMs: Long, n: Long, valueCents: Long)

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

  /** Single source of truth for the session gap; the watermark spec
    * is DERIVED from it because correct late-event merging relies on
    * the invariant watermark delay ≤ gap (an accepted late event is
    * then always within the gap of the open session — the same
    * grouping the batch sort produces). Widening the watermark past
    * the gap would silently merge sessions batch splits.
    */
  val GapMs: Long = graft.operators.Analytics.SessionGapMs
  // spelled in milliseconds so a gap that isn't a whole number of
  // minutes never silently truncates the delay
  val WatermarkSpec: String = s"$GapMs milliseconds"

  /** How long a flushed user's session COUNTER survives before its
    * state row is dropped — bounds state at O(users active within
    * retention), not O(users ever seen). A user idle longer restarts
    * numbering at 1 (documented retention tradeoff vs the batch
    * numbering, which spans all time).
    */
  val CounterRetentionMs: Long = 30L * 24 * 3600 * 1000

  private def cents(v: Double): Long =
    BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      .underlying.unscaledValue.longValueExact

  def sessionize(spark: SparkSession, events: Dataset[Ev]): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", WatermarkSpec)
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserSessions, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[UserSessions]) =>
          def emit(s: OpenSession) =
            SessionOut(userId, s.sessionIdx, s.startMs, s.endMs, s.n, s.valueCents / 100.0)
          if (evs.isEmpty && state.hasTimedOut) {
            val st = state.get
            st.open match {
              case Some(s) =>
                // watermark passed the gap: flush the open session; keep
                // the counter (numbering parity) under a retention timer
                state.update(UserSessions(s.sessionIdx, None))
                state.setTimeoutTimestamp(s.endMs + CounterRetentionMs)
                Iterator.single(emit(s))
              case None =>
                state.remove()   // retention expired: state stays bounded
                Iterator.empty
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
                    n = s.n + 1, valueCents = s.valueCents + cents(e.value)))
                case Some(s) =>
                  closed += emit(s)
                  lastIdx = s.sessionIdx
                  open = Some(OpenSession(s.sessionIdx + 1, e.ts_ms, e.ts_ms, 1, cents(e.value)))
                case None =>
                  open = Some(OpenSession(lastIdx + 1, e.ts_ms, e.ts_ms, 1, cents(e.value)))
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
      .withWatermark("ts", WatermarkSpec)
      .dropDuplicatesWithinWatermark("event_id")
      .drop("ts")
      .as[Ev]
  }

  /** Streaming twin of the batch Analytics.eventWindows: tumbling
    * 1-hour windows per event_type, count + decimal-exact value sum.
    * Watermarked append mode emits each window exactly once when the
    * watermark passes it; the decimal partial sum is mergeable, so
    * late rows inside the watermark fold in order-independently and
    * the emitted row equals the batch row bit-for-bit. State is
    * O(open windows × types) — constant per hour of event time.
    */
  def windowedEventCounts(spark: SparkSession, events: Dataset[EvT]) = {
    import org.apache.spark.sql.types.DecimalType
    events
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", WatermarkSpec)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .select(unix_millis(col("window.start")).as("window_ms"),
        col("event_type"), col("n"), col("total_value"))
  }

  /** Stream-stream interval join: each purchase matched to the same
    * user's views in the preceding [[GapMs]] — last-touch attribution
    * as both sides flow in. The event-time range condition plus the
    * two watermarks let Spark expire join state (a view older than
    * watermark + gap can never match a future purchase), so state is
    * bounded by the gap window instead of growing with the stream —
    * the streaming twin of the batch as-of/range joins
    * (operators/AsOf.scala, operators/RangeJoin.scala).
    */
  def attributeViews(spark: SparkSession, views: Dataset[Ev],
      purchases: Dataset[Ev]) = {
    val v = views
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", WatermarkSpec)
      .select(col("ts").as("v_ts"), col("user_id").as("v_user"),
        col("event_id").as("view_id"))
    val p = purchases
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", WatermarkSpec)
      .select(col("ts").as("p_ts"), col("user_id"),
        col("event_id").as("purchase_id"))
    p.join(v, col("user_id") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr(s"INTERVAL $GapMs MILLISECONDS") &&
        col("v_ts") <= col("p_ts"))
      .select(col("user_id"), col("purchase_id"), col("view_id"),
        unix_millis(col("p_ts")).as("purchase_ms"),
        unix_millis(col("v_ts")).as("view_ms"))
  }

  /** Streaming mirror of Analytics.liveUsers: per sliding 30-minute
    * window, the (approximate) number of distinct active users.
    * Exact distinct is unsupported in streaming append mode;
    * approx_count_distinct is the scale answer on a cluster too.
    */
  def liveUserCounts(spark: SparkSession, events: Dataset[Ev]) = {
    events
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", WatermarkSpec)
      .groupBy(window(col("ts"), "30 minutes", "10 minutes"))
      .agg(approx_count_distinct(col("user_id")).as("live_users"),
        count(lit(1)).as("n_events"))
      .select(unix_millis(col("window.start")).as("window_start_ms"),
        col("live_users"), col("n_events"))
  }
}
