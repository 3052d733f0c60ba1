package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A user reaching a funnel stage, emitted once per (user, stage)
  * within a retention window: stage ∈ view | click | purchase, ts =
  * the event time the stage was reached (== the batch operator's min
  * qualifying ts). After [[Funnel.StageRetentionMs]] of inactivity
  * the user's stage record is evicted (bounded state), so a user
  * returning later restarts the funnel and may re-emit stages —
  * exactly-once holds per retention window, not globally.
  */
case class StageReach(user_id: Long, stage: String, ts_ms: Long)

private[streaming] case class FunnelState(
    pending: Seq[Ev3],          // accepted events not yet past the watermark
    minV: Long, minC: Long, minP: Long,   // Long.MinValue = not reached
    lastMs: Long)               // latest event time seen (retention clock)

private[streaming] case class Ev3(ts_ms: Long, event_id: Long, event_type: String)

/** Streaming twin of the batch ordered funnel (Analytics.funnel):
  * first view, first click strictly after it, first purchase
  * strictly after that — per user, in EVENT-TIME order.
  *
  * Ordering is the hard part a naive state machine gets wrong: a
  * click processed before its preceding view ARRIVES (late, inside
  * the watermark) must still count. So events buffer per user until
  * the watermark passes them — only then can no earlier event still
  * arrive — and flush through the stage machine in (ts, event_id)
  * order. State is O(events inside the watermark window) per user
  * while a user is active, plus one stage record per progressed user
  * that a retention timer evicts [[StageRetentionMs]] after the
  * user's last event (a user returning later restarts the funnel —
  * the same bounded-state tradeoff Sessionize takes for its session
  * counter). Events older than the watermark at arrival are dropped
  * by Spark upstream, as usual.
  */
object Funnel {

  private val Unset = Long.MinValue

  /** Funnel-owned allowed lateness — intentionally NOT derived from
    * the session gap: sessionize's watermark must stay ≤ the gap for
    * its merge invariant, a constraint that has no meaning here, and
    * retuning session semantics must not silently change which late
    * funnel events get dropped.
    */
  val AllowedLatenessMs: Long = 30L * 60 * 1000
  val WatermarkSpec: String = s"$AllowedLatenessMs milliseconds"

  /** How long a progressed user's stage record outlives their last
    * event before eviction bounds the state store.
    */
  val StageRetentionMs: Long = 30L * 24 * 3600 * 1000

  /** Merge two (ts, event_id)-sorted sequences — the pending buffer
    * is already sorted, so a full re-sort per batch is waste.
    */
  private def mergeSorted(a: Seq[Ev3], b: Seq[Ev3]): Seq[Ev3] = {
    val out = Vector.newBuilder[Ev3]
    var (i, j) = (0, 0)
    while (i < a.length && j < b.length) {
      val le = a(i).ts_ms < b(j).ts_ms ||
        (a(i).ts_ms == b(j).ts_ms && a(i).event_id <= b(j).event_id)
      if (le) { out += a(i); i += 1 } else { out += b(j); j += 1 }
    }
    out ++= a.drop(i); out ++= b.drop(j)
    out.result()
  }

  def streamFunnel(spark: SparkSession, events: Dataset[EvT]): Dataset[StageReach] = {
    import spark.implicits._
    events
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", WatermarkSpec)
      .as[EvT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StageReach](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, evs: Iterator[EvT], state: GroupState[FunnelState]) =>
          val st = state.getOption.getOrElse(
            FunnelState(Vector.empty, Unset, Unset, Unset, Unset))
          // a completed funnel ignores new events: nothing can emit
          val incoming =
            if (st.minP != Unset) Vector.empty[Ev3]
            else evs.map(e => Ev3(e.ts_ms, e.event_id, e.event_type))
              .toVector.sortBy(e => (e.ts_ms, e.event_id))
          val merged = mergeSorted(st.pending, incoming)
          val lastMs = (st.lastMs +: merged.map(_.ts_ms)).max
          // flush everything the watermark has passed: no earlier
          // event can arrive before it anymore
          val wm = state.getCurrentWatermarkMs()
          val (flush, keep) = merged.partition(_.ts_ms <= wm)
          var (minV, minC, minP) = (st.minV, st.minC, st.minP)
          val out = Seq.newBuilder[StageReach]
          flush.foreach { e =>
            e.event_type match {
              case "view" if minV == Unset =>
                minV = e.ts_ms; out += StageReach(userId, "view", e.ts_ms)
              case "click" if minV != Unset && minC == Unset && e.ts_ms > minV =>
                minC = e.ts_ms; out += StageReach(userId, "click", e.ts_ms)
              case "purchase" if minC != Unset && minP == Unset && e.ts_ms > minC =>
                minP = e.ts_ms; out += StageReach(userId, "purchase", e.ts_ms)
              case _ => ()
            }
          }
          // watermark-driven, not hasTimedOut-driven: a far watermark
          // jump must evict here rather than arm a timeout already in
          // the past (which Spark rejects)
          val idleAndExpired = keep.isEmpty &&
            (minV == Unset || wm >= lastMs + StageRetentionMs)
          if (idleAndExpired) {
            state.remove()   // never progressed, or retention passed
          } else {
            state.update(FunnelState(keep, minV, minC, minP, lastMs))
            // wake when the watermark passes the earliest buffered
            // event; an empty buffer sleeps until retention expiry
            if (keep.nonEmpty) state.setTimeoutTimestamp(keep.head.ts_ms + 1)
            else state.setTimeoutTimestamp(lastMs + StageRetentionMs)
          }
          out.result().iterator
      }
  }
}
