package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A user reaching a funnel stage, emitted exactly once per (user,
  * stage): stage ∈ view | click | purchase, ts = the event time the
  * stage was reached (== the batch operator's min qualifying ts).
  */
case class StageReach(user_id: Long, stage: String, ts_ms: Long)

private[streaming] case class FunnelState(
    pending: Seq[Ev3],          // accepted events not yet past the watermark
    minV: Long, minC: Long, minP: Long)   // Long.MinValue = not reached

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
  * order. State is O(events inside the watermark window) per user,
  * the same bound class as a stream-stream join, and each stage
  * emits exactly once (append mode). Events older than the watermark
  * at arrival are dropped by Spark upstream, as usual.
  */
object Funnel {

  private val Unset = Long.MinValue

  def streamFunnel(spark: SparkSession, events: Dataset[EvT]): Dataset[StageReach] = {
    import spark.implicits._
    events
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", Sessionize.WatermarkSpec)
      .as[EvT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StageReach](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, evs: Iterator[EvT], state: GroupState[FunnelState]) =>
          val st = state.getOption.getOrElse(FunnelState(Vector.empty, Unset, Unset, Unset))
          val merged = (st.pending ++ evs.map(e => Ev3(e.ts_ms, e.event_id, e.event_type)))
            .sortBy(e => (e.ts_ms, e.event_id))
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
          if (keep.isEmpty && minV == Unset && minC == Unset && minP == Unset) {
            state.remove()
          } else {
            state.update(FunnelState(keep, minV, minC, minP))
            // wake when the watermark passes the earliest buffered
            // event so the tail flushes without new arrivals
            if (keep.nonEmpty) state.setTimeoutTimestamp(keep.head.ts_ms + 1)
          }
          out.result().iterator
      }
  }
}
