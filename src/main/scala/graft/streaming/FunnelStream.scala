package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.ScoringStream.RawEvent

/** One funnel advance: `user` reached stage `stage` (1-based) at `ts`. */
final case class FunnelAdvance(user: Long, stage: Int, stage_name: String,
    ts: Timestamp)

/** Funnel state: stages completed so far + the last stage's event time. */
final case class FunnelState(depth: Int, lastMs: Long)

/** STREAMING strict-order funnel — the continuous twin of the batch
  * funnel (q78): per user, one integer of state (current depth + the
  * last stage's timestamp), advancing only when the NEXT expected
  * stage arrives strictly after the previous one, and emitting a row
  * per advance the moment it happens (batch q78 recomputes the whole
  * cohort; the stream answers "who just converted" per microbatch).
  *
  * Scale/state contract: one (depth, ts) pair per live user, expiring
  * via event-time timeout ([[NearDupStream]]'s rule). Intra-batch
  * disorder sorts exactly; a stage event arriving in a LATER
  * microbatch than a logically-earlier stage is the at-least-once
  * caveat shared with [[CarryForwardStream]] — retrospective exact
  * cohorts remain q78's batch contract.
  */
object FunnelStream {

  val stages: Vector[String] = Vector("signup", "view", "click", "purchase")

  def advances(events: Dataset[RawEvent], watermark: String,
      retentionMs: Long): Dataset[FunnelAdvance] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user)
      .flatMapGroupsWithState[FunnelState, FunnelAdvance](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, rows, state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toVector.sortBy(e => (e.ts.getTime, e.action))
            val out = Vector.newBuilder[FunnelAdvance]
            var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
            var maxTs = 0L
            batch.foreach { e =>
              val t = e.ts.getTime
              maxTs = math.max(maxTs, t)
              if (st.depth < stages.length && e.action == stages(st.depth) &&
                  t > st.lastMs) {
                st = FunnelState(st.depth + 1, t)
                out += FunnelAdvance(user, st.depth, e.action, e.ts)
              }
            }
            state.update(st)
            state.setTimeoutTimestamp(maxTs + retentionMs)
            out.result().iterator
          }
      }
  }
}
