package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input event for session assignment (epoch millis keep the state tuple
  * primitive and encoder-cheap).
  */
case class SessionEvent(user_id: Long, event_id: Long, tsMillis: Long)

/** Per-user carry-over state: last event time + current session number. */
case class SessionizerState(lastTsMillis: Long, seq: Int)

/** One output row per event: which session (1-based, per user) it fell in. */
case class SessionAssignment(user_id: Long, event_id: Long, session_seq: Int)

/** Custom-state streaming operator (SURVEY.md §2.10 extension surface):
  * assigns a per-user session sequence number to every event with
  * `flatMapGroupsWithState` — the explicit-`GroupState` primitive that
  * `session_window` cannot express when per-event output (not per-window
  * aggregates) is needed.
  *
  * Boundary matches [[EventStream.sessionCounts]]: a new session starts
  * only when the gap is strictly greater than `gapMillis` (exact-gap events
  * merge). Batch twin = gaps-and-islands lag/cumsum; the same code runs in
  * batch (one state pass per group) and streaming (state carried across
  * micro-batches — events must arrive time-ordered across batches, the
  * usual append-log contract).
  *
  * Scale: state is a constant-size tuple per user; each micro-batch sorts
  * only its own per-user slice.
  */
object Sessionizer {

  def assignSessions(
      events: Dataset[SessionEvent], gapMillis: Long): Dataset[SessionAssignment] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionizerState, SessionAssignment](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[SessionEvent], state: GroupState[SessionizerState]) =>
          val sorted = it.toArray.sortBy(e => (e.tsMillis, e.event_id))
          var st = state.getOption.getOrElse(SessionizerState(Long.MinValue, 0))
          val out = sorted.map { e =>
            val seq =
              if (st.seq == 0 || e.tsMillis - st.lastTsMillis > gapMillis) st.seq + 1
              else st.seq
            st = SessionizerState(e.tsMillis, seq)
            SessionAssignment(uid, e.event_id, seq)
          }
          state.update(st)
          out.iterator
      }
  }
}
