package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input row for streaming SCD2 transition detection (micros keep the
  * state tuple primitive AND full event precision — millis would truncate
  * against the batch oracle's microsecond timestamps).
  */
case class AttrEvent(user_id: Long, event_id: Long, tsMicros: Long, attr: String)

/** Per-key carry-over: the attribute value the last emitted version holds. */
case class ScdState(lastAttr: String)

/** One output row per TRANSITION (attribute changed vs the previous event
  * of the same key) — the open-ended version row of a type-2 history.
  */
case class ScdTransition(user_id: Long, event_id: Long, tsMicros: Long, attr: String)

/** Streaming half of [[graft.operators.Cdc.scd2History]]: detects
  * attribute transitions per key with `flatMapGroupsWithState`, emitting
  * the version-opening rows as they arrive. Interval CLOSING (valid_to)
  * is inherently retrospective — the next transition's timestamp — so the
  * stream emits the open-ended transition log and the consumer closes
  * intervals with a `lead` window over the accumulated log (the gate does
  * exactly that, replaying the batch oracle).
  *
  * Contract matches [[Sessionizer.assignSessions]]: events must arrive
  * time-ordered ACROSS micro-batches (the append-log contract); each
  * batch sorts its own per-key slice by (ts, event_id) so intra-batch
  * order is free. State is ONE string per key — the smallest state that
  * can decide "is this a transition", and orders of magnitude below the
  * windowed alternative (which would buffer events).
  */
object ScdStream {

  def transitions(events: Dataset[AttrEvent]): Dataset[ScdTransition] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ScdState, ScdTransition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[AttrEvent], state: GroupState[ScdState]) =>
          val sorted = it.toArray.sortBy(e => (e.tsMicros, e.event_id))
          var last = state.getOption.map(_.lastAttr)
          val out = sorted.flatMap { e =>
            if (last.contains(e.attr)) None
            else {
              last = Some(e.attr)
              Some(ScdTransition(uid, e.event_id, e.tsMicros, e.attr))
            }
          }
          last.foreach(a => state.update(ScdState(a)))
          out.iterator
      }
  }
}
