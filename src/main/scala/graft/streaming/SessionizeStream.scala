package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization — the Structured Streaming upgrade of
  * the batch lag+cumsum sessionizer (QueriesEvents.qSessionize):
  * `flatMapGroupsWithState` keeps (last event time, session index) per
  * user, incrementing the index when the inactivity gap exceeds the
  * threshold.
  *
  * State lifecycle: pass `watermarkDelay` to bound state — the input gets
  * an event-time watermark and idle users' state is evicted via
  * EventTimeTimeout once the watermark passes their last event + gap.
  * Without it (`None`, the test/default mode) state is per-user forever,
  * which is only acceptable for bounded key populations.
  *
  * Semantics match the batch form exactly when events arrive in order;
  * the spec drives both paths over the same data and compares.
  */
object SessionizeStream {

  final case class Event(event_id: Long, user_id: Long, ts: Timestamp)
  final case class SessionState(lastMicros: Long, sessionIdx: Long)
  final case class Sessionized(event_id: Long, user_id: Long, session_idx: Long)

  val GapMicros: Long = 1800L * 1000000L // 30 min

  def assign(withTimeout: Boolean)(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Sessionized] = {
    if (withTimeout && state.hasTimedOut) {
      // watermark passed last event + gap: the session can never continue
      state.remove()
      return Iterator.empty
    }
    // Full microsecond precision: getTime truncates to ms, which would
    // disagree with the batch form's unix_micros at exact-gap boundaries.
    def micros(t: Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L))
    val out = events.toSeq.sortBy(e => (micros(e.ts), e.event_id)).map { e =>
      val micros0 = micros(e.ts)
      val newSession = st.lastMicros == Long.MinValue ||
        micros0 - st.lastMicros > GapMicros
      st = SessionState(micros0, if (newSession) st.sessionIdx + 1 else st.sessionIdx)
      Sessionized(e.event_id, e.user_id, st.sessionIdx)
    }
    state.update(st)
    if (withTimeout)
      state.setTimeoutTimestamp(st.lastMicros / 1000L + GapMicros / 1000L)
    out.iterator
  }

  /** Wire the stateful sessionizer onto a (streaming or batch) Dataset of
    * events. Output: one row per event with its session index. */
  def sessionize(events: Dataset[Event],
      watermarkDelay: Option[String] = None): Dataset[Sessionized] = {
    import events.sparkSession.implicits._
    val src = watermarkDelay.fold(events)(d =>
      events.withWatermark("ts", d).as[Event])
    val timeout =
      if (watermarkDelay.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    src.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), timeout)(assign(watermarkDelay.isDefined))
  }
}
