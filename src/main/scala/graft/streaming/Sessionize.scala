package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class UserEvent(user_id: Long, ts: Timestamp, value: Double)

final case class SessionState(
    startMs: Long,
    lastMs: Long,
    count: Int,
    sum: Double
)

final case class CompletedSession(
    user_id: Long,
    session_start: Timestamp,
    session_end: Timestamp,
    cnt: Int,
    sum_value: Double
)

/** Arbitrary stateful streaming via flatMapGroupsWithState (SURVEY.md
  * §2.3): a per-user sessionizer that emits a session only once it is
  * CLOSED — i.e. the event-time watermark has passed last-event + gap.
  * This is the semantics `session_window` cannot give you in append mode
  * with extra per-session aggregates beyond the built-ins, and the
  * template for any custom per-key state machine (rate limiting,
  * funnels, CEP-lite).
  *
  * Scale: state is one small fixed-size record per ACTIVE user (not per
  * event); the event-time timeout bounds state lifetime by the gap, and
  * the RocksDB state store (Sessions.local) keeps it off-heap.
  */
object Sessionize {

  def sessions(
      events: Dataset[UserEvent],
      gapMinutes: Int = 30
  ): Dataset[CompletedSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L

    def fn(
        userId: Long,
        batch: Iterator[UserEvent],
        state: GroupState[SessionState]
    ): Iterator[CompletedSession] = {
      if (state.hasTimedOut) {
        // watermark passed lastMs + gap: the session is closed — emit it
        val s = state.get
        state.remove()
        Iterator(
          CompletedSession(
            userId,
            new Timestamp(s.startMs),
            new Timestamp(s.lastMs),
            s.count,
            s.sum
          )
        )
      } else {
        val sorted = batch.toSeq.sortBy(_.ts.getTime)
        var cur = state.getOption
        val closed = Seq.newBuilder[CompletedSession]
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.lastMs <= gapMs =>
              // min on start: a late event inside the watermark can
              // predate the stored session's first event, and the emitted
              // window must cover everything it aggregated
              cur = Some(
                SessionState(
                  math.min(s.startMs, t),
                  math.max(s.lastMs, t),
                  s.count + 1,
                  s.sum + e.value
                )
              )
            case Some(s) =>
              // in-batch gap: the previous session closed mid-batch
              closed += CompletedSession(
                userId,
                new Timestamp(s.startMs),
                new Timestamp(s.lastMs),
                s.count,
                s.sum
              )
              cur = Some(SessionState(t, t, 1, e.value))
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // clamp: a late-but-in-watermark event can land in a session
          // whose close time (last + gap) is already behind the current
          // watermark — setTimeoutTimestamp rejects past timestamps, and
          // the session SHOULD close at the next opportunity, so fire at
          // watermark + 1ms in that case
          state.setTimeoutTimestamp(
            math.max(s.lastMs + gapMs, state.getCurrentWatermarkMs() + 1)
          )
        }
        closed.result().iterator
      }
    }

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout
      )(fn)
  }
}
