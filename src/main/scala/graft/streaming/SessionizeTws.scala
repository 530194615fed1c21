package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{
  ExpiredTimerInfo,
  OutputMode,
  StatefulProcessor,
  TimeMode,
  TimerValues,
  TTLConfig
}

/** Session state for the transformWithState processor: the running
  * session plus the close timer it registered (timers are not named, so
  * re-registration must delete the stale one explicitly — the
  * `setTimeoutTimestamp` replace semantics of the v1 API are NOT
  * implicit here).
  */
final case class TwsSessionState(
    startMs: Long,
    lastMs: Long,
    count: Int,
    sum: Double,
    timerMs: Long
)

/** The [[Sessionize]] per-user sessionizer re-expressed on the
  * arbitrary-state v2 API (`transformWithState` + `StatefulProcessor`,
  * Spark 4.x): identical semantics — a session closes only when the
  * event-time watermark passes last-event + gap; in-batch gaps close
  * mid-batch; a late in-watermark event extends the stored session
  * backwards. SessionizeTwsSpec pins output equality against the v1
  * implementation on the same micro-batched stream.
  *
  * Why carry both: v1 (`flatMapGroupsWithState`) runs on any state
  * store; v2 is the forward path — typed composable state variables
  * (value/list/map) instead of one opaque blob, explicit timers
  * decoupled from state, and state-schema evolution — but requires the
  * RocksDB state store provider. At 100 TB the state layout argument is
  * unchanged: one fixed-size record per ACTIVE user, lifetime bounded
  * by the gap via the close timer.
  */
object SessionizeTws {

  private final class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, UserEvent, CompletedSession] {

    @transient private var state: org.apache.spark.sql.streaming.ValueState[TwsSessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[TwsSessionState](
        "session",
        Encoders.product[TwsSessionState],
        TTLConfig.NONE
      )

    private def emit(s: TwsSessionState, userId: Long): CompletedSession =
      CompletedSession(
        userId,
        new Timestamp(s.startMs),
        new Timestamp(s.lastMs),
        s.count,
        s.sum
      )

    override def handleInputRows(
        userId: Long,
        rows: Iterator[UserEvent],
        timerValues: TimerValues
    ): Iterator[CompletedSession] = {
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      var cur = if (state.exists()) Some(state.get()) else None
      val prevTimer = cur.map(_.timerMs)
      val closed = Seq.newBuilder[CompletedSession]
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.lastMs <= gapMs =>
            // min on start: a late in-watermark event can predate the
            // stored session's first event (same rule as Sessionize)
            cur = Some(
              TwsSessionState(
                math.min(s.startMs, t),
                math.max(s.lastMs, t),
                s.count + 1,
                s.sum + e.value,
                s.timerMs
              )
            )
          case Some(s) =>
            closed += emit(s, userId)
            cur = Some(TwsSessionState(t, t, 1, e.value, s.timerMs))
          case None =>
            cur = Some(TwsSessionState(t, t, 1, e.value, timerMs = -1L))
        }
      }
      cur.foreach { s =>
        // same clamp as Sessionize: a close time already behind the
        // watermark must still fire at the next opportunity
        val fireAt =
          math.max(s.lastMs + gapMs, timerValues.getCurrentWatermarkInMs() + 1)
        if (s.timerMs != fireAt) {
          prevTimer.filter(_ >= 0).foreach(getHandle.deleteTimer)
          getHandle.registerTimer(fireAt)
        }
        state.update(s.copy(timerMs = fireAt))
      }
      closed.result().iterator
    }

    override def handleExpiredTimer(
        userId: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo
    ): Iterator[CompletedSession] =
      if (state.exists()) {
        val s = state.get()
        // only the timer the CURRENT session registered may close it; a
        // stale timer (deleted-then-raced) must be ignored
        if (expiredTimerInfo.getExpiryTimeInMs() == s.timerMs) {
          state.clear()
          Iterator(emit(s, userId))
        } else Iterator.empty
      } else Iterator.empty
  }

  def sessions(
      events: Dataset[UserEvent],
      gapMinutes: Int = 30
  ): Dataset[CompletedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .transformWithState(
        new SessionProcessor(gapMinutes * 60000L),
        TimeMode.EventTime(),
        OutputMode.Append()
      )
  }
}
