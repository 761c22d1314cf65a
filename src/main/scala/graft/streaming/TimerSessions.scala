package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Event-time sessionization on Spark 4's `transformWithState` — the NEW
  * arbitrary-state API's TIMER surface (registerTimer / deleteTimer /
  * handleExpiredTimer under `TimeMode.EventTime`), completing the
  * custom-state coverage matrix: `StatefulSessions` runs this exact gap
  * rule on the old `flatMapGroupsWithState` generations (wall-clock and
  * event-time timeouts), [[BudgetGate]] runs the new API without timers —
  * this is the new API WITH them.
  *
  * The fold core is [[StatefulSessions.foldSorted]] — the same function
  * object the old-API variants and the x120 batch replay call — so the
  * gap rule CANNOT drift between the four engines (the repo's x92/x91
  * pinning pattern applied to state APIs).
  *
  * Timer discipline: after folding a batch, the open session's horizon
  * (lastSeen + gap) is registered as an event-time timer, clamped past
  * the current watermark (a this-batch event can already have advanced
  * the watermark beyond the horizon; the timer then fires next batch).
  * Any previously-registered timer is deleted first — one live timer per
  * key, so timer state is O(keys) like the session state itself. When
  * the watermark passes the horizon, `handleExpiredTimer` emits the
  * session and clears state — quiet users' state frees exactly when the
  * stream has PROVEN no in-gap event can still arrive, the same
  * guarantee `sessionsEventTime` gets from EventTimeTimeout.
  */
object TimerSessions {
  import StatefulSessions.{Event, EventT, GapMicros, SessionOut, SessionState}

  class Processor extends StatefulProcessor[Long, EventT, SessionOut] {
    @transient private var state: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessionState](
        "session", Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EventT],
        timerValues: TimerValues): Iterator[SessionOut] = {
      val sorted = rows.toSeq.sortBy(_.tsMicros)
        .map(e => Event(e.userId, e.tsMicros, e.value))
      val init = if (state.exists()) Some(state.get()) else None
      val (closed, cur) = StatefulSessions.foldSorted(key, sorted, init)
      cur.foreach { s =>
        state.update(s)
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        // CEILING to ms: flooring a µs horizon would let the timer fire up
        // to 999µs before the true gap boundary, so a sub-ms in-gap event
        // still above the watermark could find its session already emitted
        // — splitting one session into two and breaking batch/stream gap
        // parity (ADVICE r9)
        val horizonMs = (s.lastSeen + GapMicros + 999) / 1000
        getHandle.registerTimer(
          math.max(horizonMs, timerValues.getCurrentWatermarkInMs + 1))
      }
      closed.reverseIterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] =
      if (state.exists()) {
        val s = state.get()
        state.clear()
        Iterator.single(SessionOut(key, s.start, s.lastSeen, s.nEvents, s.sumValue))
      } else Iterator.empty
  }

  /** Wire onto a typed stream: watermark on the event time (the timers'
    * clock), append mode — a session row is final when emitted. */
  def apply(events: Dataset[Event], delay: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withColumn("eventTime", expr("timestamp_micros(tsMicros)"))
      .as[EventT]
      .withWatermark("eventTime", delay)
      .groupByKey(_.userId)
      .transformWithState(new Processor, TimeMode.EventTime(), OutputMode.Append())
  }
}
