package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization — the custom-state counterpart of the
  * batch lag-gap query (x6): per-user session tracking via
  * `flatMapGroupsWithState`, emitting a session row when a gap exceeds the
  * timeout (same 30-minute gap rule as x6) or the group state expires.
  *
  * State is one small case class per key (user), so state size tracks active
  * users, not event volume — the property that keeps this runnable on an
  * unbounded stream.
  */
object StatefulSessions {

  final case class Event(userId: Long, tsMicros: Long, value: Double)
  final case class SessionState(
      start: Long, lastSeen: Long, nEvents: Long, sumValue: Double)
  final case class SessionOut(
      userId: Long, startMicros: Long, endMicros: Long, nEvents: Long, sumValue: Double)

  val GapMicros: Long = 30L * 60 * 1000000 // 30 min, same as x6

  /** Emits CLOSED sessions; the open session per user lives in state. Events
    * inside a group arrive unordered within a micro-batch, so they are
    * sorted by time before folding. A processing-time timeout closes (and
    * emits) the open session of a user who goes quiet and REMOVES their
    * state — without this, churned users would leak state forever and their
    * final session would never surface.
    */
  def updateUser(withTimeout: Boolean)(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val closedFinal = state.getOption
        .map(s => SessionOut(userId, s.start, s.lastSeen, s.nEvents, s.sumValue))
      state.remove()
      closedFinal.iterator
    } else {
      var closed = List.empty[SessionOut]
      var cur = state.getOption
      events.toSeq.sortBy(_.tsMicros).foreach { e =>
        cur match {
          case Some(s) if e.tsMicros - s.lastSeen <= GapMicros =>
            cur = Some(SessionState(s.start, e.tsMicros, s.nEvents + 1, s.sumValue + e.value))
          case Some(s) => // gap exceeded: close the running session, open a new one
            closed ::= SessionOut(userId, s.start, s.lastSeen, s.nEvents, s.sumValue)
            cur = Some(SessionState(e.tsMicros, e.tsMicros, 1, e.value))
          case None =>
            cur = Some(SessionState(e.tsMicros, e.tsMicros, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // explicit flag, not a swallowed exception: a real registration
        // failure in the timeout path must surface, or churned users'
        // state silently leaks again
        if (withTimeout) state.setTimeoutDuration("30 minutes")
      }
      closed.reverseIterator
    }
  }

  /** Wires the update function onto a typed stream. Production default is
    * ProcessingTimeTimeout (quiet users' sessions close and their state
    * frees); tests pass NoTimeout because a pending timeout batch keeps
    * `processAllAvailable` from ever returning under the test harness —
    * the timeout branch itself is unit-tested with TestGroupState.
    *
    * CAVEAT: the 30-min timeout is WALL-CLOCK time, a liveness bound for
    * state cleanup — it is not the event-time gap rule. If micro-batches
    * stall longer than the timeout while in-gap events queue upstream, a
    * session can close that the batch x6 query would keep open. Strict
    * event-time parity needs EventTimeTimeout plus a watermark on the
    * source; for this engine the batch query (x6) is the semantics of
    * record and the stream trades exactness-under-backlog for bounded
    * state.
    */
  def sessions(
      events: Dataset[Event],
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout())
      : Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val longEnc = Encoders.scalaLong
    val withTimeout = timeout != GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(updateUser(withTimeout))
  }
}
