package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
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
  /** Event plus its event-time column, for the watermarked variant. */
  final case class EventT(
      userId: Long, tsMicros: Long, value: Double, eventTime: java.sql.Timestamp)
  final case class SessionState(
      start: Long, lastSeen: Long, nEvents: Long, sumValue: Double)
  final case class SessionOut(
      userId: Long, startMicros: Long, endMicros: Long, nEvents: Long, sumValue: Double)

  val GapMicros: Long = 30L * 60 * 1000000 // 30 min, same as x6

  /** Fold a user's time-sorted batch events onto the open session: returns
    * (sessions closed by in-batch gaps, the still-open session). Shared by
    * the wall-clock and event-time update functions so the gap rule cannot
    * drift between them (or from the batch x6 query).
    */
  private[streaming] def foldSorted(
      userId: Long,
      sorted: Seq[Event],
      init: Option[SessionState]): (List[SessionOut], Option[SessionState]) = {
    var closed = List.empty[SessionOut]
    var cur = init
    sorted.foreach { e =>
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
    (closed, cur)
  }

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
      val (closed, cur) = foldSorted(userId, events.toSeq.sortBy(_.tsMicros), state.getOption)
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

  /** Event-time update function: identical gap fold, but the timeout is an
    * EVENT-TIME timestamp — the open session closes when the WATERMARK
    * passes lastSeen + gap, i.e. when the stream has proven no in-gap event
    * can still arrive. Unlike the wall-clock variant, a backlog cannot close
    * a session early: stalled micro-batches stall the watermark too, so
    * stream output equals the batch x6 query under any processing delay.
    * The registered timestamp is clamped to watermark+1ms — Spark rejects a
    * timeout at or before the current watermark, which can happen when this
    * batch's own events already advanced the watermark past the session's
    * horizon (the session then closes on the next micro-batch).
    */
  def updateUserEventTime(
      userId: Long,
      events: Iterator[EventT],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val closedFinal = state.getOption
        .map(s => SessionOut(userId, s.start, s.lastSeen, s.nEvents, s.sumValue))
      state.remove()
      closedFinal.iterator
    } else {
      val evs = events.toSeq.sortBy(_.tsMicros)
        .map(e => Event(e.userId, e.tsMicros, e.value))
      val (closed, cur) = foldSorted(userId, evs, state.getOption)
      cur.foreach { s =>
        state.update(s)
        val horizonMs = (s.lastSeen + GapMicros) / 1000
        state.setTimeoutTimestamp(math.max(horizonMs, state.getCurrentWatermarkMs + 1))
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
    * session can close that the batch x6 query would keep open. For strict
    * event-time parity under backlog use `sessionsEventTime` below, which
    * trades it back: a stalled WATERMARK (idle source) keeps the final
    * session open until events — from any user — advance it.
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

  /** One row of the batch-REPLAY frame: either a session the batch CLOSED
    * (`open = false` — start/lastSeen are the session bounds) or the
    * still-open per-user state to thread into the next batch
    * (`open = true`). One tagged frame instead of a (closed, state) pair so
    * a replay step is a single cogroup whose output the caller splits —
    * the same shape `assignBatch` uses for the near-dedup state.
    */
  final case class Replayed(
      userId: Long, open: Boolean,
      start: Long, lastSeen: Long, nEvents: Long, sumValue: Double)

  /** Replay ONE micro-batch of the streaming fold in batch mode: cogroup
    * the batch's events with the carried open-session state by user and run
    * [[foldSorted]] — the EXACT core both streaming update functions call —
    * emitting the sessions this batch closed plus the new open state. With
    * batches split in event-time order (every event of batch b+1 at or
    * after every event of batch b for the same user), threading this over
    * the batches and flushing the final state yields the identical session
    * set to a single-batch pass — the stream==batch parity contract the
    * declared x120 pins against the window-SQL oracle.
    *
    * Scale shape: both sides hash-partition on userId (state is one row per
    * OPEN user — active-user-sized, not event-sized) and the fold streams
    * each group; no driver-side state ever materializes.
    */
  def replayBatch(
      events: Dataset[Event],
      state: Dataset[Replayed]): Dataset[Replayed] = {
    implicit val repEnc = Encoders.product[Replayed]
    implicit val longEnc = Encoders.scalaLong
    events.groupByKey(_.userId).cogroup(state.groupByKey(_.userId)) {
      (uid, evs, sts) =>
        val init =
          if (sts.hasNext) { val r = sts.next()
            Some(SessionState(r.start, r.lastSeen, r.nEvents, r.sumValue)) }
          else None
        val (closed, cur) = foldSorted(uid, evs.toSeq.sortBy(_.tsMicros), init)
        (closed.reverse.map(so =>
          Replayed(uid, open = false, so.startMicros, so.endMicros, so.nEvents, so.sumValue)) ++
          cur.map(s =>
            Replayed(uid, open = true, s.start, s.lastSeen, s.nEvents, s.sumValue))).iterator
    }
  }

  /** Event-time sessionization: watermark on the event timestamp +
    * EventTimeTimeout, so session closure follows the DATA's clock — exact
    * stream/batch parity with the x6 gap rule even when processing lags
    * arrival (the wall-clock variant's documented failure mode).
    * `delay` is the out-of-order tolerance: events older than
    * watermark − delay are dropped by the engine, which is the standard
    * lateness contract, not a sessionization choice. State per user is one
    * SessionState; timeouts fire exactly when the watermark proves a gap.
    */
  def sessionsEventTime(
      events: Dataset[Event],
      delay: String = "10 minutes"): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val longEnc = Encoders.scalaLong
    implicit val evtEnc = Encoders.product[EventT]
    events
      .withColumn("eventTime", expr("timestamp_micros(tsMicros)"))
      .as[EventT]
      .withWatermark("eventTime", delay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(updateUserEventTime)
  }
}
