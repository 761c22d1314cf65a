package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming first-touch FUNNEL — the stateful-stream counterpart of the
  * batch funnel query (x74): per-user stage tracking via
  * `flatMapGroupsWithState`, emitting one row the first time a user crosses
  * each stage (view → click strictly after the first view → purchase
  * strictly after that qualifying click). The emitted stream of stage
  * transitions is what a live conversion dashboard consumes; counting rows
  * per stage reproduces x74's funnel exactly (parity spec-proven).
  *
  * State is three optional ns-timestamps per user — bytes, not events — so
  * state size tracks the USER population, never event volume. The optional
  * processing-time timeout removes the state of users who go quiet (a real
  * funnel's conversion window): without it, churned users' 24 bytes live
  * forever; with it, a post-timeout conversion counts as a fresh view.
  *
  * Exactness contract: incremental stage decisions are order-sensitive (a
  * late-arriving EARLIER view could re-qualify a click that was already
  * rejected), so events are sorted by ts within each micro-batch and
  * cross-batch arrival must be per-user monotone — the guarantee a
  * watermark-sorted, user-partitioned upstream provides. Same concession as
  * StatefulSessions (in-batch sort + ordered-arrival across batches), and
  * the same one the batch query does NOT need (x74 sees all data at once).
  */
object StreamingFunnel {

  final case class FunnelEvent(userId: Long, eventType: String, tsNanos: Long)
  /** First-crossing ns time per stage; None = not yet reached. */
  final case class FunnelState(t1: Option[Long], t2: Option[Long], t3: Option[Long])
  final case class StageOut(userId: Long, stage: String, tsNanos: Long)

  /** Fold one user's time-sorted events onto the stage state, returning the
    * transitions to emit. Pure — the whole funnel rule lives here, shared
    * by the stream update and the spec's direct calls, and mirrors x74's
    * aggregate/join semantics: first view wins; a click qualifies only
    * strictly AFTER the first view; a purchase only strictly after the
    * qualifying click.
    */
  def foldSorted(
      userId: Long,
      sorted: Seq[FunnelEvent],
      init: FunnelState): (List[StageOut], FunnelState) = {
    var s = init
    var out = List.empty[StageOut]
    sorted.foreach { e =>
      e.eventType match {
        case "view" if s.t1.isEmpty =>
          s = s.copy(t1 = Some(e.tsNanos))
          out ::= StageOut(userId, "1_view", e.tsNanos)
        case "click" if s.t1.nonEmpty && s.t2.isEmpty && e.tsNanos > s.t1.get =>
          s = s.copy(t2 = Some(e.tsNanos))
          out ::= StageOut(userId, "2_click", e.tsNanos)
        case "purchase" if s.t2.nonEmpty && s.t3.isEmpty && e.tsNanos > s.t2.get =>
          s = s.copy(t3 = Some(e.tsNanos))
          out ::= StageOut(userId, "3_purchase", e.tsNanos)
        case _ => () // non-funnel types (signup/error) and non-qualifying events
      }
    }
    (out, s)
  }

  def updateUser(withTimeout: Boolean)(
      userId: Long,
      events: Iterator[FunnelEvent],
      state: GroupState[FunnelState]): Iterator[StageOut] = {
    if (state.hasTimedOut) {
      // conversion window expired: a fully-converted user's state is pure
      // dedup memory; dropping it ends their funnel (a later purchase
      // would need a fresh view first) — exactly a windowed funnel's rule
      state.remove()
      Iterator.empty
    } else {
      val (out, s) = foldSorted(userId,
        events.toSeq.sortBy(_.tsNanos),
        state.getOption.getOrElse(FunnelState(None, None, None)))
      state.update(s)
      if (withTimeout) state.setTimeoutDuration("30 minutes")
      out.reverseIterator
    }
  }

  /** Stage-transition stream: one row per (user, stage) first crossing. */
  def stages(
      events: Dataset[FunnelEvent],
      timeout: GroupStateTimeout): Dataset[StageOut] = {
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val outEnc   = Encoders.product[StageOut]
    events.groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(), timeout)(
        updateUser(withTimeout = timeout != GroupStateTimeout.NoTimeout()))
  }
}
