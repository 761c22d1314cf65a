package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Per-key BUDGET GATE on Spark 4's `transformWithState` arbitrary-state
  * API (StatefulProcessor + typed ValueState, RocksDB-backed) — the
  * successor of `flatMapGroupsWithState` that `StatefulSessions` uses, so
  * together they cover both generations of the custom-state surface.
  *
  * Semantics (close-on-crossing, chosen to be EXACTLY SQL-expressible so
  * the oracle can pin it): events of a key are processed in (tsMicros,
  * eventId) order; an event is ACCEPTED iff the running total of ALL
  * prior events' vMicro is still below the budget; every event's vMicro
  * joins the running total whether accepted or not. That is precisely
  * `sum(v) OVER (… ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) <
  * budget` — a window predicate, not a sequential-greedy fold — which is
  * what makes stream and batch provably agree. The production use is
  * contribution capping: no user/source may contribute more than B units
  * to a training mix, the stream enforcing it incrementally.
  *
  * Ordering contract: rows are sorted per key WITHIN each
  * `handleInputRows` call, and callers must feed batches in event-time
  * order (the same replay discipline every parity query in this repo
  * uses). State per key is one `GateState` — O(keys) storage, O(batch)
  * work per batch. All arithmetic is exact 64-bit integers (micro-units).
  */
object BudgetGate {

  case class Ev(userId: Long, eventId: Long, tsMicros: Long, vMicro: Long)

  /** cumAll counts EVERY seen event's value; the accept decision reads it
    * before the update. nAcc/nRej/sumAcc summarize the decisions. */
  case class GateState(cumAll: Long, nAcc: Long, nRej: Long, sumAcc: Long)

  case class GateSummary(userId: Long, nAccepted: Long, nRejected: Long,
      sumAcceptedMicro: Long)

  class Processor(budgetMicro: Long)
      extends StatefulProcessor[Long, Ev, GateSummary] {
    @transient private var state: ValueState[GateState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[GateState](
        "gate", Encoders.product[GateState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[GateSummary] = {
      var s = if (state.exists()) state.get() else GateState(0L, 0L, 0L, 0L)
      rows.toSeq.sortBy(e => (e.tsMicros, e.eventId)).foreach { e =>
        s =
          if (s.cumAll < budgetMicro)
            GateState(s.cumAll + e.vMicro, s.nAcc + 1, s.nRej,
              s.sumAcc + e.vMicro)
          else
            GateState(s.cumAll + e.vMicro, s.nAcc, s.nRej + 1, s.sumAcc)
      }
      state.update(s)
      // cumulative summary each batch; counts are monotone, so the LAST
      // emission per key is the final answer under any append-y sink
      Iterator.single(GateSummary(key, s.nAcc, s.nRej, s.sumAcc))
    }
  }

  /** Wire the processor onto a typed stream (update mode, no event-time
    * timers — the gate is order-driven, not clock-driven). */
  def apply(ds: Dataset[Ev], budgetMicro: Long): Dataset[GateSummary] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.userId)
      .transformWithState(new Processor(budgetMicro),
        TimeMode.None(), OutputMode.Update())
  }
}
