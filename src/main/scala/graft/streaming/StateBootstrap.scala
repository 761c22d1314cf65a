package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming._

/** Warm-started per-user profiles on `transformWithState` with INITIAL
  * STATE (`StatefulProcessorWithInitialState`) — the batch→streaming
  * migration primitive: a profile computed OFFLINE over history seeds the
  * state store, and the live stream folds on top, so cutover needs no
  * replay of the historical corpus. Completes the new-API matrix next to
  * [[BudgetGate]] (ValueState), [[TimerSessions]] (timers) and
  * [[StateProfile]] (MapState/ListState): this is the fourth face —
  * state BOOTSTRAP.
  *
  * Fold semantics (deterministic, SQL-expressible): per user — event
  * count, exact micro-unit value sum, max event id, and the count
  * carried in from the bootstrap half (proving the seed contributed). A
  * cumulative row is emitted per batch; counts are monotone so the final
  * emission per key is the answer. Users with NO streamed events are
  * seeded but never emit — by design (only active users re-profile);
  * the declared oracle restricts to stream-active users accordingly.
  *
  * Scale shape: the bootstrap is one batch aggregate (map-combining) and
  * ships to executors through the engine's initial-state channel (a
  * co-partitioned join against the first batch, not a driver collect);
  * per-event state work is an O(1) ValueState read+write.
  */
object StateBootstrap {

  case class Ev(userId: Long, eventId: Long, vMicro: Long)
  case class Boot(nEvents: Long, sumMicro: Long, maxId: Long, nBoot: Long)
  /** The keyed row shape the batch bootstrap aggregate produces. */
  case class BootRow(userId: Long, nEvents: Long, sumMicro: Long,
      maxId: Long, nBoot: Long)
  case class Out(userId: Long, nEvents: Long, sumMicro: Long,
      maxEventId: Long, nBoot: Long)

  class Processor extends StatefulProcessorWithInitialState[Long, Ev, Out, Boot] {
    @transient private var st: ValueState[Boot] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Boot](
        "boot", Encoders.product[Boot], TTLConfig.NONE)

    override def handleInitialState(key: Long, initialState: Boot,
        timerValues: TimerValues): Unit =
      st.update(initialState)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[Out] = {
      val prev = if (st.exists()) st.get() else Boot(0L, 0L, 0L, 0L)
      var n = prev.nEvents
      var s = prev.sumMicro
      var mx = prev.maxId
      rows.foreach { e =>
        n += 1; s += e.vMicro; if (e.eventId > mx) mx = e.eventId
      }
      st.update(Boot(n, s, mx, prev.nBoot))
      Iterator.single(Out(key, n, s, mx, prev.nBoot))
    }
  }

  /** Streamed fold over `events`, state-seeded from `boot`. */
  def apply(events: Dataset[Ev], boot: KeyValueGroupedDataset[Long, Boot])
      : Dataset[Out] = {
    implicit val outEnc: Encoder[Out] = Encoders.product[Out]
    implicit val bootEnc: Encoder[Boot] = Encoders.product[Boot]
    events.groupByKey(_.userId)(Encoders.scalaLong)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update(),
        boot, outEnc, bootEnc)
  }
}
