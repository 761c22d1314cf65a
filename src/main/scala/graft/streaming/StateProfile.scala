package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Per-user activity profile on `transformWithState` using the new API's
  * COMPOSITE state primitives — a typed `MapState` (per-event-type running
  * aggregates: the state shape a per-key sub-keyed aggregation needs,
  * which a ValueState would force into a serialized blob rewritten per
  * event) and a typed `ListState` (a BOUNDED most-recent buffer with
  * explicit eviction — the "last k things I saw" shape). Together with
  * [[BudgetGate]] (ValueState, no timers) and [[TimerSessions]]
  * (ValueState + event-time timers) this completes the new-API state-type
  * matrix.
  *
  * Profile semantics (deterministic, SQL-expressible — the oracle pins
  * them): per user, across ALL events seen — the distinct event-type
  * count, total event count, exact micro-unit value sum, the top type by
  * (count desc, type asc), its count, and the ids of the 3 most recent
  * events (by (ts, id) desc, comma-joined). A cumulative profile row is
  * emitted every batch; counts are monotone, so the final emission per
  * key is the answer under replay.
  *
  * Scale shape: MapState entries are O(types-per-user) and updated
  * point-wise (RocksDB put per touched type, not a whole-map rewrite);
  * the recent-buffer is truncated to 3 BEFORE it is written back, so list
  * state is O(1) per key no matter how long the history. All arithmetic
  * is exact 64-bit integers.
  */
object StateProfile {

  case class Ev(userId: Long, eventId: Long, tsMicros: Long,
      eventType: String, vMicro: Long)
  case class TypeAgg(n: Long, sumMicro: Long)
  case class Recent(tsMicros: Long, eventId: Long)
  case class Profile(userId: Long, nTypes: Long, nEvents: Long,
      sumMicro: Long, topType: String, topTypeN: Long, recentIds: String)

  val RecentK = 3

  class Processor extends StatefulProcessor[Long, Ev, Profile] {
    @transient private var types: MapState[String, TypeAgg] = _
    @transient private var recent: ListState[Recent] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      types = getHandle.getMapState[String, TypeAgg](
        "types", Encoders.STRING, Encoders.product[TypeAgg], TTLConfig.NONE)
      recent = getHandle.getListState[Recent](
        "recent", Encoders.product[Recent], TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[Profile] = {
      val batch = rows.toSeq
      // pre-aggregate the batch in memory, then ONE read+write per TOUCHED
      // type: state ops scale with sub-key cardinality, not event volume —
      // the difference between O(batch) and O(types) RocksDB round-trips
      batch.groupBy(_.eventType).foreach { case (tpe, evs) =>
        val prev =
          if (types.containsKey(tpe)) types.getValue(tpe)
          else TypeAgg(0L, 0L)
        types.updateValue(tpe,
          TypeAgg(prev.n + evs.size, prev.sumMicro + evs.map(_.vMicro).sum))
      }
      // bounded recent buffer: merge, order by (ts, id) desc, truncate to K
      // BEFORE writing back — list state never grows past K
      val merged = (recent.get().toSeq ++ batch.map(e => Recent(e.tsMicros, e.eventId)))
        .sortBy(r => (-r.tsMicros, -r.eventId)).take(RecentK)
      recent.put(merged.toArray)

      val all = types.iterator().toSeq
      val (topType, topAgg) = all.minBy { case (t, a) => (-a.n, t) }
      Iterator.single(Profile(
        key,
        all.size.toLong,
        all.map(_._2.n).sum,
        all.map(_._2.sumMicro).sum,
        topType, topAgg.n,
        merged.map(_.eventId).mkString(",")))
    }
  }

  def apply(ds: Dataset[Ev]): Dataset[Profile] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.userId)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update())
  }
}
