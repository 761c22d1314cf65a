package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming per-key top-k — the streaming face of the
  * `plans/TopKPerKey` batch operator (x122): per key, the current top-k
  * rows under (value desc nulls last, ts, id) held in `GroupState`, merged
  * with each micro-batch's arrivals. Top-k over a fixed ordering is a
  * COMMUTATIVE, IDEMPOTENT semigroup fold (max over k-sets), so any batch
  * split in ANY order converges to the single-pass answer — a strictly
  * stronger replay guarantee than sessionization's (x120 needs time-ordered
  * batches; this needs nothing).
  *
  * State is ≤ k rows per key — active-key-sized, the property that keeps it
  * runnable on an unbounded stream; each update is O(|batch_k| + k) via a
  * merge of two sorted runs (state is kept sorted).
  */
object StreamingTopK {

  /** One keyed row: x122's event projection. `value` is an Option so the
    * desc-NULLS-LAST ordering is explicit in the fold, not an accident of
    * sentinel encoding. */
  final case class Ev(userId: Long, eventId: Long, tsMicros: Long, value: Option[Double])

  /** (value desc nulls last, tsMicros asc, eventId asc) — exactly x122's
    * SortOrder sequence, so the streaming fold and the batch operator pick
    * the SAME rows whenever the tie-break is unique. */
  val ord: Ordering[Ev] = new Ordering[Ev] {
    override def compare(a: Ev, b: Ev): Int = {
      // Double.compare is a TOTAL order (NaN == NaN, NaN greatest — the
      // same convention Spark's descending sort uses), so equal-compare
      // values ALWAYS reach the unique tie-break: an `x != y` guard here
      // would be true for (NaN, NaN) yet compare to 0, skipping the
      // tie-break and breaking the commutative-replay guarantee
      val v = (a.value, b.value) match {
        case (Some(x), Some(y)) => java.lang.Double.compare(y, x) // desc
        case (Some(_), None)    => -1                             // nulls last
        case (None, Some(_))    => 1
        case (None, None)       => 0
      }
      if (v != 0) v
      else {
        val c = java.lang.Long.compare(a.tsMicros, b.tsMicros)
        if (c != 0) c else java.lang.Long.compare(a.eventId, b.eventId)
      }
    }
  }

  /** Merge prior state (≤ k rows) with a batch's arrivals: the semigroup
    * fold both the streaming update and the batch replay call. */
  def foldTopK(prior: Seq[Ev], batch: Iterator[Ev], k: Int): Seq[Ev] =
    (prior ++ batch).sorted(ord).take(k)

  /** Streaming face: emits each key's CURRENT top-k on every update
    * (Update output mode — downstream sinks upsert by key). */
  def topKStream(events: Dataset[Ev], k: Int): Dataset[Ev] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout)(
        (_: Long, it: Iterator[Ev], state: GroupState[Seq[Ev]]) => {
          val cur = foldTopK(state.getOption.getOrElse(Nil), it, k)
          state.update(cur)
          cur.iterator
        })
  }

  /** Replay ONE micro-batch in batch mode: cogroup the batch with carried
    * state by key and run [[foldTopK]] — the new ≤ k-row state per key.
    * Threading over any batch split (no ordering requirement — the fold is
    * commutative) and taking the final state yields the single-pass top-k,
    * which x130 pins against x122's window-SQL oracle.
    */
  def replayBatch(events: Dataset[Ev], state: Dataset[Ev], k: Int): Dataset[Ev] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId).cogroup(state.groupByKey(_.userId)) {
      (_, evs, sts) => foldTopK(sts.toSeq, evs, k).iterator
    }
  }
}
