package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed greedy reset-on-threshold packing — the SCALE engine behind
  * x90's semantics (reference analog: the sequential pandas-style walk a
  * driver would do; `flows/pipeline.py`'s ethos of explicit, testable
  * cleaning steps).
  *
  * x90's declared form runs the identical fold through Spark 4.1's
  * `WITH RECURSIVE` SQL surface, whose cost is DEPTH-bounded: each
  * UnionLoop iteration is a full Spark job (~0.2 s fixed overhead), so a
  * 10³-event user costs 10³ jobs regardless of data size — fine for the
  * declared 12-event horizon, unusable past tens of steps. This operator is
  * the documented engine for the long tail:
  *
  *   - ONE hash shuffle on `user_id` (`repartition`), then
  *   - `sortWithinPartitions(user_id, event_id)` — Spark's external sort,
  *     spill-safe for groups of any length, and
  *   - a streaming `mapPartitions` fold that walks rows in order, emitting
  *     one output row per closed pack with O(1) state (current user, running
  *     accumulator, pack counter) — NO per-group buffering, so a user with
  *     10⁶ events costs the same memory as one with 10.
  *
  * Accumulation is the identical left-to-right double fold as the recursive
  * SQL (`acc + v > budget → close, acc := v`), so results are bit-identical
  * to the declared form on any horizon both can run (pinned by
  * GreedyPackSpec at horizon 12 on the fixture, and against a plain-Scala
  * fold at 5 000 events — the depth the CTE engine cannot reach).
  *
  * At 100 TB: cost is one corpus shuffle + one external sort per partition —
  * the same shape as any keyed window — with perfectly linear scaling in
  * events; per-user sequence length only affects in-order walk time, never
  * memory or job count.
  */
object GreedyPack {

  /** Pack `events` (columns `user_id`, `event_id`, `value`) per user in
    * `event_id` order: a pack closes when the running sum would exceed
    * `budget`. Rows with null/negative `value` must be filtered by the
    * caller (x90's F-family contract). `horizon` caps events considered per
    * user (x90 declares 12); `Int.MaxValue` = unbounded, the scale path.
    *
    * Output: `user_id, pack_id, n_events, pack_total` — `pack_total`
    * rounded half-up at 6 decimals exactly as x90's SQL
    * (`floor(x*1e6+0.5)/1e6`).
    */
  def pack(events: DataFrame, budget: Double, horizon: Int = Int.MaxValue): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val packed = events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("value").cast("double"))
      .as[(Long, Long, Double)]
      .repartition(col("user_id"))
      .sortWithinPartitions("user_id", "event_id")
      .mapPartitions(it => foldIterator(it, budget, horizon))
      .toDF("user_id", "pack_id", "n_events", "pack_total")
    packed.select(col("user_id"), col("pack_id"), col("n_events"),
      expr("floor(pack_total * 1000000 + 0.5) / 1000000").as("pack_total"))
  }

  /** Streaming fold over user_id-clustered, event_id-sorted rows: emits
    * `(user_id, pack_id, n_events, pack_total)` per closed pack. Pure
    * iterator-to-iterator (Spark never materializes a group); `horizon`
    * skips a user's rows past that count without breaking the walk.
    */
  private[operators] def foldIterator(rows: Iterator[(Long, Long, Double)],
      budget: Double, horizon: Int): Iterator[(Long, Int, Long, Double)] =
    new Iterator[(Long, Int, Long, Double)] {
      private var out: (Long, Int, Long, Double) = _
      private var open = false      // a pack is accumulating
      private var user = 0L
      private var acc = 0.0
      private var packId = 0
      private var n = 0L            // events in the open pack
      private var seen = 0L         // events consumed for `user` (horizon cap)

      private def startUser(u: Long, v: Double): Unit = {
        user = u; acc = v; packId = 1; n = 1; seen = 1; open = true
      }

      private def advance(): Unit = {
        while (out == null && rows.hasNext) {
          val (u, _, v) = rows.next()
          if (!open) startUser(u, v)
          else if (u != user) { out = (user, packId, n, acc); startUser(u, v) }
          else if (seen >= horizon) () // past this user's horizon: drop
          else if (acc + v > budget) {
            out = (user, packId, n, acc)
            acc = v; packId += 1; n = 1; seen += 1
          } else { acc += v; n += 1; seen += 1 }
        }
        if (out == null && open) { out = (user, packId, n, acc); open = false }
      }

      override def hasNext: Boolean = { if (out == null) advance(); out != null }

      override def next(): (Long, Int, Long, Double) = {
        if (!hasNext) throw new NoSuchElementException("empty fold")
        val o = out; out = null; o
      }
    }
}
