package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-key event-time THROTTLE dedup — keep at most one row per key per
  * refractory period: a row survives iff its event time exceeds the last
  * KEPT row's time by MORE than `refractoryUs` (the first row of a key
  * always survives). The debounce/throttle counterpart of gap
  * sessionization (x6/x120): sessionization anchors on the PREVIOUS row
  * whether or not it was kept, the throttle anchors only on KEPT rows — the
  * alert-suppression / at-most-once-per-period semantics ingestion
  * pipelines use to collapse duplicate bursts.
  *
  * This is also the event-time-deterministic core of the engine's
  * `dropDuplicatesWithinWatermark`: that operator's emit/suppress decisions
  * additionally depend on watermark progression (state eviction happens
  * when the watermark passes `kept_time + delay`, so a late burst straddling
  * a micro-batch boundary can re-emit earlier or later than the pure
  * event-time rule). A replayable pipeline wants the batch-deterministic
  * semantics — identical output for any partitioning and any batch split —
  * which is exactly this fold; ThrottleSpec pins the tie and boundary rules
  * and ThrottlePropertySpec pins parity with a sequential reference fold.
  *
  * The per-key chain (anchor advances only on keeps) is not expressible as
  * a window function — it is a sequential recursion, like x90's packing —
  * so the scale engine is GreedyPack's shape: ONE hash shuffle on the key,
  * `sortWithinPartitions` (external sort, spill-safe for any group length),
  * then a streaming `mapPartitions` fold with O(1) state (current key +
  * anchor). A key with 10⁶ events costs the same memory as one with 10;
  * cost is perfectly linear in rows. The declared x161 pins the fold
  * against DuckDB running the identical recursion (x116/x145's proof
  * shape).
  */
object Throttle {

  /** Throttle `df` per `keyCol`: rows ordered by (`timeCol`, `seqCol`)
    * within each key; a row is kept iff it is the key's first or its time
    * is strictly more than `refractoryUs` past the last kept row's time.
    * Rows at EXACTLY anchor + refractory are suppressed (the period is
    * closed); equal-time rows collapse to the (`seqCol`-)first. All three
    * columns must be castable to long; output keeps exactly those columns.
    */
  def keepOnePerPeriod(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      seqCol: String,
      refractoryUs: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long"), col(timeCol).cast("long"),
        col(seqCol).cast("long"))
      .as[(Long, Long, Long)]
      .repartition(col(keyCol))
      .sortWithinPartitions(keyCol, timeCol, seqCol)
      .mapPartitions(it => foldIterator(it, refractoryUs))
      .toDF(keyCol, timeCol, seqCol)
  }

  /** Streaming fold over key-clustered, (time, seq)-sorted rows: emits the
    * kept rows. Pure iterator-to-iterator — no per-group buffering.
    */
  private[operators] def foldIterator(
      rows: Iterator[(Long, Long, Long)],
      refractoryUs: Long): Iterator[(Long, Long, Long)] =
    new Iterator[(Long, Long, Long)] {
      private var out: (Long, Long, Long) = _
      private var hasKey = false
      private var key = 0L
      private var anchor = 0L

      private def advance(): Unit = {
        while (out == null && rows.hasNext) {
          val r = rows.next()
          if (!hasKey || r._1 != key) {
            hasKey = true; key = r._1; anchor = r._2; out = r
          } else if (r._2 > anchor + refractoryUs) {
            anchor = r._2; out = r
          }
        }
      }

      override def hasNext: Boolean = { if (out == null) advance(); out != null }

      override def next(): (Long, Long, Long) = {
        if (!hasNext) throw new NoSuchElementException("empty fold")
        val o = out; out = null; o
      }
    }
}
