package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the streaming face of x29's banded range
  * join: match each event on stream A to events on stream B for the same
  * key within a bounded time window. The watermarks plus the time-range
  * join condition are what make state finite: Spark keeps only rows whose
  * event time can still find a partner (W plus the watermark delay), then
  * drops them — the exact trade x29 makes in batch by banding.
  */
object StreamJoin {

  /** Inner interval join: rows of `left` to rows of `right` with equal
    * `key`, where right.time ∈ (left.time, left.time + window]. Both inputs
    * need an event-time column named `time`; the output carries both times
    * so callers can see the matched gap.
    */
  def interval(
      left: DataFrame,
      right: DataFrame,
      key: String,
      window: String,
      delay: String): DataFrame = {
    val l = left.withWatermark("time", delay)
      .withColumnRenamed(key, "l_key").withColumnRenamed("time", "l_time")
    val r = right.withWatermark("time", delay)
      .select(col(key).as("r_key"), col("time").as("r_time"))
    l.join(r,
      col("l_key") === col("r_key") &&
        col("r_time") > col("l_time") &&
        col("r_time") <= col("l_time") + expr(s"INTERVAL $window"))
  }

  /** Stream-static enrichment join: each micro-batch joins against the
    * static dimension table with NO streaming state at all — the static
    * side is just a batch relation re-planned per micro-batch (so a small
    * dim broadcasts, exactly like x1's star-schema joins). This is the
    * streaming face of dimension enrichment: no watermark needed, state
    * cost zero, and a dim refresh is picked up on the next batch when the
    * static side is a file source re-read per plan.
    */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Pure replay core for the two-sided interval-join state machine —
    * what the engine's symmetric hash join does per micro-batch, as
    * batch-mode DataFrames so x160 can pin it against the declarative
    * batch join per round (the x114/x120/x130/x138/x154 pattern for the
    * SIXTH streaming face).
    *
    * Inputs carry `(key, time_us)`. A pair (l, r) with equal keys and
    * `r.time_us ∈ (l.time_us, l.time_us + windowUs]` is emitted EXACTLY
    * once — in the batch where the LATER-arriving side lands: the new
    * right rows join everything on the left seen so far (state ∪ this
    * batch), and the new left rows join only the right STATE (earlier
    * batches), so a same-batch pair is counted by the first term alone.
    * Union-of-batches therefore equals the batch join for ANY split of
    * either stream (spec-pinned on a hash split, no ordering needed).
    *
    * Eviction mirrors the engine's watermark rule, and is what bounds
    * state on an unbounded stream: a left row is dead once
    * `wm > time + windowUs` (every future right row has
    * `time ≥ wm > l.time + W`), a right row once `wm > time` (every
    * future left row has `time ≥ wm > r.time`, violating `l < r`).
    */
  def replayBatch(
      stateL: DataFrame,
      stateR: DataFrame,
      batchL: DataFrame,
      batchR: DataFrame,
      wmUs: Long,
      windowUs: Long): (DataFrame, DataFrame, DataFrame) = {
    def pairs(l: DataFrame, r: DataFrame): DataFrame =
      l.select(col("key"), col("time_us").as("l_time_us"))
        .join(r.select(col("key"), col("time_us").as("r_time_us")), "key")
        .filter(col("r_time_us") > col("l_time_us") &&
          col("r_time_us") <= col("l_time_us") + lit(windowUs))
    val allL = stateL.unionAll(batchL)
    val out = pairs(allL, batchR).unionAll(pairs(batchL, stateR))
    (out,
      allL.filter(col("time_us") + lit(windowUs) >= lit(wmUs)),
      stateR.unionAll(batchR).filter(col("time_us") >= lit(wmUs)))
  }

  /** LEFT-OUTER replay core — [[replayBatch]] plus the engine's outer
    * rule: a left row that reaches EVICTION (`wm > time + window` — no
    * future right can ever pair with it) without having matched emits
    * once with a NULL right time, in the batch whose watermark killed it.
    * Left state therefore carries a `matched` flag, flipped (never
    * cleared) whenever any batch pairs the row; the flag rides the state
    * exactly like the engine's per-row matched bit in the symmetric hash
    * join. Callers flush trailing state by sending one final empty batch
    * with `wmUs = Long.MaxValue` — the sentinel that turns the replay
    * into a TOTAL left outer join (every never-matched left emits).
    *
    * Inputs: left rows `(key, time_us, matched)` (new rows enter with
    * `matched = false`), right rows `(key, time_us)`. Returns
    * (innerPairs, outerRows, newStateL, newStateR, flagged) — `flagged`
    * is the post-flag-join left frame that outerRows AND newStateL both
    * filter; a caller that materializes more than one of them should
    * persist `flagged` (x226 does), otherwise the match semi-join — the
    * expensive subplan — executes once per consumer.
    */
  def replayBatchOuter(
      stateL: DataFrame,
      stateR: DataFrame,
      batchL: DataFrame,
      batchR: DataFrame,
      wmUs: Long,
      windowUs: Long): (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    def pairs(l: DataFrame, r: DataFrame): DataFrame =
      l.select(col("key"), col("time_us").as("l_time_us"))
        .join(r.select(col("key"), col("time_us").as("r_time_us")), "key")
        .filter(col("r_time_us") > col("l_time_us") &&
          col("r_time_us") <= col("l_time_us") + lit(windowUs))
    val allL = stateL.unionAll(batchL)
    val inner = pairs(allL, batchR).unionAll(pairs(batchL, stateR))
    // (key, time_us) identities of allL rows that have a partner among
    // EVERYTHING seen so far — distinct, so the flag join can't multiply
    // rows (a left row's identity may repeat in state)
    val allR = stateR.unionAll(batchR)
    val matchedKeys = allL.as("l")
      .join(allR.select(col("key").as("rk"), col("time_us").as("rt")),
        col("l.key") === col("rk") && col("rt") > col("l.time_us") &&
          col("rt") <= col("l.time_us") + lit(windowUs), "left_semi")
      .select(col("key"), col("time_us")).distinct()
      .withColumn("m_now", lit(true))
    val flagged = allL.join(matchedKeys, Seq("key", "time_us"), "left")
      .select(col("key"), col("time_us"),
        (col("matched") || coalesce(col("m_now"), lit(false))).as("matched"))
    val dead = flagged.filter(col("time_us") + lit(windowUs) < lit(wmUs))
    val outer = dead.filter(!col("matched"))
      .select(col("key"), col("time_us").as("l_time_us"),
        lit(null).cast("long").as("r_time_us"))
    (inner, outer,
      flagged.filter(col("time_us") + lit(windowUs) >= lit(wmUs)),
      allR.filter(col("time_us") >= lit(wmUs)),
      flagged)
  }
}
