package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Watermarked TUMBLING-WINDOW aggregation — the append-mode windowed-agg
  * face of the streaming surface (`withWatermark` + `groupBy(window(…))`),
  * with a PURE batch core (`advance`) that replays the engine's exact
  * bookkeeping so batch parity is provable per round (x154; the
  * x114/x120/x130/x138 pattern for the fifth face).
  *
  * Append-mode semantics replayed (and spec-pinned against the REAL
  * engine on a `MemoryStream` in `StreamingWindowsSpec`):
  *  - window assignment: `win_start = ts div W · W` (tumbling, epoch
  *    aligned — `window(col, "1 minute")`'s rule);
  *  - late-data drop: an arriving event whose window END is at or below
  *    the CURRENT watermark is discarded (its window already closed);
  *  - watermark advance: `wm' = max(wm, max(batch event time) − delay)` —
  *    monotone, computed from the batch AFTER it merges (the engine
  *    updates the watermark at batch completion and applies it next
  *    trigger; `advance` applies it at the end of the same call, so the
  *    engine's emitted set equals the replay's after one trailing empty
  *    batch — exactly how the spec aligns them);
  *  - emission/eviction: windows with `end <= wm'` are emitted ONCE and
  *    leave the state; everything else stays open.
  *
  * At 100 TB of stream history the state is bounded by delay/W open
  * windows per key-group — eviction is what makes unbounded streams
  * finite-state; the replay's per-batch cost is one map-combining
  * (window → count) aggregation of the batch plus a state-sized merge,
  * the same shape the engine's StateStore updates have.
  */
object StreamingWindows {

  val stateSchema: StructType = StructType(Seq(
    StructField("win_start_us", LongType),
    StructField("n", LongType)))

  def emptyState(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stateSchema)

  /** Late-drop + window-assign + per-window count for one batch, merged
    * into the open-window state. `batch` carries one `ts_us` column
    * (event time, epoch µs). Callers that replay many batches should
    * persist this result and thread the pinned frame on (the x120/x47
    * lineage discipline) — the merge chain otherwise recomputes every
    * prior batch's aggregation at each step.
    */
  def mergeCells(
      state: DataFrame,
      batch: DataFrame,
      wmUs: Long,
      windowUs: Long): DataFrame = {
    val cells = batch
      // ts is non-negative epoch µs on every fixture vintage, so integral
      // `div` (truncating) IS floor division here (guarded in the spec)
      .select((expr(s"cast(ts_us as long) div ${windowUs}L") * windowUs)
        .as("win_start_us"))
      .filter(col("win_start_us") + lit(windowUs) > lit(wmUs))
      .groupBy("win_start_us").agg(count(lit(1)).as("n"))
    state.unionAll(cells)
      .groupBy("win_start_us").agg(sum("n").as("n"))
  }

  /** `max(wm, max event time − delay)` — the engine tracks max event time
    * per batch; one 1-row action is the replay's mirror of that
    * driver-side statistic. An empty batch leaves the watermark alone.
    */
  def batchWatermark(batch: DataFrame, wmUs: Long, delayUs: Long): Long = {
    val batchMax = batch.agg(max(col("ts_us").cast("long"))).head()
    if (batchMax.isNullAt(0)) wmUs
    else math.max(wmUs, batchMax.getLong(0) - delayUs)
  }

  /** One-scan batch pre-aggregation: per-window counts PLUS the window's
    * max event time — so the merge input and the watermark statistic come
    * out of a single pass over the batch (the engine's StateStore update
    * and max-event-time tracking share the same pass too). Late-drop
    * happens downstream in [[mergeCellFrame]]: the drop criterion depends
    * only on the window, so dropping aggregated cells equals dropping raw
    * rows, while the watermark max must see every row (a dropped-late
    * row can never be the max — it is old by definition — but the engine
    * tracks the statistic pre-filter and so does this).
    */
  def cellsWithMax(batch: DataFrame, windowUs: Long): DataFrame =
    batch
      .select(col("ts_us").cast("long").as("ts_us"),
        (expr(s"cast(ts_us as long) div ${windowUs}L") * windowUs)
          .as("win_start_us"))
      .groupBy("win_start_us")
      .agg(count(lit(1)).as("n"), max("ts_us").as("max_ts_us"))

  /** [[mergeCells]] over a pre-aggregated [[cellsWithMax]] frame. */
  def mergeCellFrame(
      state: DataFrame,
      cells: DataFrame,
      wmUs: Long,
      windowUs: Long): DataFrame =
    state.unionAll(
      cells.filter(col("win_start_us") + lit(windowUs) > lit(wmUs))
        .select(col("win_start_us"), col("n")))
      .groupBy("win_start_us").agg(sum("n").as("n"))

  /** [[batchWatermark]] read off a pre-aggregated [[cellsWithMax]] frame. */
  def cellsWatermark(cells: DataFrame, wmUs: Long, delayUs: Long): Long = {
    val batchMax = cells.agg(max("max_ts_us")).head()
    if (batchMax.isNullAt(0)) wmUs
    else math.max(wmUs, batchMax.getLong(0) - delayUs)
  }

  /** Split the merged frame at the watermark: (emitted closed windows,
    * still-open state).
    */
  def splitClosed(
      merged: DataFrame,
      wmUs: Long,
      windowUs: Long): (DataFrame, DataFrame) = {
    val closed = col("win_start_us") + lit(windowUs) <= lit(wmUs)
    (merged.filter(closed), merged.filter(!closed))
  }

  /** One micro-batch of the append-mode windowed count: merge, advance
    * the watermark, split. Returns (emitted, new state, new watermark).
    */
  def advance(
      state: DataFrame,
      batch: DataFrame,
      wmUs: Long,
      windowUs: Long,
      delayUs: Long): (DataFrame, DataFrame, Long) = {
    val merged = mergeCells(state, batch, wmUs, windowUs)
    val newWm = batchWatermark(batch, wmUs, delayUs)
    val (out, open) = splitClosed(merged, newWm, windowUs)
    (out, open, newWm)
  }
}
