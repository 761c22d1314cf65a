package graft.streaming

import graft.core.Quality
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming variant of the reference's quality gate (SURVEY
  * §2.10 stretch; the reference itself is batch-only —
  * /root/reference/flows/pipeline.py has no streaming surface).
  *
  * Shape: `readStream → foreachBatch(gated(...))`. Each micro-batch is
  * profiled with the SAME single-pass aggregation the batch gate uses
  * (Quality.profile), then routed whole-batch: conformant batches append to
  * the curated sink, nonconformant ones to a quarantine sink — the streaming
  * analog of the reference's publish-inspection-artifacts-then-fail
  * behavior, since a stream must keep running where a batch job would abort.
  *
  * Scale: foreachBatch keeps the gate decision on the driver (one collected
  * aggregate per batch, like the reference's conformity check) while the
  * routing write stays fully distributed.
  */
object StreamingQuality {

  final case class BatchDecision(
      batchId: Long, metrics: Quality.DqMetrics, passed: Boolean)

  /** foreachBatch handler: profile → route. `onDecision` receives the
    * per-batch metrics (for logging/metric sinks); pass `null` sinks to skip
    * writing (test hooks).
    */
  def gated(
      curatedDir: String,
      quarantineDir: String,
      threshold: Double,
      onDecision: BatchDecision => Unit = _ => ()): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val m = Quality.profile(batch, s"batch_$batchId")
      val passed = m.conformityRate >= threshold
      val target = if (passed) curatedDir else quarantineDir
      if (target != null)
        batch.write.mode("append").parquet(target)
      onDecision(BatchDecision(batchId, m, passed))
    }

  /** Watermarked per-minute event counts — the windowed-aggregation shape
    * (event-time window + late-data bound) a streaming ingest pipeline pairs
    * with the gate.
    */
  def windowedCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("timestamp", watermark)
      .groupBy(window(col("timestamp"), "1 minute"), col("transaction_type"))
      .agg(count(lit(1)).as("n_events"), sum("amount").as("sum_amount"))
      .select(
        col("window.start").as("window_start"),
        col("transaction_type"), col("n_events"), col("sum_amount"))
}
