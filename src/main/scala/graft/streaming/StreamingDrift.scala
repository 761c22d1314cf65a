package graft.streaming

import graft.queries.LlmQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

/** Streaming SOURCE-DRIFT monitor — the streaming face of x85: per
  * micro-batch, the batch's quality-score histogram cells are merged into
  * a persistent (source, bin) → obs state table and the chi-square drift
  * report is re-emitted from the merged state. This is the live version of
  * the monitor: a crawl source going bad shows up in the report within one
  * micro-batch of the bad data arriving.
  *
  * The design rests on the cells being a MERGEABLE sufficient statistic:
  * the x16 quality score is per-document (no corpus-relative terms), so
  * cells over a union of batches equal the summed cells of the parts —
  * which is exactly why the streaming report can reuse x85's
  * `driftReport` verbatim (parity spec-proven against batch x85 on the
  * union). Like StreamingNearDedup, `foreachBatch` is the right primitive:
  * the report needs cross-group margins (source totals, bin totals, the
  * grand total) AFTER the stateful merge, a chain a single stateful
  * streaming operator cannot express. Exactly-once comes from idempotent
  * per-batch outputs — state versions and report dirs are keyed by
  * batchId, so a replayed batch overwrites its own attempt and re-reads
  * the state version that preceded it.
  *
  * At 100 TB: state is ≤ sources×10 rows regardless of stream volume, the
  * per-batch cost is one batch-sized score pass (map-combining to
  * batch-cells) plus a constant-sized merge and report. The union+groupBy
  * state rewrite is fixture-honest; a real deployment MERGEs batch cells
  * into a keyed table.
  */
object StreamingDrift {

  val stateSchema: StructType = StructType(Seq(
    StructField("source", StringType),
    StructField("bin", IntegerType),
    StructField("obs", LongType)))

  /** Pure batch core: merge a batch's histogram cells into the state —
    * summed per (source, bin), the union-equals-sum-of-parts identity the
    * parity spec pins.
    */
  def mergeCells(state: DataFrame, batch: DataFrame): DataFrame =
    state.union(LlmQueries.scoreCells(batch))
      .groupBy("source", "bin").agg(sum("obs").as("obs"))

  /** Latest state version written BEFORE `batchId` — a replayed batch must
    * not see its own previous attempt's output state.
    */
  private def stateBefore(spark: SparkSession, stateDir: String, batchId: Long): DataFrame = {
    val versions = Option(new java.io.File(stateDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .map(_.getName.drop(1).toLong)
      .filter(_ < batchId)
    if (versions.isEmpty) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stateSchema)
    else spark.read.schema(stateSchema).parquet(s"$stateDir/v${versions.max}")
  }

  /** Wire a document stream (must carry `doc_id`, `text`, `source`)
    * through the drift monitor. Reports land at `outDir/batch=<id>`,
    * state versions at `stateDir/v<id>` — both idempotent under replay.
    */
  def start(docs: DataFrame, stateDir: String, outDir: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val newState = mergeCells(stateBefore(spark, stateDir, batchId), batch)
        newState.write.mode("overwrite").parquet(s"$stateDir/v$batchId")
        // report from the WRITTEN state (one materialization, then a
        // constant-sized read), so driftReport's four margin consumers
        // re-read ≤ sources×10 rows, not the batch lineage
        LlmQueries.driftReport(
          spark.read.schema(stateSchema).parquet(s"$stateDir/v$batchId"))
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }
      .start()
}
