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
}
