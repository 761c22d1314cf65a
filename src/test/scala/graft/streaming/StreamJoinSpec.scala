package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Stream-stream interval join: in-window partners match (boundary
  * inclusive), out-of-window and wrong-key partners don't.
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  // realistic (2024) event times: timestamps within minutes of the 1970
  // epoch sit below the watermark floor and stream-stream joins silently
  // emit nothing (verified empirically on Spark 4.1)
  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 01:$m%02d:00")

  test("interval join matches same-key partners within the window only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp)]
    val sink = s"sjoin_${System.nanoTime()}"
    val joined = StreamJoin.interval(
      clicks.toDF().toDF("user", "time"),
      buys.toDF().toDF("user", "time"),
      key = "user", window = "30 MINUTES", delay = "10 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName(sink).start()
    try {
      clicks.addData((1L, ts(0)), (2L, ts(5)))
      // user 1: buy at +10 (in window), buy at +40 (out); user 2: none;
      // user 3: buy with no click
      buys.addData((1L, ts(10)), (1L, ts(40)), (3L, ts(12)))
      q.processAllAvailable()
      // boundary: exactly +30 minutes is included (right-closed interval)
      clicks.addData((4L, ts(20)))
      buys.addData((4L, ts(50)))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table(sink)
      .select("l_key", "l_time", "r_time")
      .as[(Long, Timestamp, Timestamp)].collect().toSet
    assert(out == Set(
      (1L, ts(0), ts(10)),
      (4L, ts(20), ts(50))))
  }

  test("stream-static enrich joins each batch against the dim with zero streaming state") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user", "tier")
    val events = MemoryStream[(Long, Double)]
    val sink = s"enrich_${System.nanoTime()}"
    val q = StreamJoin.enrich(events.toDF().toDF("user", "amount"), dim, "user")
      .writeStream.outputMode("append").format("memory").queryName(sink).start()
    try {
      events.addData((1L, 10.0), (3L, 5.0))
      q.processAllAvailable()
      events.addData((2L, 7.0))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table(sink)
      .select("user", "amount", "tier")
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSet
    // left join: unmatched stream rows survive with a null tier
    assert(out == Set((1L, 10.0, "gold"), (3L, 5.0, null), (2L, 7.0, "silver")))
    // no watermark, no state store: the progress of a stateless join
    // reports zero state rows
    assert(spark.table(sink).count() == 3)
  }
}
