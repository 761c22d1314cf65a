package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Streaming content-hash dedup: duplicates collapse within and across
  * micro-batches while the watermark holds their state.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(m * 60000L)

  test("duplicate texts collapse across micro-batches; distinct texts survive") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val sink = s"dedup_${System.nanoTime()}"
    val q = StreamingDedup.byContentHash(
        input.toDF().toDF("doc_id", "text", "event_time"),
        textCol = "text", eventTimeCol = "event_time", delay = "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName(sink).start()
    try {
      // batch 1: two distinct docs + an in-batch duplicate of doc 0
      input.addData((0L, "alpha beta", ts(0)), (1L, "gamma", ts(1)),
        (2L, "alpha beta", ts(1)))
      q.processAllAvailable()
      // batch 2: cross-batch duplicate of doc 0 (inside the watermark
      // window) and one genuinely new doc
      input.addData((3L, "alpha beta", ts(2)), (4L, "delta", ts(3)))
      q.processAllAvailable()
    } finally q.stop()

    // the internal hash key must not leak into the caller's schema
    assert(spark.table(sink).columns.toSeq == Seq("doc_id", "text", "event_time"))
    val kept = spark.table(sink).select("doc_id").as[Long].collect().toSet
    // exactly one survivor per distinct text. Which in-batch duplicate of
    // "alpha beta" survives (0 or 2) is not contractual, but the
    // cross-batch duplicate (3) arrives with state present → always dropped
    assert(!kept.contains(3L))
    assert(kept.contains(1L) && kept.contains(4L))
    assert(kept.count(Set(0L, 2L)) == 1)
  }

  test("null-text documents all pass through — they are not duplicates of each other") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val sink = s"dedup_null_${System.nanoTime()}"
    val q = StreamingDedup.byContentHash(
        input.toDF().toDF("doc_id", "text", "event_time"),
        textCol = "text", eventTimeCol = "event_time", delay = "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName(sink).start()
    try {
      input.addData((0L, null, ts(0)), (1L, "alpha", ts(1)), (2L, null, ts(1)))
      q.processAllAvailable()
      input.addData((3L, null, ts(2)), (4L, "alpha", ts(3)))
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.table(sink).select("doc_id").as[Long].collect().toSet
    assert(Set(0L, 2L, 3L).subsetOf(kept)) // every null-text doc survives
    assert(!kept.contains(4L))             // real duplicate still drops
    assert(kept.contains(1L))
  }
}
