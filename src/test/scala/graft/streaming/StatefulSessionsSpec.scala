package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.GroupStateTimeout

/** flatMapGroupsWithState sessionization: gap splits, in-batch ordering,
  * cross-batch state carry-over.
  */
class StatefulSessionsSpec extends SparkSpec {
  import StatefulSessions._
  import spark.implicits._

  private def min(m: Long): Long = m * 60 * 1000000L

  test("gap over 30 minutes closes a session; state carries across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sink  = s"sessions_${System.nanoTime()}"
    // NoTimeout in tests: a pending timeout batch blocks processAllAvailable
    val q = sessions(input.toDS(), GroupStateTimeout.NoTimeout())
      .writeStream.outputMode("append").format("memory").queryName(sink).start()
    try {
      // batch 1: user 1 — two events 5 min apart (one session), then nothing
      input.addData(Event(1L, min(0), 1.0), Event(1L, min(5), 2.0))
      q.processAllAvailable()
      // batch 2: 40 min later → closes session 1, opens session 2;
      // user 2 starts fresh
      input.addData(Event(1L, min(45), 4.0), Event(2L, min(50), 8.0))
      q.processAllAvailable()
      // batch 3: another gap for user 1 → closes session 2
      input.addData(Event(1L, min(100), 16.0))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table(sink).as[SessionOut].collect()
      .map(s => (s.userId, s.startMicros, s.endMicros, s.nEvents, s.sumValue)).toSet
    assert(out == Set(
      (1L, min(0), min(5), 2L, 3.0),    // closed by batch 2's gap
      (1L, min(45), min(45), 1L, 4.0))) // closed by batch 3's gap
  }

  test("processing-time timeout closes and emits the open session, then frees state") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    val st = TestGroupState.create[SessionState](
      Optional.of(SessionState(min(0), min(5), 2, 3.0)),
      GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long](), hasTimedOut = true)
    val out = StatefulSessions.updateUser(withTimeout = true)(9L, Iterator.empty, st).toSeq
    assert(out == Seq(SessionOut(9L, min(0), min(5), 2, 3.0)))
    assert(st.isRemoved)
  }

  test("events within one batch are folded in time order even if delivered unordered") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sink  = s"sessions_${System.nanoTime()}"
    val q = sessions(input.toDS(), GroupStateTimeout.NoTimeout())
      .writeStream.outputMode("append").format("memory").queryName(sink).start()
    try {
      // unordered within the batch: 80min, 0min, 5min → session {0,5} closed by 80
      input.addData(Event(7L, min(80), 1.0), Event(7L, min(0), 2.0), Event(7L, min(5), 4.0))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table(sink).as[SessionOut].collect().toSeq
    assert(out.map(s => (s.startMicros, s.endMicros, s.nEvents, s.sumValue))
      == Seq((min(0), min(5), 2L, 6.0)))
  }
}
