package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** TimerSessions (transformWithState + event-time timers) must reproduce
  * the exact closed-session set of the old-API event-time variant and the
  * batch gap rule: watermark-driven closure with no wall-clock dependence,
  * horizon extension on in-gap events, one emission per closed session.
  */
class TimerSessionsSpec extends SparkSpec {
  import StatefulSessions._
  import spark.implicits._

  private val base = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli * 1000L
  private def at(m: Long): Long = base + m * 60 * 1000000L

  private def run(feed: (MemoryStream[Event],
      org.apache.spark.sql.streaming.StreamingQuery) => Unit): Set[SessionOut] = {
    val prov = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(prov)
    spark.conf.set(prov,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Event]
      val sink = s"tsess_${System.nanoTime()}"
      val q = TimerSessions(input.toDS())
        .writeStream.outputMode("append").format("memory").queryName(sink).start()
      try {
        feed(input, q)
        spark.table(sink).as[SessionOut].collect().toSet
      } finally q.stop()
    } finally prior match {
      case Some(v) => spark.conf.set(prov, v)
      case None    => spark.conf.unset(prov)
    }
  }

  test("watermark fires the timer: closed sessions equal the old API's event-time scenario") {
    // the StatefulSessionsSpec backlog scenario verbatim — same expected set,
    // so the two state APIs are pinned to each other through the batch rule
    val out = run { (input, q) =>
      input.addData(Event(1L, at(0), 1.0), Event(1L, at(5), 2.0))
      q.processAllAvailable()
      input.addData(Event(1L, at(20), 4.0), Event(2L, at(120), 8.0))
      q.processAllAvailable()
      input.addData(Event(2L, at(240), 16.0))
      q.processAllAvailable()
      input.addData(Event(2L, at(400), 32.0))
      q.processAllAvailable()
    }
    assert(out == Set(
      SessionOut(1L, at(0), at(20), 3L, 7.0),   // closed by the TIMER, no user-1 event after
      SessionOut(2L, at(120), at(120), 1L, 8.0),
      SessionOut(2L, at(240), at(240), 1L, 16.0)), out.toString)
  }

  test("in-gap events across batches extend the horizon — one session, one emission") {
    val out = run { (input, q) =>
      input.addData(Event(5L, at(0), 1.0))
      q.processAllAvailable()
      input.addData(Event(5L, at(20), 2.0)) // 20 < 30 gap: extend, don't close
      q.processAllAvailable()
      input.addData(Event(5L, at(40), 4.0)) // still in-gap from 20
      q.processAllAvailable()
      // another user far in the future drives the watermark past 40+30
      input.addData(Event(99L, at(1000), 0.5))
      q.processAllAvailable()
    }
    assert(out.filter(_.userId == 5L) ==
      Set(SessionOut(5L, at(0), at(40), 3L, 7.0)), out.toString)
  }
}
