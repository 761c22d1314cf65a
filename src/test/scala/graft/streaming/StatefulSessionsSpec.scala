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

  test("replayBatch: split replay equals one-shot replay and threads state across batches") {
    // user 1: gap inside batch 1 AND a session spanning the batch boundary;
    // user 2: single session entirely in batch 2
    val b1 = Seq(
      Event(1L, min(0), 1.0), Event(1L, min(5), 2.0), // session A (closed by gap)
      Event(1L, min(45), 4.0))                        // session B opens
    val b2 = Seq(
      Event(1L, min(50), 8.0),                        // session B continues across the split
      Event(2L, min(50), 16.0))                       // user 2 session
    def run(batches: Seq[Seq[Event]]): Set[(Long, Long, Long, Long, Double)] = {
      var state = spark.emptyDataset[StatefulSessions.Replayed]
      var closed = List.empty[Seq[StatefulSessions.Replayed]]
      batches.foreach { b =>
        val tagged = StatefulSessions.replayBatch(b.toDS(), state).collect().toSeq
        closed ::= tagged.filterNot(_.open)
        state = tagged.filter(_.open).toDS()
      }
      (closed.flatten ++ state.collect())
        .map(r => (r.userId, r.start, r.lastSeen, r.nEvents, r.sumValue)).toSet
    }
    val split = run(Seq(b1, b2))
    val oneShot = run(Seq(b1 ++ b2))
    val want = Set(
      (1L, min(0), min(5), 2L, 3.0),    // closed inside batch 1
      (1L, min(45), min(50), 2L, 12.0), // spans the batch boundary — state carried
      (2L, min(50), min(50), 1L, 16.0))
    assert(split == want)
    assert(oneShot == want)
  }

  test("x120: batch replay of the stateful fold equals window-SQL sessionization") {
    import org.apache.spark.sql.{functions => F}
    import org.apache.spark.sql.expressions.Window
    val sf = "/root/testdata/sf0.001"
    val got = graft.queries.LlmQueries.x120SessionReplay(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    // independent declarative formulation (the oracle's shape, in Spark):
    // lag-gap flags + running sum assign sessions, then per-session bounds
    val wLag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wRun = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = graft.core.Io.events(spark, sf)
      .withColumn("us", F.unix_micros(F.col("ts")))
      .withColumn("vmicro", F.expr("cast(floor(coalesce(value, 0) * 1000000 + 0.5) as bigint)"))
      .withColumn("prev_us", F.lag(F.col("us"), 1).over(wLag))
      .withColumn("new_s",
        F.when(F.col("prev_us").isNull || F.col("us") - F.col("prev_us") > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("sess", F.sum("new_s").over(wRun))
      .groupBy("user_id", "sess")
      .agg(F.min("us").as("start_us"),
        F.max("us").as("end_us"),
        F.count(F.lit(1)).as("n_events"),
        (F.sum("vmicro") / F.lit(1000000.0)).as("sum_value"))
      .select(F.col("user_id"), F.col("sess").as("session_id"), F.col("start_us"),
        F.col("end_us"), F.col("n_events"), F.col("sum_value"))
      .orderBy("user_id", "session_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got.nonEmpty)
    assert(got == want)
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

  test("event-time sessions: watermark closes sessions, stream == batch gap rule under backlog") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.{functions => F}
    implicit val sqlCtx = spark.sqlContext
    // realistic era: epoch-adjacent event times interact badly with the
    // watermark floor (see StreamJoin notes) — never test streaming at 1970
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli * 1000L
    def at(m: Long): Long = base + m * 60 * 1000000L
    val allEvents = Seq(
      Event(1L, at(0), 1.0), Event(1L, at(5), 2.0),   // batch 1
      Event(1L, at(20), 4.0), Event(2L, at(120), 8.0), // batch 2 (backlogged)
      Event(2L, at(240), 16.0),                        // batch 3
      Event(2L, at(400), 32.0))                        // batch 4
    val input = MemoryStream[Event]
    val sink  = s"sessions_et_${System.nanoTime()}"
    val q = sessionsEventTime(input.toDS())
      .writeStream.outputMode("append").format("memory").queryName(sink).start()
    try {
      input.addData(allEvents(0), allEvents(1))
      q.processAllAvailable()
      // BACKLOG: user 1's in-gap event (15 min after lastSeen) arrives a
      // whole micro-batch later. A wall-clock timeout could have closed the
      // session in the interim; the event-time rule must extend it instead.
      input.addData(allEvents(2), allEvents(3))
      q.processAllAvailable()
      // user 2's next event advances the watermark (240−10 min) past user
      // 1's horizon (20+30 min) → user 1's session times out on EVENT time,
      // with no user-1 event and no 30 wall-clock minutes elapsed; the same
      // batch gap-closes user 2's first session (120 → 240 gap > 30)
      input.addData(allEvents(4))
      q.processAllAvailable()
      input.addData(allEvents(5))
      q.processAllAvailable()
    } finally q.stop()
    val streamClosed = spark.table(sink).as[SessionOut].collect().toSet

    // batch side: the x6 lag-gap rule verbatim (new session iff gap > 30
    // min; min/max/count/sum per session). A session is CLOSED — i.e. the
    // stream must have emitted it — iff a later event gap-closed it, or the
    // final watermark (global max event time − 10 min delay) passed its
    // 30-min horizon. That includes a user's LAST session: user 1 never
    // speaks again, yet user 2's later events advance the watermark past
    // user 1's horizon and the event-time timeout must close it.
    val globalWm = allEvents.map(_.tsMicros).max - 10L * 60 * 1000000
    val w = org.apache.spark.sql.expressions.Window.partitionBy("userId").orderBy("tsMicros")
    val sess = allEvents.toDF()
      .withColumn("prev", lag("tsMicros", 1).over(w))
      .withColumn("newSess",
        (col("prev").isNull || col("tsMicros") - col("prev") > lit(GapMicros)).cast("long"))
      .withColumn("sid", sum("newSess").over(w))
      .groupBy("userId", "sid")
      .agg(F.min("tsMicros").as("startMicros"),
        F.max("tsMicros").as("endMicros"),
        count(lit(1)).as("nEvents"), sum("value").as("sumValue"))
    val batchClosed = sess
      .join(sess.groupBy("userId").agg(F.max("sid").as("maxSid")), "userId")
      .filter(col("sid") < col("maxSid") ||
        col("endMicros") + lit(GapMicros) < lit(globalWm))
      .select("userId", "startMicros", "endMicros", "nEvents", "sumValue")
      .as[SessionOut].collect().toSet
    assert(batchClosed == Set(
      SessionOut(1L, at(0), at(20), 3L, 7.0),   // closed by watermark timeout only
      SessionOut(2L, at(120), at(120), 1L, 8.0),
      SessionOut(2L, at(240), at(240), 1L, 16.0)))
    assert(streamClosed == batchClosed)
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
