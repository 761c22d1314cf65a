package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The transformWithState budget gate: cross-batch ValueState persistence
  * (a budget crossing spanning two micro-batches), within-batch ordering
  * by (ts, eventId), and the rejected path never touching sumAccepted.
  */
class BudgetGateSpec extends SparkSpec {
  import BudgetGate._
  import spark.implicits._

  private def run(budget: Long)(feed: (MemoryStream[Ev],
      org.apache.spark.sql.streaming.StreamingQuery) => Unit): Map[Long, GateSummary] = {
    val prov = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(prov)
    spark.conf.set(prov,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Ev]
      val sink = s"gate_${System.nanoTime()}"
      val q = BudgetGate(input.toDS(), budget)
        .writeStream.outputMode("update").format("memory").queryName(sink).start()
      try {
        feed(input, q)
        // counts are monotone: the final row per key is the max emission
        spark.table(sink).as[GateSummary].collect()
          .groupBy(_.userId)
          .map { case (k, v) => k -> v.maxBy(s => s.nAccepted + s.nRejected) }
      } finally q.stop()
    } finally prior match {
      case Some(v) => spark.conf.set(prov, v)
      case None    => spark.conf.unset(prov)
    }
  }

  test("a budget crossing that spans two micro-batches closes the gate via persisted state") {
    // budget 100: batch 1 consumes 90 (both accepted), batch 2's first row
    // is still accepted (90 < 100) but pushes cumAll to 140 — its second
    // row must be rejected PURELY from state carried across batches
    val out = run(100L) { (input, q) =>
      input.addData(Ev(1L, 1L, 10L, 40L), Ev(1L, 2L, 20L, 50L))
      q.processAllAvailable()
      input.addData(Ev(1L, 3L, 30L, 50L), Ev(1L, 4L, 40L, 10L))
      q.processAllAvailable()
    }
    assert(out(1L) == GateSummary(1L, 3L, 1L, 140L), out.toString)
  }

  test("rows sort by (ts, eventId) within a batch — arrival order is irrelevant") {
    // arrival order reversed: the ts=10 row must still be the accepted one
    val out = run(50L) { (input, q) =>
      input.addData(Ev(7L, 2L, 90L, 80L), Ev(7L, 1L, 10L, 60L))
      q.processAllAvailable()
    }
    // sorted: (ts 10, v 60) accepted (0 < 50), (ts 90, v 80) rejected (60 ≥ 50)
    assert(out(7L) == GateSummary(7L, 1L, 1L, 60L), out.toString)
  }

  test("keys are independent: one key's exhausted budget never gates another") {
    val out = run(50L) { (input, q) =>
      input.addData(Ev(1L, 1L, 10L, 999L), Ev(2L, 2L, 10L, 5L))
      q.processAllAvailable()
      input.addData(Ev(1L, 3L, 20L, 1L), Ev(2L, 4L, 20L, 5L))
      q.processAllAvailable()
    }
    assert(out(1L) == GateSummary(1L, 1L, 1L, 999L), out.toString)
    assert(out(2L) == GateSummary(2L, 2L, 0L, 10L), out.toString)
  }
}
