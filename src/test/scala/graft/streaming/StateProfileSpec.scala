package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** StateProfile's composite state: MapState aggregates accumulate across
  * micro-batches, the ListState recent-buffer truncates to K and spans
  * batches, top-type ties break lexicographically.
  */
class StateProfileSpec extends SparkSpec {
  import StateProfile._
  import spark.implicits._

  private def run(feed: (MemoryStream[Ev],
      org.apache.spark.sql.streaming.StreamingQuery) => Unit): Map[Long, Profile] = {
    val prov = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(prov)
    spark.conf.set(prov,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Ev]
      val sink = s"profile_${System.nanoTime()}"
      val q = StateProfile(input.toDS())
        .writeStream.outputMode("update").format("memory").queryName(sink).start()
      try {
        feed(input, q)
        spark.table(sink).as[Profile].collect()
          .groupBy(_.userId)
          .map { case (k, v) => k -> v.maxBy(_.nEvents) } // counts monotone: last emission
      } finally q.stop()
    } finally prior match {
      case Some(v) => spark.conf.set(prov, v)
      case None    => spark.conf.unset(prov)
    }
  }

  test("MapState aggregates and the recent buffer accumulate across micro-batches") {
    val out = run { (input, q) =>
      input.addData(Ev(1L, 10L, 100L, "view", 5L), Ev(1L, 11L, 200L, "click", 7L))
      q.processAllAvailable()
      input.addData(Ev(1L, 12L, 300L, "view", 3L), Ev(1L, 13L, 400L, "view", 2L))
      q.processAllAvailable()
    }
    // view: n=3 sum=10; click: n=1 sum=7 → top=view; recent = 13,12,11 (10 evicted)
    assert(out(1L) == Profile(1L, 2L, 4L, 17L, "view", 3L, "13,12,11"), out.toString)
  }

  test("top-type count ties break to the lexicographically smaller type") {
    val out = run { (input, q) =>
      input.addData(Ev(2L, 1L, 100L, "zeta", 1L), Ev(2L, 2L, 200L, "alpha", 1L))
      q.processAllAvailable()
    }
    assert(out(2L).topType == "alpha" && out(2L).topTypeN == 1L, out.toString)
  }

  test("recent buffer orders by (ts, id) desc even when arrival order disagrees") {
    val out = run { (input, q) =>
      input.addData(Ev(3L, 5L, 900L, "a", 1L), Ev(3L, 9L, 100L, "a", 1L),
        Ev(3L, 7L, 900L, "a", 1L))
      q.processAllAvailable()
    }
    // ts desc then id desc: (900,7), (900,5), (100,9)
    assert(out(3L).recentIds == "7,5,9", out.toString)
  }
}
