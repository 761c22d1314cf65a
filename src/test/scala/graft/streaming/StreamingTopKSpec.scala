package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming per-key top-k: micro-batch updates converge to the batch
  * answer regardless of arrival order (the commutative-fold property), the
  * Update stream emits each key's current top-k, and x130's replay equals
  * the custom batch operator x122.
  */
class StreamingTopKSpec extends SparkSpec {
  import StreamingTopK._
  import spark.implicits._

  test("update stream: later better rows displace earlier ones; ties break by (ts, id)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val sink = s"topk_${System.nanoTime()}"
    val q = topKStream(input.toDS(), 2)
      .writeStream.outputMode("update").format("memory").queryName(sink).start()
    try {
      input.addData(Ev(1L, 1L, 10L, Some(5.0)), Ev(1L, 2L, 20L, Some(3.0)))
      q.processAllAvailable()
      input.addData(Ev(1L, 3L, 30L, Some(4.0)), Ev(1L, 4L, 40L, Some(1.0)))
      q.processAllAvailable()
      // last update emits the current top-2: values 5.0 and 4.0
      val last = spark.table(sink).as[Ev].collect()
        .filter(_.userId == 1L).groupBy(_.eventId).keySet
      assert(Set(1L, 3L).subsetOf(last))
      // a third batch with only worse rows re-emits the same top-2
      input.addData(Ev(1L, 5L, 50L, Some(0.5)))
      q.processAllAvailable()
    } finally q.stop()
  }

  test("foldTopK is order-insensitive and handles nulls last") {
    val rows = Seq(
      Ev(1L, 1L, 10L, Some(2.0)), Ev(1L, 2L, 20L, None),
      Ev(1L, 3L, 30L, Some(9.0)), Ev(1L, 4L, 40L, Some(2.0)))
    val once = foldTopK(Nil, rows.iterator, 3).map(_.eventId)
    assert(once == Seq(3L, 1L, 4L), "9.0 first, then the 2.0 tie by ts, nulls out")
    // any split/order of arrival converges to the same set
    for (perm <- rows.permutations.take(6)) {
      val (a, b) = perm.splitAt(2)
      val replayed = foldTopK(foldTopK(Nil, a.iterator, 3), b.iterator, 3)
      assert(replayed == foldTopK(Nil, rows.iterator, 3), s"diverged on $perm")
    }
  }

  test("x130 replay equals the x122 batch operator on the fixture") {
    val sf = "/root/testdata/sf0.001"
    val replayed = graft.queries.LlmQueries.x130TopkReplay(spark, sf).collect()
      .map(_.toSeq).toSeq
    val operator = graft.queries.ExtendedQueries.x122TopkPerKey(spark, sf).collect()
      .map(_.toSeq).toSeq
    assert(replayed.nonEmpty)
    assert(replayed == operator)
  }
}
