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

  test("replayBatch: any hash split of both streams unions to the batch interval join") {
    val W = 100L
    val rng = new scala.util.Random(7)
    val lefts = (1 to 80).map(_ => (rng.nextInt(4).toLong, rng.nextInt(1000).toLong))
    val rights = (1 to 80).map(_ => (rng.nextInt(4).toLong, rng.nextInt(1000).toLong))
    val batch = for {
      (lk, lt) <- lefts; (rk, rt) <- rights
      if lk == rk && rt > lt && rt <= lt + W
    } yield (lk, lt, rt)
    // arbitrary 3-way hash split, wm off (MinValue) — the ordering-free
    // exactly-once claim: later-arrival accounting alone dedups pairs
    def split(xs: Seq[(Long, Long)], i: Int) = xs.filter(x => (x._2 % 3) == i)
    var sL = Seq.empty[(Long, Long)].toDF("key", "time_us")
    var sR = Seq.empty[(Long, Long)].toDF("key", "time_us")
    var got = Seq.empty[(Long, Long, Long)]
    (0 until 3).foreach { i =>
      val (out, nL, nR) = StreamJoin.replayBatch(sL, sR,
        split(lefts, i).toDF("key", "time_us"),
        split(rights, i).toDF("key", "time_us"), Long.MinValue, W)
      got ++= out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      sL = nL; sR = nR
    }
    assert(got.sorted == batch.sorted)
    assert(batch.nonEmpty)
  }

  test("replayBatch eviction is lossless on a time-ordered split with a live watermark") {
    val W = 100L
    val D = 50L
    val rng = new scala.util.Random(11)
    val all = (1 to 120).map(i =>
      (rng.nextInt(3).toLong, rng.nextInt(2000).toLong, rng.nextBoolean()))
      .sortBy(_._2)
    val lefts = all.filter(_._3).map(x => (x._1, x._2))
    val rights = all.filterNot(_._3).map(x => (x._1, x._2))
    val expect = for {
      (lk, lt) <- lefts; (rk, rt) <- rights
      if lk == rk && rt > lt && rt <= lt + W
    } yield (lk, lt, rt)
    val bounds = Seq(700L, 1400L, Long.MaxValue)
    var sL = Seq.empty[(Long, Long)].toDF("key", "time_us")
    var sR = Seq.empty[(Long, Long)].toDF("key", "time_us")
    var wm = Long.MinValue
    var got = Seq.empty[(Long, Long, Long)]
    var lo = Long.MinValue
    bounds.foreach { hi =>
      val bL = lefts.filter(x => x._2 >= lo && x._2 < hi)
      val bR = rights.filter(x => x._2 >= lo && x._2 < hi)
      val bMax = (bL ++ bR).map(_._2).maxOption
      bMax.foreach(m => wm = math.max(wm, m - D))
      val (out, nL, nR) = StreamJoin.replayBatch(sL, sR,
        bL.toDF("key", "time_us"), bR.toDF("key", "time_us"), wm, W)
      got ++= out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // eviction must actually fire — otherwise this test proves nothing
      sL = nL; sR = nR
      lo = hi
    }
    assert(got.sorted == expect.sorted)
    assert(sR.count() < rights.size, "watermark must have evicted right-side state")
  }

  test("replayBatchOuter with a final wm=+inf flush equals the batch LEFT OUTER join") {
    val W = 100L
    val D = 50L
    val rng = new scala.util.Random(13)
    val all = (1 to 120).map(i =>
      (rng.nextInt(3).toLong, rng.nextInt(2000).toLong, rng.nextBoolean()))
      .sortBy(_._2)
    val lefts = all.filter(_._3).map(x => (x._1, x._2)).distinct
    val rights = all.filterNot(_._3).map(x => (x._1, x._2)).distinct
    val inner = for {
      (lk, lt) <- lefts; (rk, rt) <- rights
      if lk == rk && rt > lt && rt <= lt + W
    } yield (lk, lt, Some(rt))
    val outer = lefts
      .filterNot { case (lk, lt) =>
        rights.exists { case (rk, rt) => lk == rk && rt > lt && rt <= lt + W } }
      .map { case (lk, lt) => (lk, lt, None: Option[Long]) }
    val expect = inner ++ outer
    val bounds = Seq(700L, 1400L, Long.MaxValue)
    var sL = Seq.empty[(Long, Long, Boolean)].toDF("key", "time_us", "matched")
    var sR = Seq.empty[(Long, Long)].toDF("key", "time_us")
    var wm = Long.MinValue
    var got = Seq.empty[(Long, Long, Option[Long])]
    var lo = Long.MinValue
    (bounds.map(Some(_)) :+ None).foreach { hiOpt =>
      val hi = hiOpt.getOrElse(Long.MinValue) // flush batch carries no data
      val bL = lefts.filter(x => hiOpt.isDefined && x._2 >= lo && x._2 < hi)
        .map(x => (x._1, x._2, false))
      val bR = rights.filter(x => hiOpt.isDefined && x._2 >= lo && x._2 < hi)
      wm = hiOpt match {
        case Some(_) =>
          (bL.map(_._2) ++ bR.map(_._2)).maxOption
            .map(m => math.max(wm, m - D)).getOrElse(wm)
        case None => Long.MaxValue
      }
      val (i9, o9, nL, nR, _) = StreamJoin.replayBatchOuter(sL, sR,
        bL.toDF("key", "time_us", "matched"),
        bR.toDF("key", "time_us"), wm, W)
      got ++= i9.collect().map(r => (r.getLong(0), r.getLong(1), Some(r.getLong(2))))
      got ++= o9.collect().map(r => (r.getLong(0), r.getLong(1), None: Option[Long]))
      sL = nL; sR = nR
      hiOpt.foreach(h => lo = h)
    }
    assert(got.sortBy(t => (t._1, t._2, t._3.getOrElse(-1L))) ==
      expect.sortBy(t => (t._1, t._2, t._3.getOrElse(-1L))))
    assert(outer.nonEmpty, "fixture must exercise the outer path")
    assert(sL.count() == 0, "the +inf flush must evict all left state")
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
