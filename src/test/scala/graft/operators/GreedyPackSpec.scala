package graft.operators

import graft.SparkSpec
import graft.queries.ExtendedQueries
import java.nio.file.Files

/** GreedyPack — the mapPartitions scale engine for x90's reset-on-threshold
  * packing. Pinning pattern per the x92/x91 precedent: the dedicated
  * operator must reproduce the declared (recursive-CTE) form exactly where
  * both can run, and a plain-Scala fold pins it where only the operator can
  * (long sequences the depth-bounded CTE engine cannot reach).
  */
class GreedyPackSpec extends SparkSpec {
  import spark.implicits._

  test("parity: engine at horizon 12 == declared x90 recursive-CTE on the fixture") {
    val sfDir = "/root/testdata/sf0.001"
    val declared = ExtendedQueries.x90GreedyPack(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val engine = GreedyPack.pack(
      graft.core.Io.eventsRaw(spark, sfDir)
        .filter("value is not null and value >= 0")
        .select("user_id", "event_id", "value"),
      budget = 100.0, horizon = 12)
      .orderBy("user_id", "pack_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(declared.nonEmpty && engine == declared)
  }

  test("scale path: 5000-event user matches a plain-Scala fold (depth the CTE cannot reach)") {
    val rnd = new scala.util.Random(41)
    // user 1: 5000 events; users 2-4: short tails crossing partition hash
    val events = (1 to 5000).map(i => (i.toLong, 1L, rnd.nextDouble() * 45)) ++
      (1 to 7).map(i => (10000L + i, 2L, 60.0)) ++
      Seq((20001L, 3L, 250.0)) ++ // singleton overflowing the budget alone
      Seq((30001L, 4L, 0.0), (30002L, 4L, 100.0)) // exact-budget boundary
    val expected = events.groupBy(_._2).toSeq.flatMap { case (u, evs) =>
      val packs = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
      evs.sortBy(_._1).foreach { case (_, _, v) =>
        if (packs.nonEmpty && packs.last._2 + v <= 100.0)
          packs(packs.size - 1) = (packs.last._1 + 1, packs.last._2 + v)
        else packs += ((1L, v))
      }
      packs.zipWithIndex.map { case ((n, acc), i) =>
        (u, i + 1, n, math.floor(acc * 1e6 + 0.5) / 1e6) }
    }.sortBy(r => (r._1, r._2))
    val got = GreedyPack.pack(
      events.toDF("event_id", "user_id", "value"), budget = 100.0)
      .orderBy("user_id", "pack_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected)
    assert(expected.count(_._1 == 1L) > 1000, "5000-event user must span many packs")
    // user 4: 0.0 + 100.0 == budget exactly — NOT an overflow (strict >)
    assert(got.filter(_._1 == 4L) == Seq((4L, 1, 2L, 100.0)))
  }

  test("plan: exactly one exchange (the user_id repartition), no global sort") {
    val df = GreedyPack.pack(
      (1 to 50).map(i => (i.toLong, (i % 5).toLong, 10.0))
        .toDF("event_id", "user_id", "value"), budget = 100.0)
    val plan = df.queryExecution.executedPlan.toString
    assert("(?i)exchange".r.findAllIn(plan).size == 1, plan)
  }

  test("horizon: per-user cap drops rows past it without disturbing the walk") {
    val events = (1 to 20).map(i => (i.toLong, 1L, 30.0))
    val got = GreedyPack.pack(events.toDF("event_id", "user_id", "value"),
        budget = 100.0, horizon = 5)
      .orderBy("pack_id").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    // 5 events of 30: packs (30+30+30)=90, then (30+30)=60
    assert(got == Seq((1, 3L, 90.0), (2, 2L, 60.0)))
  }
}
