package graft.operators

import graft.SparkSpec

/** Throttle — per-key keep-at-most-one-per-refractory-period dedup. Pins
  * the boundary semantics the oracle recursion encodes (strict > on
  * anchor+period, equal-time collapse, anchor advances only on keeps) and
  * the distributed form's partitioning-independence.
  */
class ThrottleSpec extends SparkSpec {
  import spark.implicits._

  private val D = 100L

  test("anchor advances only on KEPT rows — not gap sessionization") {
    // t = 0, 60, 120: gap rule (anchor = previous row) would keep 0 and
    // nothing else (every gap 60 < 100); throttle keeps 0 and 120
    // (120 > 0 + 100) BECAUSE 60 was suppressed without moving the anchor.
    val df = Seq((1L, 0L, 1L), (1L, 60L, 2L), (1L, 120L, 3L))
      .toDF("k", "t", "s")
    val kept = Throttle.keepOnePerPeriod(df, "k", "t", "s", D)
      .orderBy("t").collect().map(_.getLong(1)).toSeq
    assert(kept == Seq(0L, 120L))
  }

  test("row at exactly anchor+period is suppressed; anchor+period+1 is kept") {
    val df = Seq((1L, 0L, 1L), (1L, 100L, 2L), (1L, 101L, 3L),
      (2L, 0L, 4L), (2L, 101L, 5L)).toDF("k", "t", "s")
    val kept = Throttle.keepOnePerPeriod(df, "k", "t", "s", D)
      .orderBy("k", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(kept == Seq((1L, 0L), (1L, 101L), (2L, 0L), (2L, 101L)))
  }

  test("equal-time rows collapse to the seq-first; keys are independent") {
    val df = Seq((1L, 50L, 9L), (1L, 50L, 2L), (1L, 50L, 5L),
      (7L, 50L, 1L)).toDF("k", "t", "s")
    val kept = Throttle.keepOnePerPeriod(df, "k", "t", "s", D)
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(kept == Seq((1L, 50L, 2L), (7L, 50L, 1L)))
  }

  test("output is independent of input partitioning and row order") {
    val rnd = new scala.util.Random(17)
    val rows = (1 to 400).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
    def run(df: org.apache.spark.sql.DataFrame) =
      Throttle.keepOnePerPeriod(df, "k", "t", "s", D)
        .orderBy("k", "t", "s").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val a = run(rows.toDF("k", "t", "s").repartition(1))
    val b = run(scala.util.Random.shuffle(rows).toDF("k", "t", "s")
      .repartition(13))
    assert(a == b && a.nonEmpty)
  }
}
