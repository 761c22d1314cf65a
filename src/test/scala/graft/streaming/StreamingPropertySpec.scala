package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck properties for the replayable streaming cores: arbitrary
  * batch splits must never change what the folds compute (the property
  * every x114/x120/x130/x138/x154 parity query instantiates once on the
  * fixture — here it is quantified over random inputs and random splits).
  */
class StreamingPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, cases: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases), p)
    assert(res.passed, res.status.toString)
  }

  // ---- StreamingTopK: commutative idempotent fold --------------------

  private val genEvs: Gen[List[StreamingTopK.Ev]] = for {
    n <- Gen.choose(0, 30)
    evs <- Gen.listOfN(n, for {
      u <- Gen.choose(1L, 3L)
      id <- Gen.choose(1L, 1000L)
      ts <- Gen.choose(1L, 100L)
      v <- Gen.option(Gen.choose(0, 50).map(_.toDouble))
    } yield StreamingTopK.Ev(u, id, ts, v))
  } yield evs

  test("foldTopK: any split and any arrival order converge to the one-shot fold") {
    check(Prop.forAll(genEvs, Gen.choose(0, 100), Gen.choose(1, 5)) { (evs, seed, cut) =>
      val shuffled = new scala.util.Random(seed).shuffle(evs)
      val batches = shuffled.grouped(math.max(1, cut)).toList
      val threaded = batches.foldLeft(Seq.empty[StreamingTopK.Ev]) { (st, b) =>
        StreamingTopK.foldTopK(st, b.iterator, 3)
      }
      threaded == StreamingTopK.foldTopK(Nil, evs.iterator, 3)
    }, 200)
  }

  // ---- StreamingFunnel: state threading == one-shot fold -------------

  private val genFunnel: Gen[List[StreamingFunnel.FunnelEvent]] = for {
    n <- Gen.choose(0, 25)
    evs <- Gen.listOfN(n, for {
      t <- Gen.oneOf("view", "click", "purchase", "signup")
      ts <- Gen.choose(1L, 1000L)
    } yield StreamingFunnel.FunnelEvent(1L, t, ts))
  } yield evs.sortBy(_.tsNanos)

  test("funnel foldSorted: splitting a sorted sequence anywhere and threading state is lossless") {
    check(Prop.forAll(genFunnel, Gen.choose(0, 25)) { (evs, at) =>
      val (a, b) = evs.splitAt(math.min(at, evs.size))
      val (o1, s1) = StreamingFunnel.foldSorted(1L, a, StreamingFunnel.FunnelState(None, None, None))
      val (o2, s2) = StreamingFunnel.foldSorted(1L, b, s1)
      val (once, sOnce) = StreamingFunnel.foldSorted(1L, evs, StreamingFunnel.FunnelState(None, None, None))
      (o2 ::: o1) == once && s2 == sOnce
    }, 200)
  }

  // ---- StreamingWindows: replay flush == batch aggregation -----------

  private val W = 60L   // tiny windows so state churns
  private val D = 120L

  test("windows replay: any time-ordered split flushes to the batch windowed count") {
    val genTs = for {
      n <- Gen.choose(1, 60)
      ts <- Gen.listOfN(n, Gen.choose(0L, 3000L))
    } yield ts.sorted
    check(Prop.forAll(genTs, Gen.choose(1, 4)) { (ts, nb) =>
      val per = math.max(1, ts.size / nb)
      val batches = ts.grouped(per).toList
      var state = StreamingWindows.emptyState(spark)
      var wm = Long.MinValue
      var emitted = Map.empty[Long, Long]
      batches.foreach { b =>
        val (out, next, newWm) = StreamingWindows.advance(
          state, b.toDF("ts_us"), wm, W, D)
        emitted ++= out.collect().map(r => r.getLong(0) -> r.getLong(1))
        state = next; wm = newWm
      }
      emitted ++= state.collect().map(r => r.getLong(0) -> r.getLong(1))
      val batch = ts.groupBy(t => t / W * W).map { case (w, g) => w -> g.size.toLong }
      emitted == batch
    }, 10) // Spark-backed: each case runs real plans, keep the count small
  }
}
