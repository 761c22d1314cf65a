package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck properties for the GreedyPack streaming fold: on ARBITRARY
  * user-clustered inputs the iterator equals an independently written
  * reference fold, never overfills a pack (except the single-oversized-
  * event case), and never loses an event. Complements GreedyPackSpec's
  * fixed-fixture parity with randomized coverage.
  */
class GreedyPackPropertySpec extends SparkSpec {

  private val budget = 100.0

  /** Independent reference: per user, left-to-right reset-on-threshold. */
  private def reference(rows: Seq[(Long, Long, Double)])
      : Seq[(Long, Int, Long, Double)] =
    rows.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (u, evs) =>
      var acc = 0.0; var n = 0L; var pack = 1
      val out = Seq.newBuilder[(Long, Int, Long, Double)]
      evs.foreach { case (_, _, v) =>
        if (n > 0 && acc + v > budget) {
          out += ((u, pack, n, acc)); pack += 1; acc = v; n = 1
        } else { acc += v; n += 1 }
      }
      if (n > 0) out += ((u, pack, n, acc))
      out.result()
    }

  private val genRows: Gen[Seq[(Long, Long, Double)]] = for {
    nUsers <- Gen.choose(1, 5)
    rows <- Gen.sequence[Seq[Seq[(Long, Long, Double)]], Seq[(Long, Long, Double)]](
      (1 to nUsers).map { u =>
        for {
          n <- Gen.choose(0, 40)
          vs <- Gen.listOfN(n, Gen.choose(0.0, 130.0)) // some single events exceed budget
        } yield vs.zipWithIndex.map { case (v, i) =>
          (u.toLong, i.toLong, math.floor(v * 100) / 100)
        }
      })
  } yield rows.flatten

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("foldIterator equals the reference fold on arbitrary clustered input") {
    check(Prop.forAll(genRows) { rows =>
      GreedyPack.foldIterator(rows.iterator, budget, Int.MaxValue).toSeq ==
        reference(rows)
    })
  }

  test("no pack exceeds budget unless it is a single oversized event; no event is lost") {
    check(Prop.forAll(genRows) { rows =>
      val packs = GreedyPack.foldIterator(rows.iterator, budget, Int.MaxValue).toSeq
      val bounded = packs.forall { case (_, _, n, total) =>
        total <= budget + 1e-9 || n == 1
      }
      val conserved = packs.map(_._3).sum == rows.size
      bounded && conserved
    })
  }

  test("horizon h keeps exactly the first h events of every user") {
    check(Prop.forAll(genRows, Gen.choose(1, 10)) { (rows, h) =>
      val capped = GreedyPack.foldIterator(rows.iterator, budget, h).toSeq
      val manual = reference(rows.groupBy(_._1).toSeq.sortBy(_._1)
        .flatMap(_._2.take(h)))
      capped == manual
    })
  }
}
