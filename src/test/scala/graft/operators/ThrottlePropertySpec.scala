package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck properties for the Throttle streaming fold: on ARBITRARY
  * key-clustered sorted inputs the iterator equals an independently written
  * sequential reference, every key keeps its first row, and consecutive
  * kept rows are always more than the refractory period apart.
  */
class ThrottlePropertySpec extends SparkSpec {

  private val period = 50L

  /** Independent reference: per key in (t, s) order, keep iff first or
    * strictly past the last KEPT time + period. */
  private def reference(rows: Seq[(Long, Long, Long)])
      : Seq[(Long, Long, Long)] =
    rows.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (_, evs) =>
      var anchor = Long.MinValue
      var first = true
      evs.sortBy(r => (r._2, r._3)).filter { case (_, t, _) =>
        if (first || t > anchor + period) { anchor = t; first = false; true }
        else false
      }
    }

  private val genRows: Gen[Seq[(Long, Long, Long)]] = for {
    nKeys <- Gen.choose(1, 6)
    rows <- Gen.sequence[Seq[Seq[(Long, Long, Long)]], Seq[(Long, Long, Long)]](
      (1 to nKeys).map { k =>
        for {
          n <- Gen.choose(0, 60)
          ts <- Gen.listOfN(n, Gen.choose(0L, 400L)) // dense: many collisions
        } yield ts.zipWithIndex
          .map { case (t, i) => (k.toLong, t, i.toLong) }
          .sortBy(r => (r._2, r._3))
      })
  } yield rows.flatten

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("foldIterator equals the sequential reference on arbitrary clustered input") {
    check(Prop.forAll(genRows) { rows =>
      Throttle.foldIterator(rows.iterator, period).toSeq == reference(rows)
    })
  }

  test("first row per key survives; kept rows are > period apart within a key") {
    check(Prop.forAll(genRows) { rows =>
      val kept = Throttle.foldIterator(rows.iterator, period).toSeq
      val firsts = rows.groupBy(_._1).view.mapValues(_.head).values.toSet
      val keepsFirsts = firsts.forall(kept.contains)
      val spaced = kept.groupBy(_._1).values.forall { ks =>
        ks.map(_._2).sliding(2).forall {
          case Seq(a, b) => b > a + period
          case _         => true
        }
      }
      keepsFirsts && spaced
    })
  }
}
