package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck property for RangeRank: for ARBITRARY row multisets, key
  * cardinalities, and partition counts, the two-pass offset ranking
  * equals the sequential reference `row_number() OVER (PARTITION BY key
  * ORDER BY v, id)` — including partition counts far exceeding, equal to,
  * and far below the key count (the boundary-placement independence
  * claim). Complements RangeRankSpec's fixed cases with randomized
  * coverage; Spark jobs are expensive per case, so cases are few but each
  * carries a random shape.
  */
class RangeRankPropertySpec extends SparkSpec {
  import spark.implicits._

  private def reference(rows: Seq[(String, Long, Long)]): Set[(String, Long, Long, Long)] =
    rows.groupBy(_._1).flatMap { case (k, g) =>
      g.sortBy(t => (t._2, t._3)).zipWithIndex
        .map { case ((_, v, id), i) => (k, v, id, i + 1L) }
    }.toSet

  /** Owned form, pin released pre-materialization (the recompute path —
    * see RangeRankSpec's helper). */
  private def rankWithin(df: org.apache.spark.sql.DataFrame, key: String,
      order: Seq[String], name: String, parts: Int): org.apache.spark.sql.DataFrame = {
    val r = RangeRank.rankWithinOwned(df, key, order, name, parts)
    r.release()
    r.df
  }

  private val genCase: Gen[(Seq[(String, Long, Long)], Int)] = for {
    nKeys <- Gen.choose(1, 6)
    n <- Gen.choose(1, 300)
    parts <- Gen.choose(1, 24)
    ks <- Gen.listOfN(n, Gen.choose(0, nKeys - 1))
    vs <- Gen.listOfN(n, Gen.choose(0L, 50L)) // heavy ties on purpose
  } yield (ks.zip(vs).zipWithIndex.map { case ((k, v), i) =>
    (s"k$k", v, i.toLong) }, parts)

  test("rankWithin == sequential row_number for arbitrary shapes and partition counts") {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12),
      Prop.forAll(genCase) { case (rows, parts) =>
        val got = rankWithin(rows.toDF("k", "v", "id"), "k",
            Seq("v", "id"), "rnk", parts)
          .select("k", "v", "id", "rnk")
          .as[(String, Long, Long, Long)].collect().toSet
        got == reference(rows)
      })
    assert(res.passed, res.status.toString)
  }
}
