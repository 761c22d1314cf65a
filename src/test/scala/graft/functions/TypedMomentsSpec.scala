package graft.functions

import graft.SparkSpec
import scala.util.Random

/** TypedMoments: merge-order invariance (the whole point of the exact
  * buffer), 128-bit carry correctness past signed-64 overflow, and the
  * SQL-registered udaf path against a plain-Scala reference.
  */
class TypedMomentsSpec extends SparkSpec {
  import TypedMoments._

  private def foldAll(vs: Seq[Double]): MomentBuf = vs.foldLeft(zero)(reduce)

  private def reference(vs: Seq[Double]): (Long, Double, Double) = {
    val cents = vs.map(v => BigInt(math.floor(v * 100 + 0.5).toLong))
    val n = cents.size
    val s = cents.sum
    val q = cents.map(c => c * c).sum
    val numer = BigInt(n) * q - s * s
    def r6(x: Double) = math.floor(x * 1000000 + 0.5) / 1000000
    (n.toLong, r6((s.toDouble / n) / 100.0), r6((numer.toDouble / (n.toDouble * n)) / 10000.0))
  }

  test("any split/merge order produces the identical buffer (exact, not approx)") {
    val rnd = new Random(11)
    val vs = Seq.fill(500)(rnd.nextDouble() * 2000 - 1000)
    val whole = foldAll(vs)
    for (_ <- 1 to 20) {
      val chunks = rnd.shuffle(vs).grouped(rnd.nextInt(50) + 1).map(foldAll).toSeq
      val merged = rnd.shuffle(chunks).reduce(merge)
      assert(merged.n == whole.n && merged.sum == whole.sum &&
        merged.sumsqHi == whole.sumsqHi && merged.sumsqLo == whole.sumsqLo)
    }
  }

  test("128-bit carry: sums of squares past signed-64 overflow stay exact") {
    // c = 3e9 cents -> c^2 = 9e18, three of them = 2.7e19 > 2^64: low word
    // wraps, hi picks up the carry; finish must still match BigInt exactly
    val vs = Seq.fill(5)(3.0e7) ++ Seq.fill(3)(-2.9e7)
    val b = foldAll(vs)
    assert(b.sumsqHi > 0L, "test must actually exercise the carry")
    val (n, mean, varPop) = reference(vs)
    val out = finish(b)
    assert(out == MomentOut(n, mean, varPop), out.toString)
  }

  test("SQL-registered udaf equals the plain-Scala reference per group") {
    import spark.implicits._
    val rnd = new Random(7)
    val rows = Seq.tabulate(2000)(i => (s"t${i % 5}", rnd.nextDouble() * 1000 - 500))
    spark.udf.register("tm_test",
      org.apache.spark.sql.functions.udaf(TypedMoments,
        org.apache.spark.sql.Encoders.scalaDouble))
    rows.toDF("k", "v").createOrReplaceTempView("tm_rows")
    val got = spark.sql(
      "SELECT k, m.n, m.mean, m.varPop FROM (SELECT k, tm_test(v) AS m FROM tm_rows GROUP BY k) ORDER BY k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val want = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (k, kv) =>
      val (n, mean, vp) = reference(kv.map(_._2))
      (k, n, mean, vp)
    }
    assert(got.toSeq == want)
  }
}
