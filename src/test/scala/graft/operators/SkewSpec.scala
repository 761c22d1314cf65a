package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted aggregation/join must equal their unsalted counterparts on a
  * heavily skewed key distribution.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 10k rows, 90% on one hot key
  private lazy val skewed = (0 until 10000).map { i =>
    (if (i % 10 == 0) s"key${i % 100}" else "HOT", i.toLong)
  }.toDF("k", "v").repartition(8)

  test("saltedAgg(sum,count) equals plain groupBy aggregation") {
    val salted = Skew.saltedAgg(
      skewed.withColumn("cnt", lit(1L)), Seq("k"), parts = 16,
      partial = Map("v" -> sum, "cnt" -> sum),
      finalAgg = Map("v" -> sum, "cnt" -> sum))
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("v"), count(lit(1)).as("cnt"))
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("saltedJoin equals plain join on a skewed key") {
    val dim = (0 until 100).map(i => (s"key$i", s"attr$i")).toDF("k", "attr")
      .union(Seq(("HOT", "attrHot")).toDF("k", "attr"))
    val salted = Skew.saltedJoin(skewed, dim, "k", parts = 8)
    val plain  = skewed.join(dim, "k")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }
}
