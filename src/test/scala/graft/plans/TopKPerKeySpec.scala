package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** The per-key top-k physical operator: exactness against the window
  * formulation, the two-phase plan shape, and the property the operator
  * exists for — the shuffle carries only map-side winners, not the corpus.
  */
class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private def windowTop3(df: org.apache.spark.sql.DataFrame) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("v").desc, col("id").asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3).drop("rn")
  }

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "v", "id").collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet

  test("top-3 per key equals the window row_number form, ties broken by unique id") {
    val rng = new scala.util.Random(7)
    val rows = (0L until 2000L).map(i => (i % 37, rng.nextInt(50).toDouble, i))
    val df = rows.toDF("k", "v", "id").repartition(5)
    val got = TopKPerKey.topKPerKey(df, Seq("k"), Seq(col("v").desc, col("id").asc), 3)
    assert(asSet(got) == asSet(windowTop3(df)))
  }

  test("k larger than any group returns every row") {
    val df = Seq((1L, 1.0, 1L), (1L, 2.0, 2L), (2L, 3.0, 3L)).toDF("k", "v", "id")
    val got = TopKPerKey.topKPerKey(df, Seq("k"), Seq(col("v").desc, col("id").asc), 10)
    assert(got.count() == 3)
  }

  test("null order values sort per SortOrder defaults (desc => nulls last)") {
    val df = Seq((1L, Some(5.0), 1L), (1L, None, 2L), (1L, Some(7.0), 3L), (1L, Some(1.0), 4L))
      .toDF("k", "v", "id")
    val got = TopKPerKey.topKPerKey(df, Seq("k"), Seq(col("v").desc, col("id").asc), 2)
    assert(got.select("id").collect().map(_.getLong(0)).toSet == Set(3L, 1L))
  }

  test("plan is partial fold -> one hash exchange -> final fold; shuffle carries only winners") {
    val rows = (0L until 10000L).map(i => (i % 20, (i * 2654435761L % 1000).toDouble, i))
    val df = rows.toDF("k", "v", "id").repartition(8)
    val got = TopKPerKey.topKPerKey(df, Seq("k"), Seq(col("v").desc, col("id").asc), 3)
    got.collect() // materialize so exchange metrics are populated
    val executed = got.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
    // AQE wraps materialized stages as leaf QueryStageExec nodes — recurse
    // into them or collect() sees only the result stage
    def flatten(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p +: (p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => flatten(q.plan)
        case other => other.children.flatMap(flatten)
      })
    val nodes = flatten(executed)
    assert(nodes.exists(_.nodeName == "TopKPerKeyFinal") &&
      nodes.exists(_.nodeName == "TopKPerKeyPartial"),
      s"expected the two-phase operator pair, got:\n${executed.treeString}")
    // exactly one HASH exchange (the partial→final one; the test's own
    // repartition(8) is a round-robin exchange)
    val exchanges = nodes.collect {
      case e: ShuffleExchangeExec
        if e.outputPartitioning.isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => e
    }
    assert(exchanges.size == 1,
      s"exactly one hash exchange, between partial and final:\n${executed.treeString}")
    val shuffled = exchanges.head.metrics("shuffleRecordsWritten").value
    // ≤ partitions × keys × k = 8 × 20 × 3 = 480 — vs 10 000 input rows
    assert(shuffled <= 480, s"map-side fold must bound the shuffle, carried $shuffled rows")
    assert(asSet(got) == asSet(windowTop3(df)))
  }

  test("unknown key or order column fails fast with a named error") {
    val df = Seq((1L, 1.0, 1L)).toDF("k", "v", "id")
    val e1 = intercept[IllegalArgumentException](
      TopKPerKey.topKPerKey(df, Seq("nope"), Seq(col("v").desc), 1))
    assert(e1.getMessage.contains("nope"))
    val e2 = intercept[IllegalArgumentException](
      TopKPerKey.topKPerKey(df, Seq("k"), Seq(col("missing").desc), 1).collect())
    assert(e2.getMessage.contains("missing"))
  }
}
