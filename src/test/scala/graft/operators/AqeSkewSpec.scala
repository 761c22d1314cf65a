package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** AQE's runtime skew-join handling — the mitigation tier BELOW manual
  * salting (operators.Skew covers what AQE cannot: skewed aggregation).
  * This pins that a hot join key actually triggers the skew split at
  * execution time, so the 100 TB answer for skewed sort-merge joins stays
  * "AQE, with salting reserved for aggregations and replicated joins".
  */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("a hot key splits into multiple tasks under AQE skew handling") {
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    def set(k: String, v: String): Unit = spark.conf.set(k, v)
    set("spark.sql.adaptive.enabled", "true")
    set("spark.sql.adaptive.skewJoin.enabled", "true")
    // tiny thresholds so a ~100k-row hot key counts as skewed in-test
    set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    set("spark.sql.autoBroadcastJoinThreshold", "-1") // force sort-merge
    set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      // left: 100k rows of hot key 0, a handful of others. The join must be
      // TERMINAL: a groupBy on the join key downstream would pin the join's
      // hash partitioning, and OptimizeSkewedJoin declines splits that
      // violate a required child distribution.
      val left = spark.range(100000).select(lit(0L).as("k"), col("id").as("v"))
        .union(spark.range(100).select((col("id") % 4 + 1).as("k"), col("id").as("v")))
      val right = spark.range(5).select(col("id").as("k"), col("id").as("w"))
      val joined = left.join(right, "k")
      // execute so AQE finalizes the plan, then inspect the adaptive result
      assert(joined.collect().length == 100000 + 100)
      val finalPlan = joined.queryExecution.executedPlan
        .collectFirst { case a: AdaptiveSparkPlanExec => a.executedPlan }
        .getOrElse(joined.queryExecution.executedPlan)
      assert(finalPlan.toString.contains("skew="),
        s"expected a skew-marked join in the final adaptive plan:\n$finalPlan")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }
}
