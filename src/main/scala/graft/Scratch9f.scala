package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-9 sixth-pass probe: x180 cost decomposition (ad hoc). */
object Scratch9f {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $name t=${(System.nanoTime() - t0) / 1e9}%.2f r=$r")
    }
    val li = core.Io.table(spark, sfDir, "lineitem")
      .select(col("l_extendedprice").as("v")).filter(col("v").isNotNull)
    time("count")(li.count())
    time("count2")(li.count())
    time("percentile9")(li.agg(expr(
      "percentile(v, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))")).head())
    time("percentile9_again")(li.agg(expr(
      "percentile(v, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))")).head())
    time("approx9")(li.agg(expr(
      "approx_percentile(v, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))")).head())
    time("x180_full")(queries.ExtendedQueries.x180RangeBalance(spark, sfDir).count())
    time("x180_full2")(queries.ExtendedQueries.x180RangeBalance(spark, sfDir).count())
    spark.stop()
  }
}
