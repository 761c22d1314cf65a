package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions._

/** Round-9 probe: can the `statestore` batch source read a streaming
  * aggregation's checkpoint (operational state observability)? */
object Scratch9g {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)](spark)
    ms.addData((1L, 10L), (2L, 20L), (1L, 5L))
    val ck = java.nio.file.Files.createTempDirectory("ckp").toString
    val q = ms.toDF.toDF("k", "v").groupBy("k").agg(sum("v").as("s"))
      .writeStream.format("memory").queryName("probe_ss").outputMode("complete")
      .option("checkpointLocation", ck).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    try {
      val st = spark.read.format("statestore").load(ck)
      st.printSchema()
      st.show(10, false)
      println("STATESTORE_OK " + st.count())
      val meta = spark.read.format("state-metadata").load(ck)
      meta.show(false)
      println("METADATA_OK " + meta.count())
    } catch { case e: Throwable => println("STATESTORE_FAIL " + e.toString.take(500)) }
    spark.stop()
  }
}
