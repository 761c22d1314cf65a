package graft

import org.apache.spark.sql.SparkSession

/** Round-9 probe: x118 wall time + plan shape after the explode_outer fix
  * (InferFiltersFromGenerate had inlined the md5 chunk expression into a
  * pre-exchange Filter, serializing the corpus onto one core).
  */
object ScratchX118 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val q = queries.LlmQueries.x118CdcChunks(spark, sfDir)
    val ex = q.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    println("FILTER-HAS-MD5 = " + ex.split("\n").exists(l => l.startsWith("Condition") && l.contains("md5")))
    val t0 = System.nanoTime()
    val n = q.count()
    println(f"X118 rows=$n t=${(System.nanoTime()-t0)/1e9}%.2f")
    val t1 = System.nanoTime()
    val n2 = queries.LlmQueries.x118CdcChunks(spark, sfDir).count()
    println(f"X118b rows=$n2 t=${(System.nanoTime()-t1)/1e9}%.2f")
    spark.stop()
  }
}
