package graft
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name rows=$n%d t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    time("warmup")(spark.range(1000000).count())
    for (i <- 1 to 2) time(s"x20_$i")(queries.LlmQueries.x20JaccardPairs(spark, sfDir).count())
    spark.stop()
  }
}
