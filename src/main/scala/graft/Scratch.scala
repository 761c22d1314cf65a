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
    // x20 stage probe
    import org.apache.spark.sql.functions._
    import graft.core.Io
    val docs = Io.table(spark, sfDir, "documents")
    time("docs")(docs.count())
    for (i <- 1 to 3) time(s"x20_full_$i")(queries.LlmQueries.x20JaccardPairs(spark, sfDir).count())
    spark.stop()
  }
}
