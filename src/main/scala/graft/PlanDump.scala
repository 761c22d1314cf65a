package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Round-15 deliverable helper: write `.explain("formatted")` output for
  * named queries to plans/<tag>/<query>_<suffix>.txt — the judge checks
  * plan claims in OPTIMIZATION_r15.md against these files.
  *
  * args: tag suffix queryName [queryName...]
  *   e.g. runMain graft.PlanDump r15 before x226_outer_join_replay
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1 — plans are captured at the
  * benched SF so Exchange/scan shapes match what Bench times),
  * SPARK_GRAFT_CPUS (default 4).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    // validate up front (ADVICE r15): a bad name mid-list used to write
    // some files before exiting, and <2 args threw a raw
    // ArrayIndexOutOfBoundsException instead of a usage line
    if (args.length < 3) {
      System.err.println("usage: PlanDump <tag> <suffix> <queryName> [queryName...]")
      sys.exit(2)
    }
    val tag = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val unknownUp = names.filterNot(SparkEntry.queries.contains)
    if (unknownUp.nonEmpty) {
      System.err.println(
        s"PLANDUMP: unknown queries: ${unknownUp.mkString(",")}")
      sys.exit(2)
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.Tuning.adaptive(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Paths.get(s"plans/$tag")
    Files.createDirectories(dir)
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      // explain("formatted") prints to stdout; capture via the plan API so
      // the file holds exactly what explain would print
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(dir.resolve(s"${name}_$suffix.txt"), txt)
      println(s"wrote plans/$tag/${name}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
