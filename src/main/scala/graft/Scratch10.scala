package graft

import org.apache.spark.sql.SparkSession

/** Round-10 probes (ad hoc, not part of the driver contract): x129's
  * distributed vocabulary rank — plan audit + 10×/100× scale runs on the
  * round-9 copy corpora (SURVEY §6.1n), and the component-engine memo's
  * amortization measurement. Volumes over clocks per SURVEY §6.0.
  */
object Scratch10 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tenDir = "/tmp/probe10x_r9"
    val hundredDir = "/tmp/probe100x_r9"

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name rows=$n%d t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    time("warmup")(spark.range(1000000).count())

    if (args.contains("planx129")) {
      // is the no-Window assertion non-vacuous? the cached sets relation
      // must surface its child plan in executedPlan.toString
      val p = SparkEntry.queries("x129_prefix_join")(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      println(s"CHECK len=${p.length}")
      for (tok <- Seq("InMemoryTableScan", "InMemoryRelation", "ExistingRDD",
          "Window", "SortMergeJoin", "Exchange"))
        println(s"CHECK $tok -> ${tok.r.findAllIn(p).size}")
      spark.stop(); return
    }
    if (args.contains("r10a")) {
      // x129 at 1×/10×/100× — candidate volume AND wall; the r9 verdict's
      // missing probe (the one heavy query §6.1 never touched)
      for (dir <- Seq(sfDir, tenDir)) {
        time(s"x129_$dir")(queries.LlmQueries.x129PrefixJoin(spark, dir).count())
      }
      time(s"x129_$hundredDir")(queries.LlmQueries.x129PrefixJoin(spark, hundredDir).count())
      spark.stop(); return
    }
    if (args.contains("r10a100")) {
      time(s"x129_$hundredDir")(queries.LlmQueries.x129PrefixJoin(spark, hundredDir).count())
      spark.stop(); return
    }
    if (args.contains("r10e")) {
      // round-10 new queries at 1×/10× (volumes over clocks, §6.0)
      for (dir <- Seq(sfDir, tenDir)) {
        time(s"x241_$dir")(queries.LlmQueries.x241KmvDistinct(spark, dir).count())
        time(s"x242_$dir")(queries.ExtendedQueries.x242WelchTtest(spark, dir).count())
        time(s"x243_$dir")(queries.ExtendedQueries.x243BootstrapCi(spark, dir).count())
        time(s"x244_$dir")(queries.ExtendedQueries.x244PsiDrift(spark, dir).count())
        time(s"x245_$dir")(queries.LlmQueries.x245TokenizerFertility(spark, dir).count())
        time(s"x246_$dir")(queries.LlmQueries.x246DpRelease(spark, dir).count())
        time(s"x247_$dir")(queries.ExtendedQueries.x247SeqTrigrams(spark, dir).count())
        time(s"x248_$dir")(queries.LlmQueries.x248NegativeSampling(spark, dir).count())
        time(s"x249_$dir")(queries.LlmQueries.x249ChunkPool(spark, dir).count())
        time(s"x250_$dir")(queries.LlmQueries.x250KneserNey(spark, dir).count())
      }
      // 100× (documents-only corpus) for the document-scan members
      for (q <- Seq("x241", "x244", "x245", "x250")) {
        val f: (SparkSession, String) => org.apache.spark.sql.DataFrame = q match {
          case "x241" => queries.LlmQueries.x241KmvDistinct
          case "x244" => queries.ExtendedQueries.x244PsiDrift
          case "x245" => queries.LlmQueries.x245TokenizerFertility
          case "x250" => queries.LlmQueries.x250KneserNey
        }
        time(s"${q}_$hundredDir")(f(spark, hundredDir).count())
      }
      spark.stop(); return
    }
    if (args.contains("r10f")) {
      // batch-3 queries at 1×/10× + document-scan members at 100×
      for (dir <- Seq(sfDir, tenDir)) {
        time(s"x251_$dir")(queries.LlmQueries.x251HeapsLaw(spark, dir).count())
        time(s"x252_$dir")(queries.MultimodalQueries.x252ImageDhash(spark, dir).count())
        time(s"x253_$dir")(queries.LlmQueries.x253WilsonCi(spark, dir).count())
        time(s"x254_$dir")(queries.ExtendedQueries.x254HillTail(spark, dir).count())
        time(s"x255_$dir")(queries.ExtendedQueries.x255HashUniformity(spark, dir).count())
      }
      for ((q, f) <- Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)](
          ("x251", queries.LlmQueries.x251HeapsLaw),
          ("x253", queries.LlmQueries.x253WilsonCi),
          ("x255", queries.ExtendedQueries.x255HashUniformity))) {
        time(s"${q}_$hundredDir")(f(spark, hundredDir).count())
      }
      spark.stop(); return
    }
    if (args.contains("r10g")) {
      // batch-4 queries at 1×/10× + document-scan members at 100×
      for (dir <- Seq(sfDir, tenDir)) {
        time(s"x256_$dir")(queries.LlmQueries.x256Rep5gram(spark, dir).count())
        time(s"x257_$dir")(queries.LlmQueries.x257MatryoshkaRecall(spark, dir).count())
        time(s"x258_$dir")(queries.LlmQueries.x258DoremiStep(spark, dir).count())
        time(s"x259_$dir")(queries.ExtendedQueries.x259Assortativity(spark, dir).count())
      }
      for ((q, f) <- Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)](
          ("x256", queries.LlmQueries.x256Rep5gram),
          ("x258", queries.LlmQueries.x258DoremiStep),
          ("x259", queries.ExtendedQueries.x259Assortativity))) {
        time(s"${q}_$hundredDir")(f(spark, hundredDir).count())
      }
      spark.stop(); return
    }
    if (args.contains("r10h")) {
      // batch-5 queries at 1×/10×/100×
      for (dir <- Seq(sfDir, tenDir, hundredDir)) {
        time(s"x260_$dir")(queries.LlmQueries.x260BpeTrain5(spark, dir).count())
        time(s"x261_$dir")(queries.LlmQueries.x261NgramCoverage(spark, dir).count())
        time(s"x262_$dir")(queries.LlmQueries.x262CompressRatio(spark, dir).count())
      }
      spark.stop(); return
    }
    if (args.contains("r10i")) {
      // separate the memo-cold fixpoint from x261's own gram machinery
      for (dir <- Seq(sfDir, hundredDir)) {
        time(s"x47_$dir")(queries.LlmQueries.x47DedupComponents(spark, dir).count())
        time(s"x261warm_$dir")(queries.LlmQueries.x261NgramCoverage(spark, dir).count())
      }
      spark.stop(); return
    }
    if (args.contains("r10j")) {
      for (dir <- Seq(sfDir, tenDir, hundredDir)) {
        time(s"x263_$dir")(queries.ExtendedQueries.x263ExactQuantiles(spark, dir).count())
      }
      for (dir <- Seq(sfDir, tenDir)) {
        time(s"x264_$dir")(queries.ExtendedQueries.x264DecayVolume(spark, dir).count())
      }
      spark.stop(); return
    }
    if (args.contains("r10b")) {
      // memo amortization: x47 + x104 + x238 back to back, then repeated
      for (rep <- 1 to 2; dir <- Seq(sfDir)) {
        time(s"x47_rep${rep}_$dir")(queries.LlmQueries.x47DedupComponents(spark, dir).count())
        time(s"x104_rep${rep}_$dir")(queries.LlmQueries.x104SplitAssign(spark, dir).count())
        time(s"x238_rep${rep}_$dir")(queries.LlmQueries.x238ComponentSizes(spark, dir).count())
      }
      spark.stop(); return
    }
    spark.stop()
  }
}
